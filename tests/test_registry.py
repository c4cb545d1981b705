"""Registry single-sourcing (VERDICT r9 item 6): every quoted total
derives from load_registry(); SURVEY.md's generated block must match."""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "update_survey_totals.py",
)


def test_survey_totals_are_generated():
    out = subprocess.run(
        [sys.executable, _SCRIPT, "--check"],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr or out.stdout


def test_every_oracle_names_a_registered_query():
    from cpx_etl_spark.queries import load_registry

    q, o = load_registry()
    assert set(o) <= set(q)
    # the two rows-only entries are a deliberate, documented set — a
    # NEW oracle-less registration must be an explicit decision here
    assert sorted(set(q) - set(o)) == [
        "mm_byte_features",
        "q_approx_distinct_users",
    ]
