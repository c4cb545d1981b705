"""In-suite replica of the driver's correctness gate (SURVEY §5.2).

Runs EVERY registered query at sf0.001 against its DuckDB oracle and
compares row counts, column names, and order-insensitive values. This
is the drift net: a query whose oracle breaks (or that raises) fails
pytest long before the per-round driver gate sees it — round 1 shipped
20 registered queries the driver gate never reached, and nothing
in-suite would have noticed.

Rows-only queries (no oracle by design) are still executed so a
runtime error cannot hide.
"""

from __future__ import annotations

import pytest

from cpx_etl_spark.queries import load_registry

QUERIES, ORACLES = load_registry()


@pytest.fixture(scope="module")
def duck(sf_dir):
    from tools.verify_oracles import duck_con

    con = duck_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from tools.verify_oracles import compare

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only by design (engine-specific hashing / decode stubs):
        # execution must still succeed and produce a stable frame
        assert sdf is not None
        return
    ddf = duck.execute(ORACLES[name]).fetch_df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
