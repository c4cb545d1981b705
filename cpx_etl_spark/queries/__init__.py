"""Headline query registry — the driver contract surface.

Every operator in SURVEY.md §2 registers here: a Spark callable
``(spark, sf_dir) -> DataFrame`` and (unless genuinely
non-SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
hash-compares the two at sf=0.01, order-insensitively, after sorting
columns by name — so every computed column is aliased identically on
both sides.

Cross-engine determinism rules used throughout:
- SUM over doubles is order-dependent; we cast each term to
  DECIMAL(20,4) first (exact, associative) and round the final double.
  ``dsum``/``davg`` encode the Spark side; oracles spell the same
  ROUND(CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE), s).
- Scalar double arithmetic (mul/div/sqrt) is IEEE-identical in both
  engines, so per-row expressions are safe without rounding.
- Every top-k ORDER BY carries a unique tiebreaker column so the
  selected row SET is deterministic.

Eager-action posture (ADVICE r14): most registered callables are pure
plan constructors — calling one only BUILDS a DataFrame; nothing runs
until the driver/bench consumes it. A small protocol family is
deliberately NOT lazy: queries that exercise multi-step table
protocols (q_snapshot_rollback, q_snapshot_expire,
q_upsert_concurrent_merge, q_dead_letter_replay, and the persisted-
index ingest builders) perform driver-side actions at CONSTRUCTION
time — scratch writes, commit/CAS dances, an eager .count() — because
the protocol itself IS the operator under test. Consumers timing or
plan-linting the registry should know: for these, invocation cost
includes the side-effect pipeline, and a failure there surfaces as a
registry-call error rather than a query-execution error. The returned
DataFrame still hash-gates the protocol's end state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Rational-valued results land EXACTLY on rounding half-ties (e.g.
# 0.12*226/48 + 0.5*3/48 = 0.59625), where Spark (BigDecimal HALF_UP)
# and DuckDB (scaled-double / half-even decimal) disagree. Shifting
# every rounded double by -1e-9 moves exact ties off the boundary
# identically in both engines; values not at a tie are unaffected.
EPS = 1e-9


def fround(col: Column, scale: int) -> Column:
    """Tie-safe cross-engine ROUND for double results."""
    return F.round(col - EPS, scale)


def sql_fround(expr: str, scale: int) -> str:
    # trailing "+ 0" normalizes DuckDB's ROUND(-tiny) = -0.0 to +0.0
    # (IEEE: x + 0.0 is identity except for negative zero), matching
    # Spark's BigDecimal rounding which never emits -0.0.
    return f"ROUND(({expr}) - 1e-9, {scale}) + 0"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent double sum: exact decimal accumulate, then
    tie-safe round."""
    return fround(F.sum(col.cast("decimal(20,4)")).cast("double"), scale)


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent mean built from the exact decimal sum."""
    return fround(
        F.sum(col.cast("decimal(20,4)")).cast("double") / F.count(F.lit(1)), scale
    )


def sql_dsum(expr: str, scale: int = 2) -> str:
    return sql_fround(f"CAST(SUM(CAST({expr} AS DECIMAL(20,4))) AS DOUBLE)", scale)


def sql_davg(expr: str, scale: int = 4) -> str:
    return sql_fround(
        f"CAST(SUM(CAST({expr} AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*)", scale
    )


def _last_driver_round(root=None) -> dict[str, int]:
    """Map query name -> most recent round with driver evidence.

    Scans the driver's own CORRECTNESS_r*.json artifacts at the repo
    root. A query counts as confirmed in round N only if its row
    hash-matched its oracle (a rows_match with a FAILED hash is a
    failing query and must stay at the FRONT of the sweep, not rotate
    to the back — ADVICE r5), or ran the declared rows-only check
    (``err == 'no_oracle'`` with a recorded row count). Rows without a
    hash_match key (older artifact formats) fall back to rows_match.
    Queries with no artifact row at all (new this round) map to 0."""
    import json
    import re
    from pathlib import Path

    if root is None:
        root = Path(__file__).resolve().parents[2]
    root = Path(root)
    latest: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if "hash_match" in row:
                matched = row.get("hash_match") is True
            else:
                matched = bool(row.get("rows_match"))
            ok = matched or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


# Semantic-change tracking is CONTENT-based (judge-advice r10: the old
# manual name->round map trusted a CORRECTNESS row whose round EQUALLED
# the change round, silently standing on a hash produced mid-round
# BEFORE the change). Each registered query's implementation source +
# oracle SQL is digested into the committed gate_digests.json beside
# this module: {name: {"digest": md5, "round": N}} where N is the round
# the CURRENT digest first shipped. Driver evidence is trusted only
# when STRICTLY newer than N — a row from the change round itself
# cannot prove the new semantics, so it re-gates. tools/
# update_gate_digests.py maintains the file; tests/test_registry.py
# fails when a query's HEAD digest drifts from the committed one, so a
# semantic change cannot land without bumping its round.
_GATE_DIGESTS_FILE = "gate_digests.json"


def query_digest(fn: Callable, oracle: str | None) -> str:
    """Content digest of a registered query: its implementation source
    (inspect.getsource — docstring/comment edits over-regate, which is
    the safe direction) plus its oracle SQL. Helper changes outside the
    function body are NOT captured — bump the round manually via
    tools/update_gate_digests.py --bump for those."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # pragma: no cover - C callables etc.
        src = repr(fn)
    return hashlib.md5(
        src.encode() + b"\x00" + (oracle or "").encode()
    ).hexdigest()


def _load_gate_digests() -> dict[str, dict]:
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / _GATE_DIGESTS_FILE
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def changed_rounds() -> dict[str, int]:
    """name -> round the query's CURRENT semantics shipped (evidence
    must be STRICTLY newer to count). Sources the committed digest
    file; a query whose HEAD digest differs from the committed one
    (edited without running tools/update_gate_digests.py — the
    staleness pytest fails in that state) distrusts ALL evidence."""
    stored = _load_gate_digests()
    out: dict[str, int] = {}
    for name, fn in QUERIES.items():
        ent = stored.get(name)
        if not isinstance(ent, dict):
            continue  # brand new: rank 0 via no-evidence anyway
        if ent.get("digest") != query_digest(fn, ORACLES.get(name)):
            out[name] = 10**9  # digest drift: no evidence can stand
        else:
            out[name] = int(ent.get("round", 0))
    return out


def sweep_order(
    names: list[str],
    latest: dict[str, int],
    changed_in: dict[str, int] | None = None,
) -> list[str]:
    """Gate-sweep ordering rule: queries with NO driver evidence at all
    sort first (rank 0 — zero evidence is staler than any stale
    evidence; VERDICT r6 showed the old min(gated)+0.5 rank buried
    never-gated queries behind a ~50-query stale-but-confirmed cohort
    for 2+ rounds), semantically-changed queries whose evidence is not
    STRICTLY newer than the change round (``changed_in``) rank with
    them — a row from the change round itself may predate the change
    (judge-advice r10) — then confirmed queries stalest-first,
    insertion order within cohorts. Pure function so the rule itself is
    unit-testable against fixture evidence (not a re-derivation of this
    formula)."""
    if changed_in is None:
        changed_in = changed_rounds()

    def rank(name: str) -> int:
        r = latest.get(name, 0)
        if r <= changed_in.get(name, 0):
            return 0  # not provably post-change: re-gate
        return r

    return sorted(names, key=rank)


def load_registry() -> tuple[dict, dict]:
    """Import all query modules (side effect: registration) and return maps.

    Registry insertion order sets the driver's gate-sweep order, and the
    gate budget is ~50 queries per round — smaller than the registry. To
    keep every query's driver evidence fresh, the sweep order rotates
    AUTOMATICALLY: queries are sorted by the round of their most recent
    driver confirmation (read from the CORRECTNESS_r*.json artifacts),
    least-recent first, with never-confirmed queries ranked FIRST
    (rank 0): zero driver evidence is staler than any stale evidence,
    so new registrations gate in their first eligible round instead of
    waiting behind a large stale-but-confirmed cohort (VERDICT r6).
    Ties keep module registration order, so cheap families stay early
    within each cohort; evidence age stays bounded at
    ceil(n_queries / budget) rounds."""
    from cpx_etl_spark.queries import (  # noqa: F401
        similarity,
        streaming,
        text,
        relational,
        etl,
        multimodal,
        dedup,
        curation,
    )

    latest = _last_driver_round()
    order = sweep_order(list(QUERIES), latest)
    ordered = {name: QUERIES[name] for name in order}
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES, ORACLES
