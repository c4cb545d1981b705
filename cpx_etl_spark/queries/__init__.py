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


# Queries that already hold a driver gate row in CORRECTNESS_r03.json.
# The driver's per-round sweep budget is ~50 queries; three rounds of
# cheapest-first ordering re-confirmed exactly this set every time while
# the other 43 registrations never earned a driver row (VERDICT r3 item
# 1). Sweep order is registry insertion order, so load_registry() puts
# every query OUTSIDE this set first: r3 ∪ r4 then covers the whole
# registry with driver evidence.
R3_CONFIRMED = frozenset(
    {
        "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk", "doc_stats",
        "embedding_stats", "q13_customer_distribution", "q14_promo_revenue",
        "q17_small_quantity_revenue", "q18_large_orders",
        "q19_disjunctive_revenue", "q1_pricing_summary",
        "q22_inactive_rich_customers", "q3_shipping_priority",
        "q4_order_priority", "q5_local_supplier", "q6_forecast_revenue",
        "q_approx_distinct_users", "q_asof_join", "q_corpus_curation",
        "q_customers_without_orders", "q_dataset_split",
        "q_denest_roundtrip", "q_deterministic_sample",
        "q_distinct_segments", "q_distinct_users_daily", "q_extract_enrich",
        "q_moving_window_revenue", "q_nation_acctbal",
        "q_nest_customer_orders", "q_orders_with_lineitems_1996",
        "q_percentile_stats", "q_pivot_daily_events", "q_range_join",
        "q_rollup_revenue", "q_running_revenue", "q_salted_agg",
        "q_set_ops", "q_stratified_sample", "q_top_orders_per_cust",
        "q_unique_view", "q_unpivot_nation_stats", "q_view_tree",
        "stream_dedup_first", "stream_sessionize", "stream_tumbling_agg",
        "text_fingerprint", "text_lang_id", "text_quality_score",
        "text_redact_pii", "text_token_count",
    }
)


def load_registry() -> tuple[dict, dict]:
    """Import all query modules (side effect: registration) and return maps.

    Registry insertion order sets the driver's gate-sweep order, and the
    gate budget is ~50 queries per round. r1–r3 ran cheapest-first, which
    confirmed the same 50 queries three times while 43 others never got a
    driver row. This round rotates: queries WITHOUT an r3 driver row come
    first (module order etl → dedup → multimodal → relational tail keeps
    cheap families early within the rotation), the r3-confirmed 50 fill
    whatever budget remains."""
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

    unconfirmed = {k: v for k, v in QUERIES.items() if k not in R3_CONFIRMED}
    confirmed = {k: v for k, v in QUERIES.items() if k in R3_CONFIRMED}
    ordered = {**unconfirmed, **confirmed}
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES, ORACLES
