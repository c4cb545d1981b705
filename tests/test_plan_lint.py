"""Tests for the registry-wide plan linter (tools/plan_lint.py): the
detectors must actually fire on planted anti-pattern plans and stay
quiet on the benign physical shapes they exempt — otherwise a clean
sweep proves nothing."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_lint import _ALLOW_FUNNELS, _PATTERNS, _single_partition_funnels  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cartesian_product_detected(spark):
    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select(F.col("id").alias("y"))
    # keyless crossJoin of two multi-row frames with the broadcast
    # path disabled plans as CartesianProduct. Save/RESTORE the
    # threshold (code-review r9: conf.unset drops the session-scoped
    # fixture to Spark's 10MB default, not get_spark's configured
    # value, order-dependently breaking later plan-shape tests)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        plan = _plan(a.crossJoin(b))
    finally:
        spark.conf.set(key, old)
    assert "CartesianProduct" in plan
    assert "CartesianProduct" in _PATTERNS


def test_row_at_a_time_udf_detected(spark):
    bad = F.udf(lambda s: s.upper(), "string")
    plan = _plan(spark.range(10).select(bad(F.col("id").cast("string"))))
    assert "BatchEvalPython" in plan
    assert "BatchEvalPython" in _PATTERNS


def test_global_window_over_raw_rows_is_a_funnel(spark):
    from pyspark.sql.window import Window

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    funneled = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    hits = _single_partition_funnels(_plan(funneled))
    assert hits, "corpus-sized global sort must be reported"


def test_scalar_aggregate_funnel_is_exempt(spark):
    plan = _plan(spark.range(1000).agg(F.sum("id").alias("s")))
    assert "Exchange SinglePartition" in plan
    assert _single_partition_funnels(plan) == []


def test_count_distinct_merge_funnel_is_exempt(spark):
    plan = _plan(
        spark.range(1000)
        .select((F.col("id") % 13).alias("k"))
        .agg(F.countDistinct("k").alias("d"))
    )
    assert "Exchange SinglePartition" in plan
    assert _single_partition_funnels(plan) == []


def test_quantile_normalize_rank_is_two_phase(spark, sf_dir):
    """The r9 fix: the global reference rank must NOT funnel the
    corpus — the only surviving single-partition funnel is the
    distinct-value (domain-sized) cumulative frame."""
    from cpx_etl_spark.queries import load_registry

    q, _ = load_registry()
    plan = _plan(q["q_quantile_normalize"](spark, sf_dir))
    for child in _single_partition_funnels(plan):
        assert "Aggregate" in child, (
            f"corpus-sized frame funneled into one partition: {child}"
        )


def test_allowlist_entries_have_reasons_and_anchors():
    for name, entries in _ALLOW_FUNNELS.items():
        for prefix, reason in entries:
            assert isinstance(prefix, str) and len(prefix) >= 7, (name, prefix)
            assert isinstance(reason, str) and len(reason) > 20, (name, prefix)


def test_new_funnel_in_allowed_query_still_reports(spark):
    """The allowlist is anchored to the audited child prefix: a fresh
    corpus-sized funnel inside an already-allowed query must NOT be
    covered by the old entry."""
    from pyspark.sql.window import Window

    df = spark.range(500).select(F.col("id"), (F.col("id") % 5).alias("v"))
    plan = _plan(df.withColumn("rn", F.row_number().over(Window.orderBy("id"))))
    hits = _single_partition_funnels(plan)
    assert hits
    allowed = _ALLOW_FUNNELS["q_gini_revenue"]
    assert not any(
        h.startswith(prefix) for h in hits for prefix, _ in allowed
    )
