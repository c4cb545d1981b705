"""Tests for the registry-wide plan linter (tools/plan_lint.py): the
detectors must actually fire on planted anti-pattern plans and stay
quiet on the benign physical shapes they exempt — otherwise a clean
sweep proves nothing."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_lint import _ALLOW, _PATTERNS, _single_partition_funnels  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cartesian_product_detected(spark):
    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select(F.col("id").alias("y"))
    # keyless crossJoin of two multi-row frames with the broadcast
    # path disabled plans as CartesianProduct
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(a.crossJoin(b))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
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


def test_allowlist_entries_have_reasons():
    for key, reason in _ALLOW.items():
        assert isinstance(reason, str) and len(reason) > 20, key
