"""Frequency sketches for corpus-scale streams: Count-Min.

The Count-Min sketch is THE bounded-memory frequency estimator for
100 TB token/key streams: d hash rows x w buckets of counters, update
= +1 in one bucket per row, estimate = min over rows. Collisions only
ever ADD, so estimates are one-sided: est >= true count always, and
P[est > true + eps*N] <= (1/2)^d for w = ceil(e/eps).

Cross-engine exactness (the repo's oracle discipline): the d hash
functions are Kirsch-Mitzenmacher double hashes off ONE md5 per key —
the same integer construction as the MinHash signatures
(operators/dedup.py), so a DuckDB oracle replays the sketch AND the
estimates bit-for-bit. The sketch itself is a (d*w)-row table built by
one groupBy shuffle with map-side partials — at scale it lives
broadcast-side for estimate joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cpx_etl_spark.operators.dedup import KM_PRIME, km_coefficients

CMS_TAG = "cms"


def _bucket_cols(key_col, d: int, w: int):
    """d bucket expressions for a key column (one md5, d linear combos
    mod w) — exact int64 arithmetic, identical in any engine."""
    dig = F.md5(key_col)
    h1 = F.conv(F.substring(dig, 1, 8), 16, 10).cast("long") % KM_PRIME
    h2 = F.conv(F.substring(dig, 9, 8), 16, 10).cast("long") % KM_PRIME
    return [
        ((F.lit(a) * h1 + F.lit(b) * h2) % KM_PRIME % w)
        for a, b in km_coefficients(d, CMS_TAG)
    ]


def count_min_build(df: DataFrame, key_col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Build the sketch: (row_idx, bucket, cnt), one groupBy shuffle of
    at most d*w distinct cells after map-side partial aggregation."""
    buckets = _bucket_cols(F.col(key_col), d, w)
    cells = df.select(
        F.posexplode(F.array(*buckets)).alias("row_idx", "bucket")
    )
    return cells.groupBy("row_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                       d: int = 4, w: int = 1024) -> DataFrame:
    """Estimate each key's frequency: min over the d rows of its cell
    counters. The keys frame is small (candidates/heavy-hitter
    suspects); the sketch is d*w rows — both sides broadcastable, no
    corpus scan."""
    buckets = _bucket_cols(F.col(key_col), d, w)
    probes = keys.select(
        F.col(key_col),
        F.posexplode(F.array(*buckets)).alias("row_idx", "bucket"),
    )
    return (
        probes.join(sketch, on=["row_idx", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def sql_count_min(d: int, w: int, stream_rel: str = "stream",
                  keys_rel: str = "keys", key_col: str = "k") -> str:
    """DuckDB CTE segment replaying build + estimate. Expects CTEs
    ``stream_rel`` (the keyed stream, column ``key_col``) and
    ``keys_rel`` (keys to estimate) to be defined BEFORE this segment;
    defines hashed/cells/sketch/probes/est. The caller's final SELECT
    joins ``est``."""
    coeffs = km_coefficients(d, CMS_TAG)
    hash_rows = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS row_idx, (({a} * h1 + {b} * h2) % {KM_PRIME}) % {w} AS bucket, {key_col} FROM hashed"
        for i, (a, b) in enumerate(coeffs)
    )
    return f"""hashed AS (
        SELECT {key_col},
               CAST(concat('0x', substr(md5({key_col}), 1, 8)) AS BIGINT) % {KM_PRIME} AS h1,
               CAST(concat('0x', substr(md5({key_col}), 9, 8)) AS BIGINT) % {KM_PRIME} AS h2
        FROM {stream_rel}),
    cells AS ({hash_rows}),
    sketch AS (SELECT row_idx, bucket, COUNT(*) AS cnt
               FROM cells GROUP BY row_idx, bucket),
    probes AS (
        SELECT q.{key_col}, c.row_idx, c.bucket
        FROM (SELECT DISTINCT {key_col}, row_idx, bucket FROM cells) c
        JOIN {keys_rel} q USING ({key_col})),
    est AS (
        SELECT p.{key_col}, MIN(COALESCE(s.cnt, 0)) AS est
        FROM probes p LEFT JOIN sketch s USING (row_idx, bucket)
        GROUP BY p.{key_col})"""


def count_min_stream_upsert(sdf: DataFrame, key_col: str, out_path: str,
                            checkpoint: str, d: int = 4, w: int = 1024):
    """Maintain a Count-Min sketch OVER A STREAM: each micro-batch
    builds its delta sketch (bounded: <= d*w cells) and ADDS it into
    the parquet-backed sketch table — counters are additive, so the
    maintained sketch equals the batch-built sketch over the full
    stream EXACTLY (no approximation drift from incremental
    maintenance; pytest asserts cell-level equality). The sketch table
    never exceeds d*w rows regardless of stream volume — the
    bounded-state frequency tracker for unbounded key domains, where a
    per-key streaming aggregation's state would grow without limit."""
    from cpx_etl_spark.operators.relational import additive_rollup_merge
    from cpx_etl_spark.sources.sinks import (
        read_upsert_table,
        upsert_parquet_table,
    )

    def upsert_delta(batch_df: DataFrame, _bid: int) -> None:
        if not batch_df.take(1):
            return
        delta = count_min_build(batch_df, key_col, d=d, w=w)
        try:
            base = read_upsert_table(batch_df.sparkSession, out_path)
        except Exception:
            base = None
        merged = additive_rollup_merge(
            base, delta, ["row_idx", "bucket"], ["cnt"]
        )
        upsert_parquet_table(merged, out_path, keys=["row_idx", "bucket"])

    return (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(upsert_delta)
        .trigger(availableNow=True)
        .start()
    )
