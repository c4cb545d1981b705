"""Output sinks and extra tabular sources.

Reference parity: the reference 'load' phase writes to relational
tables (src/main/etl.js:792); at data-lake scale the equivalents are
partitioned parquet (partition pruning for readers), bucketed tables
(shuffle-free co-located joins), and csv/jsonl for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: readers prune partitions on the
    partition columns for free."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on the bucket columns between
    co-bucketed tables skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None,
    header: bool = True, **options,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def upsert_parquet_table(df: DataFrame, path: str, keys: list[str]) -> None:
    """Idempotent load into a parquet-backed table (reference load
    phase, etl.js:758-829: INSERT of deduped entity sets — re-running
    the same load must not grow the table).

    Merge-on-read-free formulation for plain parquet: read the current
    table if it exists, SCD-1 merge the incoming rows on the PK
    (incoming wins), write to a sibling tmp dir, swap. At real scale
    the same merge lands on a table format with transactional commit
    (Iceberg/Delta); the merge plan — one key-partitioned full-outer
    join, pre-bucketable — is identical.
    """
    import os
    import shutil

    from cpx_etl_spark.operators.relational import merge_upsert

    spark = df.sparkSession
    tmp, old = path + "._tmp", path + "._old"
    # Crash recovery BEFORE cleanup: if the live table is missing, a
    # prior run died inside its swap. '._tmp' only replaces the live
    # table after its write completed (the rename-aside happens last),
    # so promote it; otherwise restore the set-aside original. Only
    # then clear leftovers — deleting first would destroy the last
    # surviving copy.
    if not os.path.exists(path):
        if os.path.exists(tmp):
            os.rename(tmp, path)
        elif os.path.exists(old):
            os.rename(old, path)
    for stale in (tmp, old):  # a failed prior run must not poison this one
        if os.path.exists(stale):
            shutil.rmtree(stale)
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*df.columns)
        merged = merge_upsert(existing, df, keys=keys)
    else:
        merged = df
    merged.write.mode("overwrite").parquet(tmp)
    # Rename-aside swap: the live table is never deleted before its
    # replacement is in place, so a crash leaves either the old or the
    # new table readable (plus at worst a '._old'/'._tmp' leftover that
    # the next run clears). Still not transactional across readers —
    # real scale lands this merge on Iceberg/Delta commit protocols.
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
