"""Table registry over the driver-generated parquet test data.

Capability parity: the reference resolves named inputs to files via its
FileResolver (reference: src/main/FileResolver.js) and reads them with
format-specific converters (src/main/index.js:143). Here the registry
maps logical table names to parquet scans; Catalyst gets the raw scan
so filter/column pushdown happen at the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (TPC-H ratios: region=5, nation=25, supplier/part grow slowly).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader has no
    # type for: read nanos as long (set here at runtime so ANY session —
    # including the driver's — works) and truncate to microseconds with
    # INTEGER division; double division would lose precision past 2^53.
    # pin the session timezone so timestamp values agree with the
    # (naive-UTC) oracle engine even under a driver-supplied session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # newer corpora store TIMESTAMP(MICROS, not UTC-adjusted);
            # with the session pinned to UTC the cast is value-preserving
            # and gives every downstream op (unix_micros, watermarks) the
            # plain TIMESTAMP they expect
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
