"""JDBC source/sink configuration.

Parity: the reference loads into MySQL via sequelize models and raw
INSERTs (reference: src/main/etl.js:758-829, spec connects to a local
MySQL). No database or JDBC driver ships in this container, so this
module builds the reader/writer configuration — partitioned reads
(predicate-split on a numeric column) and batched writes — and the
tests assert the constructed plan options. On a real cluster these are
the exact options that make JDBC IO parallel instead of single-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrameReader:
    """Configured parallel JDBC reader (call .load() against a live DB)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned jdbc read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def jdbc_writer(df: DataFrame, url: str, table: str, mode: str = "append",
                batch_size: int = 10_000, **options: str):
    """Configured batched JDBC writer (call .save() against a live DB)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer
