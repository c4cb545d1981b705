"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001
queries()    — every implemented operator from SURVEY.md §2
oracle_sql() — matching DuckDB oracles (omitted => rows-only check)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cpx_etl_spark.queries import load_registry

    q, _ = load_registry()
    return q["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cpx_etl_spark.queries import load_registry

    return load_registry()[0]


def oracle_sql() -> dict[str, str]:
    from cpx_etl_spark.queries import load_registry

    return load_registry()[1]
