"""Vector math over array<float|double> columns.

Pure column expressions (zip_with/aggregate) — JVM-side, no UDF.
Accumulation is an explicit sequential left-fold so the DuckDB oracle
(list_sum over list_transform) reproduces the same float semantics;
results are rounded before any cross-engine comparison or threshold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = vec if isinstance(vec, Column) else F.col(vec)
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str, dim: int) -> str:
    """DuckDB twin of dot() (1-based list indexing)."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def sql_norm(a: str, dim: int) -> str:
    return f"sqrt({sql_dot(a, a, dim)})"


def sql_cosine(a: str, b: str, dim: int) -> str:
    return f"({sql_dot(a, b, dim)} / ({sql_norm(a, dim)} * {sql_norm(b, dim)}))"
