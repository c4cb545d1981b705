"""Vector math over array<float|double> columns.

Pure column expressions — JVM-side, no UDF. Accumulation is an
explicit sequential left-fold so the DuckDB oracle (list_sum over
list_transform) reproduces the same float semantics; results are
rounded before any cross-engine comparison or threshold.

Two physically different, BIT-IDENTICAL formulations (r17, guide §4.1):
higher-order functions (aggregate/zip_with/transform) are
CodegenFallback in Spark — every evaluation interprets a lambda and
allocates a zipped intermediate array. When the caller passes a static
``dim`` the kernel unrolls to the chain
  ((0.0 + a[1]*b[1]) + a[2]*b[2]) + ...
— ordinary codegen'd expressions with the SAME left-fold association
(Spark never reassociates float adds), so every float result, every
rounded threshold, and every oracle hash is unchanged
(tests/test_vectors_equivalence.py pins fold == unrolled bitwise).

MEASURED TRADE (r17, this box): unrolled-64 executes ~3x faster per
row but costs ~0.4-0.5s of EXTRA Catalyst analysis per dot instance
per plan build (the 64-term tree is ~400 nodes; a cosine is three of
them) — and every bench pass re-plans from scratch, so full-dim
unrolling made small queries seconds slower while saving fractions.
Policy: pass ``dim`` only for SMALL static dims (the m=8 PQ subspace
kernels); for 64-dim paths keep the fold and instead PRECOMPUTE
norms once per row below the pair join (cosine = dot/(na*nb) with
na = norm(a) evaluated in an upstream projection — bit-identical,
3x fewer folds per pair, no tree growth).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    # array<float> -> array<double> via a plain element-wise Cast:
    # same per-element widening as the former transform(x -> cast(x)),
    # but a codegen'd expression instead of an interpreted lambda HOF.
    v = vec if isinstance(vec, Column) else F.col(vec)
    return v.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-fold dot product. With static ``dim``: the
    unrolled codegen form (bit-identical; caller guarantees both
    arrays have exactly ``dim`` elements)."""
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.get(a, i - 1) * F.get(b, i - 1)
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


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
