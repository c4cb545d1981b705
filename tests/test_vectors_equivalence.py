"""Bitwise equivalence of the r17 unrolled vector kernels.

dot/norm/cosine grew a static-``dim`` fast path (unrolled codegen
chain) that must be BIT-identical to the length-generic left fold the
DuckDB oracles replay — same association order, no reassociation, same
null semantics. These tests pin that equivalence on adversarial floats
(denormals, huge/tiny magnitudes, exact ties) so a regression shows up
here before it shows up as an oracle hash mismatch.
"""

from __future__ import annotations

import math
import random
import struct

from pyspark.sql import functions as F

from cpx_etl_spark.functions.vectors import as_double, cosine, dot, norm


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


def _mk_vectors(rnd, n, dim):
    """Adversarial float32-representable draws: mixed magnitudes, exact
    zeros, negatives — everything a parquet float column can hold."""
    out = []
    for i in range(n):
        vec = []
        for _ in range(dim):
            kind = rnd.random()
            if kind < 0.05:
                v = 0.0
            elif kind < 0.10:
                v = rnd.choice([1e-30, -1e-30, 1e20, -1e20])
            else:
                v = rnd.uniform(-2.0, 2.0)
            # round-trip through float32 like the embeddings column
            v = struct.unpack("<f", struct.pack("<f", v))[0]
            vec.append(v)
        out.append((i, vec))
    return out


def test_dot_norm_cosine_unrolled_bitwise_equals_fold(spark):
    rnd = random.Random(20250817)
    for dim in (3, 8, 16, 64):
        rows = _mk_vectors(rnd, 40, dim)
        pairs = [
            (a_id, va, b_id, vb)
            for (a_id, va) in rows[:20]
            for (b_id, vb) in rows[20:]
        ]
        df = spark.createDataFrame(
            pairs, "a_id long, va array<float>, b_id long, vb array<float>"
        )
        a, b = as_double("va"), as_double("vb")
        res = df.select(
            dot(a, b).alias("dot_fold"),
            dot(a, b, dim).alias("dot_unrolled"),
            norm(a).alias("norm_fold"),
            norm(a, dim).alias("norm_unrolled"),
            cosine(a, b).alias("cos_fold"),
            cosine(a, b, dim).alias("cos_unrolled"),
            F.round(cosine(a, b) - 1e-9, 6).alias("r_fold"),
            F.round(cosine(a, b, dim) - 1e-9, 6).alias("r_unrolled"),
        ).collect()
        for r in res:
            assert _bits(r.dot_fold) == _bits(r.dot_unrolled), (dim, r)
            assert _bits(r.norm_fold) == _bits(r.norm_unrolled), (dim, r)
            # NaN (zero-norm) must agree as NaN-vs-NaN, bitwise compare
            # handles that; finite values must agree bitwise too
            assert _bits(r.cos_fold) == _bits(r.cos_unrolled), (dim, r)
            assert _bits(r.r_fold) == _bits(r.r_unrolled), (dim, r)


def test_as_double_cast_equals_transform(spark):
    rnd = random.Random(99)
    rows = _mk_vectors(rnd, 50, 16)
    rows.append((len(rows), None))  # null array
    df = spark.createDataFrame(rows, "vid long, v array<float>")
    res = df.select(
        as_double("v").alias("cast_way"),
        F.transform("v", lambda x: x.cast("double")).alias("hof_way"),
    ).collect()
    for r in res:
        if r.hof_way is None:
            assert r.cast_way is None
            continue
        assert len(r.cast_way) == len(r.hof_way)
        for x, y in zip(r.cast_way, r.hof_way):
            assert _bits(x) == _bits(y), r


def test_null_element_propagates_same(spark):
    df = spark.createDataFrame(
        [(0, [1.0, None, 2.0], [3.0, 4.0, 5.0])],
        "vid long, va array<double>, vb array<double>",
    )
    res = df.select(
        dot(F.col("va"), F.col("vb")).alias("fold"),
        dot(F.col("va"), F.col("vb"), 3).alias("unrolled"),
    ).collect()[0]
    assert res.fold is None and res.unrolled is None


def test_dot_unrolled_is_codegen_not_fallback(spark):
    """The point of the fast path: no interpreted HOF in the plan.
    The unrolled projection must not contain aggregate/zip_with nodes
    (their presence means the CodegenFallback interpreter is back)."""
    df = spark.createDataFrame([(0, [1.0] * 8, [2.0] * 8)],
                               "vid long, va array<double>, vb array<double>")
    plan = df.select(
        dot(F.col("va"), F.col("vb"), 8).alias("d")
    )._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" not in plan and "zip_with(" not in plan, plan

    slow = df.select(
        dot(F.col("va"), F.col("vb")).alias("d")
    )._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" in slow  # the generic path still folds
