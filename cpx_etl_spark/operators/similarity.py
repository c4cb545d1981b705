"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k — broadcast the (small) query
  set, one scan over the corpus, per-query window top-k. The baseline
  and the verifier for the approximate paths.
- lsh_topk: random-hyperplane LSH — sign-bit bucket key per vector,
  candidates share a bucket (multi-probe over bit flips), exact rerank
  inside buckets. The 100 TB path: bucket join instead of cross join.
- ivf_topk: IVF-style — deterministic centroids (per-label means),
  vectors assigned to nearest centroid cell, queries probe the
  `nprobe` nearest cells, exact rerank within probed cells.

Hyperplanes/centroids are derived deterministically from hashes/data
(no RNG) so every run and every engine agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cpx_etl_spark.functions.vectors import as_double, cosine, norm


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Exact top-k: corpus scan x broadcast queries. Ranking uses the
    ROUNDED cosine (6dp) with id tiebreak => deterministic result set."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("v_c")
    )
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("v_q"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("v_q"), F.col("v_c")) - 1e-9, 6).alias("cos"),
    )
    return _ranked(pairs, k)


def _hyperplane_sign(vec, plane_idx: int, dim: int):
    """Sign of <v, h_p> where h_p[i] is a deterministic pseudo-random
    value in [-1, 1) derived from xxhash64(p:i) — no RNG state."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.concat(F.lit(f"{plane_idx}:"), i.cast("string"))), F.lit(1000003))
            / 1000003.0 * 2.0 - 1.0
        ),
    )
    prod = F.aggregate(
        F.zip_with(vec, comps, lambda x, h: x * h), F.lit(0.0), lambda a, x: a + x
    )
    return F.when(prod >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec, n_planes: int, dim: int):
    """Pack the hyperplane sign bits into one integer bucket key."""
    key = F.lit(0).cast("long")
    for p in range(n_planes):
        key = key.bitwiseOR(F.shiftleft(_hyperplane_sign(vec, p, dim).cast("long"), p))
    return key


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (plus the
    query's 1-bit-flip neighbor buckets when multiprobe), exact cosine
    rerank inside. Bucket join replaces the cross join at scale."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("v_c"),
    ).withColumn("bucket", lsh_bucket(F.col("v_c"), n_planes, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("v_q")
    ).withColumn("bucket0", lsh_bucket(F.col("v_q"), n_planes, dim))
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(1 << p)).cast("long")
                for p in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("bucket0"))
    q = q.select("query_id", "v_q", F.explode(probes).alias("bucket"))
    pairs = c.join(F.broadcast(q), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("v_q"), F.col("v_c")) - 1e-9, 6).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    return _ranked(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    k: int = 10,
    nprobe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF-style ANN with data-derived centroids: the mean vector of
    each `cell_col` group is the cell centroid; every vector is
    re-assigned to its NEAREST centroid; queries probe the nprobe
    nearest cells and rerank exactly within them."""
    vecs = corpus.select(F.col(id_col), as_double(vec_col).alias("v"), F.col(cell_col))
    # centroid = elementwise mean per seed cell (exact integer count,
    # double sums — deterministic given the groupBy)
    exploded = vecs.select(cell_col, F.posexplode("v").alias("i", "x"))
    centroids = (
        exploded.groupBy(cell_col, "i")
        .agg(F.avg("x").alias("m"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
        .select(
            F.col(cell_col).alias("cell"),
            F.transform("pairs", lambda p: p.getField("m")).alias("centroid"),
        )
    )
    # assign every corpus vector to its nearest centroid
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("c_cos").desc(), F.col("cell")
    )
    assigned = (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("c_cos", F.round(cosine(F.col("v"), F.col("centroid")) - 1e-9, 6))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("v_c"), "cell")
    )
    # queries probe nprobe nearest cells
    w_probe = Window.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("cell"))
    probed = (
        queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("v_q"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("c_cos", F.round(cosine(F.col("v_q"), F.col("centroid")) - 1e-9, 6))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "v_q", "cell")
    )
    pairs = assigned.join(probed, on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("v_q"), F.col("v_c")) - 1e-9, 6).alias("cos"),
    )
    return _ranked(scored, k)


def _round_half_away(x, decimals: int):
    """SQL-style ROUND (half away from zero) for numpy arrays —
    np.round is banker's rounding and would disagree with the engines."""
    import numpy as np

    p = 10.0 ** decimals
    x = x - 1e-9  # tie-safe shift, mirrors queries.fround
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def embedding_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, rounded cosine >=
    threshold), block-matrix formulation: the (normalized) corpus
    matrix broadcasts to every task, and each Arrow batch computes a
    B×N cosine block with one BLAS matmul instead of per-pair
    interpreted array lambdas (~100× over the HOF expression form).

    The corpus matrix must fit in a broadcast (N×dim doubles) — the
    all-pairs operator inherently carries that bound; beyond it, use
    LSH buckets (lsh_topk) as the pair generator instead.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pdf = df.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("_v")).toPandas()
    ids = pdf["_id"].to_numpy()
    mat = np.stack(pdf["_v"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def block(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            if not len(batch):
                continue
            q_ids = batch["_id"].to_numpy()
            q = np.stack(batch["_v"].to_numpy())
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            cos = _round_half_away(q @ b_mat.T, 4)
            keep = (cos >= threshold) & (q_ids[:, None] < b_ids[None, :])
            qi, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {"vec_a": q_ids[qi], "vec_b": b_ids[bi], "cos": cos[qi, bi]}
            )

    return df.select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("_v")
    ).mapInPandas(block, schema="vec_a long, vec_b long, cos double")
