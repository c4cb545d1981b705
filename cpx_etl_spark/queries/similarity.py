"""§2.4 Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpx_etl_spark.functions.vectors import as_double, norm, sql_cosine, sql_norm
from cpx_etl_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from cpx_etl_spark.queries import register
from cpx_etl_spark.sources import load_table


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({sql_cosine('q.embedding', 'c.embedding', 64)} - 1e-9, 6) + 0 AS cos
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5 (the ANN baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=10
    )


@register("ann_lsh_topk")  # rows-only: hyperplane hashing is engine-specific
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN with 1-bit multiprobe (the scale path).

    4 planes: this corpus's true neighbors sit at cosine ~0.4-0.5, so
    P(sign agreement) ~= 0.67/plane — more planes shrink buckets faster
    than they help precision (recall@10 measured: 4 planes 0.47,
    8 planes 0.07). Denser corpora warrant more planes."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        k=10, n_planes=4, dim=64,
    )


@register("ann_ivf_topk")  # rows-only: float centroid pipeline
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: label-seeded centroids, nprobe=2 cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", "label",
        k=10, nprobe=2, dim=64,
    )


@register(
    "embedding_stats",
    oracle=f"""
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND({sql_norm('embedding', 64)} - 1e-9, 6)
                              AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) - 1e-9, 4) + 0 AS avg_norm,
           ROUND(MIN({sql_norm('embedding', 64)}) - 1e-9, 4) + 0 AS min_norm,
           ROUND(MAX({sql_norm('embedding', 64)}) - 1e-9, 4) + 0 AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm statistics (array aggregation, no UDF)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", norm(as_double("embedding")).alias("nrm")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(
            F.sum(F.round(F.col("nrm") - 1e-9, 6).cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
            - 1e-9,
            4,
        ).alias("avg_norm"),
        F.round(F.min("nrm") - 1e-9, 4).alias("min_norm"),
        F.round(F.max("nrm") - 1e-9, 4).alias("max_norm"),
    )
