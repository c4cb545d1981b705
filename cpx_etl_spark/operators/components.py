"""Connected components over pair edges (dedup clustering).

Near-dup PAIRS become dedup CLUSTERS: every document gets the minimum
doc id reachable through the pair graph as its cluster id, and one
representative per cluster survives.

Algorithm: iterative min-label propagation —

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until a fixed point. Each iteration is one shuffle
(join + groupBy-min); convergence needs at most graph-diameter
iterations, and near-dup graphs are shallow (clusters are cliques or
short chains), so the default cap is generous. This is the standard
large-graph CC formulation (label propagation / hash-min), not a
driver-side union-find — at 100 TB the edge list never leaves the
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) where component = min id in the group.

    nodes: one column `id_col` (all vertices, including isolated ones).
    edges: (src_col, dst_col) undirected pairs.
    Converges early when an iteration changes nothing.
    """
    # Materialize the edge list ONCE: its lineage is the full upstream
    # candidate/verify pipeline, which would otherwise be recomputed in
    # every propagation round. (The standard iterative-algorithm
    # pattern — GraphX does the same; on a cluster, localCheckpoint
    # stores partitions on executor storage.)
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("a"), F.col(id_col).alias("label"))
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("a", "b"), on="b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, on="a", how="left")
            .select(
                "a",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        ).localCheckpoint(eager=True)  # checkpoint FIRST, then the
        # fixed-point diff below joins two materialized frames (one
        # cheap job per round instead of a full recompute + a job)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="a")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), F.col("label").alias("component"))


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str,
    pair_a: str = "doc_a", pair_b: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for every row of `df`: component id of the
    near-dup graph (own id when unpaired) + survivor flag (the minimum
    id in its cluster)."""
    nodes = df.select(F.col(id_col))
    comps = connected_components(
        nodes, pairs.select(pair_a, pair_b), id_col=id_col,
        src_col=pair_a, dst_col=pair_b,
    )
    return comps.withColumn("is_survivor", F.col(id_col) == F.col("component"))
