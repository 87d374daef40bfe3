"""Connected components over near-dup pair edges — the cluster-resolution
stage of dedup (pairs say "A~B"; curation needs "keep one doc per
cluster", which requires the transitive closure).

Algorithm: iterative min-label propagation (a DataFrame-native subset of
large-star/small-star). Each node's label starts as its own id; each round
every node adopts the minimum label in its closed neighborhood; converged
when no label changes. Rounds needed = graph diameter (near-dup clusters
are small and dense, so 3-5 rounds in practice); each round is one
join + one groupBy — all shuffles on the node id, no driver-side graph.

The checkpoint-per-round truncates the lineage (an unbounded iterative
plan otherwise grows until analysis cost dominates) — standard practice
for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 15
) -> DataFrame:
    """(node, cluster_id) for every node appearing in the edge list;
    cluster_id = min node id of the component."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning mid-propagation labels would silently split true
        # clusters (a chain of diameter > max_iter) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (component diameter exceeds it)"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
