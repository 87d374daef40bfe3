"""Fixed-iteration PageRank over an edge DataFrame — the second iterative
graph operator next to connected components (operators/components.py), and
the centrality measure a dedup pipeline uses to pick the CANONICAL
document of a near-dup family (rank the similarity graph, keep the most
central member) rather than min-id.

Spark-first shape: each iteration is one equi-join of the rank vector
with the edge list (both partitioned by the join key) plus one
map-side-combinable aggregate — no driver-side graph, no RDDs. Every
loop-carried or loop-reused frame is localCheckpointed to truncate
lineage (same discipline as components.py).

The iteration count is FIXED, not convergence-driven, so the computation
is expressible as unrolled SQL — which is exactly what lets q91's DuckDB
oracle replicate it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import truncate_lineage


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Ranks after ``iterations`` rounds of r' = (1-d)/N + d·Σ r(u)/deg(u)
    over incoming neighbors u. ``edges`` is treated as DIRECTED; pass both
    orientations for an undirected graph. Nodes = endpoints of edges (an
    edge graph has no dangling nodes when symmetrized).

    Returns (node, rank).

    Every frame referenced more than once across the loop (edges, nodes,
    deg, and each round's ranks) is localCheckpointed: without it, round
    k's plan re-derives every predecessor — including re-running whatever
    pipeline PRODUCED the edge list — once per reference, and the whole
    computation goes super-linear in ``iterations``.

    ``checkpoint_dir=None`` truncates via localCheckpoint (executor
    storage — fast, not executor-loss-tolerant); pass a reliable dir
    (HDFS/S3A/local) to survive executor loss on long runs — see
    operators/checkpointing.py. The reliable tier checkpoints EAGERLY:
    ``DataFrame.checkpoint(eager=False)`` only marks the RDD, and
    Spark's post-job sweep stops at the nearest marked ancestor, so a
    lazy mark inside the loop would write nothing until the caller's
    first action — zero executor-loss protection during the very
    iterations the tier exists for (r8 review; components.py has always
    been eager for this reason). The local tier stays lazy: blocks
    materialize on first touch and dedup every later reference.
    """
    _eager = checkpoint_dir is not None
    edges = truncate_lineage(edges, checkpoint_dir, eager=_eager)
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionAll(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    nodes = truncate_lineage(nodes, checkpoint_dir, eager=_eager)
    n = nodes.count()  # scalar: dimension of the rank vector, tiny result
    if n == 0:
        # an empty graph has no rank vector; returning an empty frame (not
        # dividing by zero) lets callers compose with empty pair sets
        return nodes.withColumn("rank", F.lit(0.0))
    deg = (
        edges.groupBy(F.col(src_col).alias("node"))
        .agg(F.count("*").alias("deg"))
    )
    deg = truncate_lineage(deg, checkpoint_dir, eager=_eager)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            edges.join(
                ranks.withColumnRenamed("node", src_col), src_col
            )
            .join(deg.withColumnRenamed("node", src_col), src_col)
            .groupBy(F.col(dst_col).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # expose the round's plan (contrib join + rank update) to the
        # plan audit before the checkpoint hides it (VERDICT r9)
        from ..plans.registry import audit_round

        audit_round("pagerank:round", ranks)
        ranks = truncate_lineage(ranks, checkpoint_dir, eager=_eager)
    return ranks
