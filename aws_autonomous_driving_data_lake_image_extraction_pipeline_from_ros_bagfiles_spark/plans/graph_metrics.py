"""Similarity-graph structure metrics (q168): per-node triangle counts
over the embedding near-dup graph.

The graph is the MUTUAL top-K similarity graph (K=8): each node keeps
its K strongest neighbors by (cosine DESC, id), and an undirected edge
survives only if both endpoints kept it. Bounded degree is the scale
guard — the raw tau=0.3 threshold graph measured dense enough at sf1.0
(every node in a triangle) that the wedge join dominated the audit;
mutual-kNN caps the wedge fan-out at K^2 per node at ANY corpus size
and any threshold, which is why kNN graphs are the standard substrate
for similarity-graph analytics.

Triangles measure the local density of the duplicate graph: a node in
many triangles sits in a tightly-knit duplicate clique (one canonical
survivor suffices — cf. q157), while triangle-free edges are chains of
borderline matches that deserve human review. This is the standard
cluster-quality diagnostic run after pair generation and before
canonicalization.

Scale shape: edges come from the SAME corpus-scaled hyperplane-LSH
blocked cosine join as q42 (never all-pairs; block count ∝ N since r5 —
see operators/lsh_blocking.py), stored once with id_a < id_b. Triangle
enumeration is
the classic two-join oriented count: ordering every edge low-id -> high-id
means each triangle {a<b<c} is generated exactly once as the wedge
(a,b)+(b,c) closed by (a,c) — no per-triangle dedup pass. At production
scale the orientation is by DEGREE (low-degree first), which bounds the
wedge fan-out per node by the arboricity (Suri & Vassilvitskii 2011,
"Counting Triangles and the Curse of the Last Reducer"); with the
fixture's id-orientation the join shape — two shuffle joins on node id —
is identical, and both joins stay inside the label blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import dot, norm
from ..tables import load
from .registry import register

Q168_TAU = 0.3
Q168_K = 8

_COS = """list_sum(list_transform(a.embedding::DOUBLE[], (x, i) -> x * (b.embedding::DOUBLE[])[i]))
          / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))
             * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x))))"""


def _scaled_raw_sql() -> str:
    """CTE chain ``lsh_params``/``lsh_bands``/``lsh_cand`` + ``raw(u,v,c)``:
    corpus-scaled LSH-blocked, cosine-verified similarity edges — the r5
    default edge recipe shared by q168/q180 (and q42's pair shape)."""
    from ..operators import lsh_blocking as L

    return f"""{L.nbits_param_sql("embeddings")},
    {L.band_keys_sql("embeddings")},
    {L.candidate_pairs_sql()},
    raw AS MATERIALIZED (
      SELECT cd.id_a AS u, cd.id_b AS v, round({_COS}, 6) AS c
      FROM lsh_cand cd
      JOIN embeddings a ON a.vec_id = cd.id_a
      JOIN embeddings b ON b.vec_id = cd.id_b
      WHERE {_COS} >= {Q168_TAU}
    )"""


def _scaled_raw_edges(emb: DataFrame, n_rows: int) -> DataFrame:
    """Spark twin of :func:`_scaled_raw_sql`: (u, v, c) verified edges from
    corpus-scaled LSH candidates; norms computed once per vector.
    ``n_rows`` comes from the caller's footer-only count of the raw scan
    (counting a repartitioned frame would force a full pass first)."""
    from ..operators import lsh_blocking as L

    nbits = L.n_block_bits(n_rows)
    cand = L.scaled_candidate_pairs(emb.select("vec_id", "embedding"), nbits)
    normed = emb.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nm")
    )
    a = normed.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("nm").alias("na"),
    )
    b = normed.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("nm").alias("nb"),
    )
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(sim >= Q168_TAU)
        .select(
            F.col("id_a").alias("u"),
            F.col("id_b").alias("v"),
            F.round(sim, 6).alias("c"),
        )
    )


def _mutual_knn_edges_sql() -> str:
    """Oracle CTE chain ending in ``edges(u, v)``: the mutual top-K
    similarity graph. Shared by q168 and q180 — q180 is documented as
    operating on q168's edge set, so the construction (and any K or
    tie-break change) exists once. Spark twin: _mutual_knn_edges().

    The multi-referenced CTEs are MATERIALIZED (DuckDB hint, no semantic
    effect): without it a downstream consumer that references the chain
    several times (q229's unrolled LPA rounds) re-evaluates the LSH
    verify exponentially — 215 s -> 23 s oracle wall at sf0.01."""
    return f"""
    {_scaled_raw_sql()},
    dir AS (SELECT u, v, c FROM raw UNION ALL SELECT v, u, c FROM raw),
    top AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT u, v, row_number() OVER (PARTITION BY u
                                        ORDER BY c DESC, v) AS rn
        FROM dir) WHERE rn <= {Q168_K}
    ),
    edges AS MATERIALIZED (
      SELECT a.u, a.v FROM top a JOIN top b ON a.u = b.v AND a.v = b.u
      WHERE a.u < a.v
    )"""


# q168/q180/q229 all operate on the SAME mutual-kNN edge set (q180 and
# q229 are documented as consuming q168's graph), yet each one re-ran the
# LSH-blocked cosine verify + mutual-top-K construction — the single
# most expensive stage of all three (the downstream triangle/wedge/LPA
# work is cheap against the degree-bounded edge list). Compute the edge
# stage once per session and serve the checkpointed result to every
# consumer — the exact policy of operators/components.py::_FAMILY_CACHE
# (q54/q157/q203/q205), which is what a production pipeline does with a
# materialized similarity graph. Keyed by (applicationId, sf_dir); a key
# change clears the cache (one corpus in flight at a time). bench.py
# annotates the three consumers as shared-stage so whichever runs first
# is known to carry the construction cost.
_EDGE_CACHE: dict[tuple, DataFrame] = {}


def family_raw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized verified (u, v, c) similarity edge set over
    ``embeddings`` (corpus-scaled LSH blocking + cosine >= Q168_TAU,
    rounded to 6dp) — q42's exact near-dup pair set AND the input of the
    mutual-kNN construction below. The LSH-candidate cosine verify is
    the expensive stage of both; computed once per session."""
    key = (spark.sparkContext.applicationId, sf_dir, "raw")
    if key not in _EDGE_CACHE:
        if any(k[:2] != key[:2] for k in _EDGE_CACHE):
            _EDGE_CACHE.clear()
        base = load(spark, sf_dir, "embeddings")
        n = base.count()  # footer-only job on the raw scan
        emb = base.repartition(spark.sparkContext.defaultParallelism)
        pre = _scaled_raw_edges(emb, n)
        from .registry import audit_round

        audit_round("family_raw_edges:gen", pre)
        _EDGE_CACHE[key] = pre.localCheckpoint(eager=True)
    return _EDGE_CACHE[key]


def family_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized mutual-kNN edge set (u < v) over ``embeddings`` —
    q168's exact graph, reused by q180/q229. The returned frame is an
    eager localCheckpoint (built inside :func:`_mutual_knn_edges`)."""
    key = (spark.sparkContext.applicationId, sf_dir, "mutual")
    if key not in _EDGE_CACHE:
        if any(k[:2] != key[:2] for k in _EDGE_CACHE):
            _EDGE_CACHE.clear()
        _EDGE_CACHE[key] = _mutual_knn_edges(family_raw_edges(spark, sf_dir))
    return _EDGE_CACHE[key]


def _mutual_knn_edges(raw: DataFrame) -> DataFrame:
    """Undirected mutual-top-K edge set (u < v) from verified (u, v, c)
    similarity edges. The raw verify join and the top-K frame each feed
    TWO consumers (both union branches / both sides of the mutual join):
    without the pins the expensive LSH-candidate cosine verify ran 4x
    and the top-K window shuffle 2x per query (r7 review). The returned
    edge list is an eager localCheckpoint; intermediates are released
    before return.
    """
    raw = raw.cache()
    direct = raw.unionAll(
        raw.select(F.col("v").alias("u"), F.col("u").alias("v"), "c")
    )
    wk = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("v"))
    top = (
        direct.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= Q168_K)
        .select("u", "v")
        .cache()
    )
    rev = top.select(F.col("v").alias("u"), F.col("u").alias("v"))
    pre = top.join(rev, ["u", "v"]).filter(  # mutual: both directions kept it
        F.col("u") < F.col("v")
    )
    # the construction plan is hidden behind the checkpoint from every
    # consumer's registry-level explain — capture it for the plan audit
    # (the family_pairs pattern; whichever consumer builds the shared
    # stage carries it)
    from .registry import audit_round

    audit_round("mutual_knn_edges:gen", pre)
    edges = pre.localCheckpoint(eager=True)
    top.unpersist()
    raw.unpersist()
    return edges


@register(
    "q168_triangle_count",
    oracle=f"""
    WITH {_mutual_knn_edges_sql()},
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY node
    """,
)
def q168_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = family_edges(spark, sf_dir)
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # one evaluation of the triangle joins: exploding {a,b,c} per row
    # replaces the 3-branch unionAll that re-ran the join chain per branch
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


# --------------------------------------------------------------------------
# q180 — link prediction over the mutual-kNN similarity graph (q168's
# edge set): for node pairs at distance 2 that are NOT already linked,
# score the missing edge by common-neighbor count and Adamic-Adar
# (sum of 1/ln(deg(z)) over shared neighbors z) — the standard "these
# two are probably duplicates too" candidate generator that turns a
# sparse pair list into cluster-completion suggestions.
#
# Scale shape: the wedge join is the SAME bounded fan-out as q168 (the
# kNN degree cap bounds every node's neighborhood at K), edge generation
# is the corpus-scaled LSH-blocked verify shared with q168/q42, the
# node-sized degree table joins on the wedge's existing z shuffle (NOT a
# driver broadcast — node-sized means corpus-sized, which outgrows any
# broadcast budget), and existing edges are removed with an anti-join.
# No all-pairs anywhere.
# --------------------------------------------------------------------------


@register(
    "q180_link_prediction",
    oracle=f"""
    WITH {_mutual_knn_edges_sql()},
    und AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT u AS z, count(*) AS d FROM und GROUP BY 1),
    wedge AS (
      SELECT a.u AS x, b.v AS y, a.v AS z
      FROM und a JOIN und b ON a.v = b.u
      WHERE a.u < b.v
    ),
    cand AS (
      SELECT w.x, w.y,
             count(*) AS common_neighbors,
             round(sum(1.0 / ln(deg.d)), 6) AS adamic_adar
      FROM wedge w JOIN deg ON w.z = deg.z
      WHERE deg.d > 1
        AND NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = w.x AND e.v = w.y)
      GROUP BY 1, 2
    )
    SELECT x, y, CAST(common_neighbors AS BIGINT) AS common_neighbors,
           adamic_adar
    FROM cand WHERE common_neighbors >= 1
    """,
)
def q180_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = family_edges(spark, sf_dir)
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("z")).agg(F.count("*").alias("d"))
    wa = und.select(F.col("u").alias("x"), F.col("v").alias("z"))
    wb = und.select(F.col("u").alias("z"), F.col("v").alias("y"))
    wedge = wa.join(wb, "z").filter(F.col("x") < F.col("y"))
    open_wedge = wedge.join(
        edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    # plain shuffle join on z — deg is NODE-sized (one row per graph
    # node), so a forced driver broadcast dies at exactly the corpus
    # scale this module targets; the wedge already shuffles on z, making
    # the co-partitioned join free (r7 review)
    scored = (
        open_wedge.join(deg.filter(F.col("d") > 1), "z")
        .groupBy("x", "y")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log("d")), 6).alias("adamic_adar"),
        )
    )
    return scored.filter(F.col("common_neighbors") >= 1).select(
        "x",
        "y",
        F.col("common_neighbors").cast("bigint").alias("common_neighbors"),
        "adamic_adar",
    )
