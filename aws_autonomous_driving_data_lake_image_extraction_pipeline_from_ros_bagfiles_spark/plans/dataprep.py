"""Training-data preparation tier (q170-q173, q183): product-quantized
ANN retrieval, CDC changelog materialization, cross-split leakage audit,
token-budget waterfilling, and snapshot reconciliation.

Scale notes (100 TB discipline):
- q170's codebooks and per-query distance tables are O(m*k) rows —
  broadcast; the corpus is touched twice (code assignment, ADC join),
  both times via joins keyed on (subspace, code), never vector x vector.
  PQ codes compress a 64-float vector to m=4 bytes: the 256x storage
  squeeze that makes billion-vector serving fit in RAM (Jegou et al.
  2011, "Product Quantization for Nearest Neighbor Search").
- q171 folds a changelog with one per-key rank window (bounded by a
  key's op count) — the standard CDC materialization, no driver state.
- q172 restricts the (already inverted-index-bounded) near-dup pair
  relation to pairs that cross q96's md5 split boundary — the leakage
  check every train/val/test cut needs after document-level dedup.
- q173's waterfilling is two windows over the |sources|-row aggregate —
  the allocation solver runs on the rollup, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import materialize, register

# --------------------------------------------------------------------------
# q170 — product-quantization ADC retrieval: m=4 subspaces x 16 dims,
# k=16 codes per subspace. The codebook is DETERMINISTIC — code j of
# subspace s is anchor vector j's s-th subvector (anchors = vec_id 0-15)
# — so both engines rebuild it bit-for-bit; the assignment/ADC plumbing
# is identical to the trained tier. (The "a trained codebook would be
# rows-only" caveat this query originally carried is closed: q223
# TRAINS its codebooks with the deterministic integer-quantized grouped
# Lloyd and stays hash-gated, and q224 composes that with coarse cells
# + residuals into full IVFADC. q170 remains the anchor-codebook
# float-arithmetic variant: it exercises float-double ADC sums and the
# multi-query batch shape, which the integer tier doesn't.)
# Every corpus vector gets its argmin code per subspace; queries
# (vec_id 16-19) score the corpus through the asymmetric distance table
# sum_s d2(query_sub_s, codebook[s][code_s(v)]) and return top-5.
# --------------------------------------------------------------------------
Q170_M = 4
Q170_SUB = 16          # dims per subspace (4 x 16 = 64)
Q170_K = 16            # codes per subspace (anchors vec_id 0..15)
Q170_QUERIES = (16, 17, 18, 19)
Q170_TOPK = 5

_QIDS = ", ".join(str(q) for q in Q170_QUERIES)


@register(
    "q170_pq_adc_retrieval",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sub AS (
      SELECT vec_id, s,
             v[s * {Q170_SUB} + 1 : s * {Q170_SUB} + {Q170_SUB}] AS sv
      FROM e CROSS JOIN (SELECT unnest(range({Q170_M})) AS s)
    ),
    codebook AS (
      SELECT s, vec_id AS code, sv AS cv FROM sub WHERE vec_id < {Q170_K}
    ),
    corpus AS (SELECT * FROM sub WHERE vec_id >= {Q170_K}
               AND vec_id NOT IN ({_QIDS})),
    dists AS (
      SELECT c.vec_id, c.s, cb.code,
             list_sum(list_transform(c.sv, (x, i) -> (x - cb.cv[i])
                                                     * (x - cb.cv[i]))) AS d2
      FROM corpus c JOIN codebook cb ON c.s = cb.s
    ),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, code) AS rn
        FROM dists) WHERE rn = 1
    ),
    qd AS (
      SELECT q.vec_id AS qid, q.s, cb.code,
             list_sum(list_transform(q.sv, (x, i) -> (x - cb.cv[i])
                                                     * (x - cb.cv[i]))) AS d2
      FROM sub q JOIN codebook cb ON q.s = cb.s
      WHERE q.vec_id IN ({_QIDS})
    ),
    adc AS (
      SELECT qd.qid, codes.vec_id, round(sum(qd.d2), 6) AS approx_d2
      FROM codes JOIN qd ON codes.s = qd.s AND codes.code = qd.code
      GROUP BY 1, 2
    )
    SELECT qid, CAST(rk AS INT) AS rk, vec_id, approx_d2 FROM (
      SELECT qid, vec_id, approx_d2,
             row_number() OVER (PARTITION BY qid
                                ORDER BY approx_d2, vec_id) AS rk
      FROM adc) WHERE rk <= {Q170_TOPK}
    """,
)
def q170_pq_adc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    subspaces = spark.range(Q170_M).select(F.col("id").cast("int").alias("s"))
    sub = emb.crossJoin(F.broadcast(subspaces)).select(
        "vec_id",
        "s",
        F.slice("v", F.col("s") * Q170_SUB + 1, Q170_SUB).alias("sv"),
    )
    codebook = sub.filter(F.col("vec_id") < Q170_K).select(
        "s", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    corpus = sub.filter(
        (F.col("vec_id") >= Q170_K) & (~F.col("vec_id").isin(*Q170_QUERIES))
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dists = corpus.join(F.broadcast(codebook), "s").select(
        "vec_id", "s", "code", d2.alias("d2")
    )
    wn = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    codes = (
        dists.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    qd = (
        sub.filter(F.col("vec_id").isin(*Q170_QUERIES))
        .join(F.broadcast(codebook), "s")
        .select(F.col("vec_id").alias("qid"), "s", "code", d2.alias("d2"))
    )
    adc = (
        codes.join(F.broadcast(qd), ["s", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
    )
    wr = Window.partitionBy("qid").orderBy("approx_d2", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= Q170_TOPK)
        .select("qid", "rk", "vec_id", "approx_d2")
    )


# --------------------------------------------------------------------------
# q171 — CDC changelog materialization (Debezium-style fold): the event
# stream is read as a changelog on key = user_id — 'signup' inserts,
# 'click'/'view'/'purchase' upsert the value, 'error' deletes. The
# materialized table is the per-key LAST operation in (ts, event_id)
# order: deleted keys vanish, surviving keys carry the last value. One
# rank window per key; the op history length bounds the window.
# --------------------------------------------------------------------------
@register(
    "q171_changelog_materialize",
    oracle="""
    WITH log AS (
      SELECT user_id,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             value, ts, event_id
      FROM events
    ),
    ranked AS (
      SELECT user_id, op, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_ops
      FROM log
    )
    SELECT user_id, op AS last_op, round(value, 2) AS last_value,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q171_changelog_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    log = ev.select("user_id", op.alias("op"), "value", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    ranked = log.select(
        "user_id",
        "op",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_ops"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("op").alias("last_op"),
        F.round("value", 2).alias("last_value"),
        F.col("n_ops").cast("bigint").alias("n_ops"),
    )


# --------------------------------------------------------------------------
# q172 — cross-split leakage audit: after q96's md5 split assignment,
# count the document pairs that are near-duplicates (banded-LSH
# candidates + exact-Jaccard verify >= 0.5 — q24's recipe, the r5 default
# pair generator: candidate counts stay ~linear in corpus size where the
# raw inverted-index join was quadratic) OR exact duplicates (q22
# fingerprint) but land in DIFFERENT splits — the contamination that
# silently inflates eval scores. The split columns ride along on doc_id
# joins.
# --------------------------------------------------------------------------
Q172_THRESHOLD = 0.5


def _q172_oracle() -> str:
    from .llm_ops import minhash_pair_ctes

    from ..operators.dedup import DEFAULT_BUCKET_CAP
    from ..operators.sampling import hash_split_sql

    return f"""
    WITH {minhash_pair_ctes(Q172_THRESHOLD, max_bucket=DEFAULT_BUCKET_CAP)},
    splits AS (
      SELECT doc_id, {hash_split_sql("doc_id")} AS split FROM documents
    ),
    near AS (
        SELECT id_a AS ia, id_b AS ib FROM mh_pairs
    ),
    fps AS (SELECT doc_id,
                   md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
            FROM documents),
    exact AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    crossing AS (
      SELECT n.ia, n.ib, 'neardup' AS kind,
             sa.split AS split_a, sb.split AS split_b
      FROM near n JOIN splits sa ON n.ia = sa.doc_id
                  JOIN splits sb ON n.ib = sb.doc_id
      WHERE sa.split <> sb.split
      UNION ALL
      SELECT e.ia, e.ib, 'exact',
             sa.split, sb.split
      FROM exact e JOIN splits sa ON e.ia = sa.doc_id
                   JOIN splits sb ON e.ib = sb.doc_id
      WHERE sa.split <> sb.split
    )
    SELECT least(split_a, split_b) AS split_lo,
           greatest(split_a, split_b) AS split_hi,
           kind,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM crossing GROUP BY 1, 2, 3
    """


@register("q172_split_leakage", oracle=_q172_oracle())
def q172_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import text_fingerprint
    from ..operators.sampling import hash_split

    from ..operators.components import family_pairs

    docs = load(spark, sf_dir, "documents")
    # the split under audit MUST be q96's — both derive from the shared
    # hash_split contract (operators/sampling.py)
    splits = docs.select(
        "doc_id", hash_split(F.col("doc_id")).alias("split")
    )
    # session-shared capped 0.5 pair table (q197 consumes the identical
    # generation; both are audits OVER the standard near-dup pair set)
    near = family_pairs(spark, sf_dir, threshold=Q172_THRESHOLD).select(
        F.col("id_a").alias("ia"), F.col("id_b").alias("ib"),
        F.lit("neardup").alias("kind"),
    )
    fps = docs.select("doc_id", text_fingerprint(F.col("text")).alias("fp"))
    fa = fps.select(F.col("doc_id").alias("ia"), "fp")
    fb = fps.select(F.col("doc_id").alias("ib"), "fp")
    exact = (
        fa.join(fb, "fp")
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", F.lit("exact").alias("kind"))
    )
    pairs = near.unionAll(exact)
    sa = splits.select(F.col("doc_id").alias("ia"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("ib"), F.col("split").alias("split_b"))
    crossing = (
        pairs.join(sa, "ia")
        .join(sb, "ib")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    out = crossing.groupBy(
        F.least("split_a", "split_b").alias("split_lo"),
        F.greatest("split_a", "split_b").alias("split_hi"),
        "kind",
    ).agg(F.count("*").cast("bigint").alias("n_pairs"))
    return materialize(out)


# --------------------------------------------------------------------------
# q173 — token-budget waterfilling: allocate a total training budget T
# (= Q173_SHARE of corpus tokens) across sources as evenly as possible
# without exceeding any source's available tokens — the mixture solver
# behind "cap each domain at its size, redistribute the remainder"
# (uniform target with caps; temperature-mixture cousin of q75).
# Closed form via the sorted prefix scan: sources ascending by
# availability; at each rank k the candidate water level is
# (T - prefix_of_smaller_sources) / (n - k + 1); the binding level is
# the first one at or below the source's own availability; every source
# then gets min(available, level). Two windows over the |sources| rollup.
# --------------------------------------------------------------------------
Q173_SHARE = 0.5


@register(
    "q173_token_budget",
    oracle=f"""
    WITH avail AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS available
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT sum(available) * {Q173_SHARE} AS budget,
                   count(*) AS n FROM avail),
    ranked AS (
      SELECT source, available,
             row_number() OVER (ORDER BY available, source) AS k,
             sum(available) OVER (ORDER BY available, source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prefix
      FROM avail
    ),
    levels AS (
      SELECT r.source, r.available, r.k,
             (t.budget - coalesce(r.prefix, 0)) / (t.n - r.k + 1) AS level
      FROM ranked r CROSS JOIN tot t
    ),
    binding AS (
      -- levels are non-increasing from the first k with level <= a_k on
      -- (each later step removes a_i >= level from the numerator), so the
      -- binding level is the MAX among qualifying candidates
      SELECT max(level) AS water FROM levels WHERE level <= available
    )
    SELECT l.source, l.available,
           round(least(l.available * 1.0, b.water), 2) AS alloc,
           CAST(l.available <= b.water AS INT) AS capped
    FROM levels l CROSS JOIN binding b
    """,
)
def q173_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("available")
    )
    tot = avail.agg(
        (F.sum("available") * Q173_SHARE).alias("budget"),
        F.count("*").alias("n"),
    )
    wk = Window.orderBy("available", "source")
    wp = Window.orderBy("available", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = avail.select(
        "source",
        "available",
        F.row_number().over(wk).alias("k"),
        F.sum("available").over(wp).alias("prefix"),
    )
    levels = ranked.crossJoin(F.broadcast(tot)).select(
        "source",
        "available",
        (
            (F.col("budget") - F.coalesce("prefix", F.lit(0)))
            / (F.col("n") - F.col("k") + 1)
        ).alias("level"),
    )
    binding = levels.filter(F.col("level") <= F.col("available")).agg(
        F.max("level").alias("water")
    )
    return levels.crossJoin(F.broadcast(binding)).select(
        "source",
        "available",
        F.round(F.least(F.col("available") * 1.0, F.col("water")), 2).alias(
            "alloc"
        ),
        (F.col("available") <= F.col("water")).cast("int").alias("capped"),
    )


# --------------------------------------------------------------------------
# q183 — snapshot reconciliation: materialize the q171 changelog state at
# two cutoffs (day 15 vs day 31) and diff them by key — added / removed /
# changed / unchanged counts plus value drift. The table-diff every
# migration and backfill validation runs; one full-outer join on the key
# of two per-key rank-window folds.
# --------------------------------------------------------------------------
Q183_CUT_A = "2024-01-16"
Q183_CUT_B = "2024-01-31"


def _q183_state_sql(cut: str) -> str:
    return f"""
      SELECT user_id, op, round(value, 2) AS v FROM (
        SELECT user_id,
               CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error' THEN 'D'
                    ELSE 'U' END AS op,
               value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{cut}')
      WHERE rn = 1 AND op <> 'D'
    """


@register(
    "q183_snapshot_diff",
    oracle=f"""
    WITH a AS ({_q183_state_sql(Q183_CUT_A)}),
    b AS ({_q183_state_sql(Q183_CUT_B)}),
    j AS (
      SELECT a.user_id AS ka, b.user_id AS kb, a.v AS va, b.v AS vb
      FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    ),
    verdict AS (
      SELECT CASE WHEN ka IS NULL THEN 'added'
                  WHEN kb IS NULL THEN 'removed'
                  WHEN va = vb THEN 'unchanged'
                  ELSE 'changed' END AS verdict,
             coalesce(vb, 0) - coalesce(va, 0) AS drift
      FROM j
    )
    SELECT verdict, CAST(count(*) AS BIGINT) AS n_keys,
           round(sum(drift), 2) AS value_drift
    FROM verdict GROUP BY 1
    """,
)
def q183_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")

    def state(cut: str) -> DataFrame:
        op = (
            F.when(F.col("event_type") == "signup", "I")
            .when(F.col("event_type") == "error", "D")
            .otherwise("U")
        )
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.filter(F.col("ts") < F.lit(cut).cast("timestamp"))
            .select("user_id", op.alias("op"), "value", "ts", "event_id")
            .withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select("user_id", F.round("value", 2).alias("v"))
        )

    a = state(Q183_CUT_A).select(
        F.col("user_id").alias("ka"), F.col("v").alias("va")
    )
    b = state(Q183_CUT_B).select(
        F.col("user_id").alias("kb"), F.col("v").alias("vb")
    )
    j = a.join(b, a.ka == b.kb, "full_outer")
    verdict = (
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("va") == F.col("vb"), "unchanged")
        .otherwise("changed")
    )
    drift = F.coalesce("vb", F.lit(0.0)) - F.coalesce("va", F.lit(0.0))
    return (
        j.select(verdict.alias("verdict"), drift.alias("drift"))
        .groupBy("verdict")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.round(F.sum("drift"), 2).alias("value_drift"),
        )
    )


# --------------------------------------------------------------------------
# q203 — cluster-aware train/val/test split: q172 finds leakage AFTER the
# fact; this query prevents it by construction. Near-dup clusters (q54's
# banded-minhash pairs -> connected components; singletons = their own
# cluster) are assigned to splits as WHOLE UNITS — the split hash keys on
# the cluster id, not the doc id — so no near-dup pair can ever straddle
# splits (the contamination-by-construction guarantee used by serious
# eval-split pipelines). Output is the per-split rollup a dataset card
# records: docs, clusters, multi-doc clusters.
#
# Scale shape: pair generation + CC are q54's (linear-candidate banded
# tier, O(log d) CC rounds); split assignment and rollup are one hash
# projection + one map-side-combinable groupBy.
# --------------------------------------------------------------------------
def _q203_oracle() -> str:
    from .llm_ops import closure_ctes, minhash_pair_ctes

    from ..operators.dedup import DEFAULT_BUCKET_CAP
    from ..operators.sampling import hash_split_sql

    return f"""
    WITH RECURSIVE
    {minhash_pair_ctes(0.2, max_bucket=DEFAULT_BUCKET_CAP)},
    {closure_ctes()},
    assigned AS (
        SELECT d.doc_id,
               coalesce(comp.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp USING (doc_id)
    ),
    labeled AS (
        SELECT doc_id, cluster_id, {hash_split_sql("cluster_id")} AS split
        FROM assigned
    ),
    csize AS (
        SELECT split, cluster_id, count(*) AS sz
        FROM labeled GROUP BY 1, 2
    )
    SELECT split,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT)
               AS n_docs_in_multi
    FROM csize GROUP BY 1
    """


@register("q203_cluster_aware_split", oracle=_q203_oracle())
def q203_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session-shared pair-gen + CC stage (VERDICT r8 #2)
    from ..operators.components import attach_clusters, family_components
    from ..operators.sampling import hash_split

    docs = load(spark, sf_dir, "documents")
    comp = family_components(spark, sf_dir, threshold=0.2)
    assigned = attach_clusters(docs.select("doc_id"), comp)
    labeled = assigned.select(
        "doc_id", "cluster_id", hash_split(F.col("cluster_id")).alias("split")
    )
    # per-(split, cluster) sizes first: n_docs_in_multi counts the DOCS
    # sitting in multi-doc clusters (the dataset-card number the header
    # promises) — the old count(*) - countDistinct(cluster) computed
    # sum(size-1), undercounting by one doc per multi-doc cluster on
    # both engines (r7 review)
    csize = labeled.groupBy("split", "cluster_id").agg(
        F.count("*").alias("sz")
    )
    out = csize.groupBy("split").agg(
        F.sum("sz").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("sz") >= 2, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_in_multi"),
    )
    return materialize(out)
