"""Corpus-quality tier (q157/q159-q161/q163/q176/q197):
cluster-representative canonicalization, Gopher-style rule gates,
containment dedup, n-gram novelty, quality-mass (nucleus) selection,
Neyman allocation, and the cross-source duplication matrix.

These close the curation steps between "find duplicate pairs" (q23/q24)
and "emit a training corpus" (q112/q141): after clustering you must PICK
a survivor (q157); rule filters are applied as a composite named gate
with per-rule diagnostics (q159); containment catches subset/quote
duplication that symmetric Jaccard misses (q160); novelty measures how
much genuinely-new n-gram mass each document contributes (q161); and
nucleus selection keeps the smallest high-quality prefix per source that
still covers a target share of content mass (q163).

Scale notes (100 TB discipline):
- q157 reuses the q54 components operator (large-star/small-star, O(log d)
  rounds, no driver-side graph); representative choice is one rank window
  PARTITIONED by cluster_id — bounded by cluster size, never global.
- q159/q161/q163 shuffle only small keys (source, gram-hash, doc_id);
  every aggregate is map-side combinable.
- q160 uses the same shared-shingle inverted-index join as q23 — the only
  pairs ever materialized already share a shingle; 5-gram shingles keep
  the gram space sparse enough that candidate fan-out stays linear (the
  sparsity-knob argument in the q160 block comment and BENCH_NOTES).
- No Python UDFs anywhere: all column expressions stay in codegen.

Reference provenance: the reference pipeline dedups at file level only
(same-key S3 overwrite, bagstream.py:251-252); these queries are the
beyond-reference LLM-curation tier SURVEY §7/M6 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import materialize, register

# --------------------------------------------------------------------------
# q157 — near-dup cluster canonicalization: q54's connected components
# (over banded-LSH-candidate + exact-Jaccard-verified pairs — the r5
# default pair generator; candidate counts stay ~linear in corpus size)
# plus singleton closure over ALL documents, then ONE survivor per
# cluster by (n_chars DESC, doc_id ASC) — "keep the longest member" is
# the standard near-dup survivor rule (longest = most content). Output is
# the full per-doc verdict table a curation pass writes back to the lake.
# --------------------------------------------------------------------------
Q157_THRESHOLD = 0.2


def _q157_oracle() -> str:
    from .llm_ops import closure_ctes, minhash_pair_ctes

    from ..operators.dedup import DEFAULT_BUCKET_CAP

    return f"""
    WITH RECURSIVE
    {minhash_pair_ctes(Q157_THRESHOLD, max_bucket=DEFAULT_BUCKET_CAP)},
    {closure_ctes()},
    alldocs AS (
        SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id) AS cluster_id,
               d.n_chars
        FROM documents d LEFT JOIN comp USING (doc_id)
    ),
    ranked AS (
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM alldocs
    )
    SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(rk = 1 AS INT) AS is_kept
    FROM ranked
    """


@register("q157_cluster_representatives", oracle=_q157_oracle())
def q157_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session-shared pair-gen + CC stage (VERDICT r8 #2) — the same
    # components frame q54 emits, so the two cluster definitions cannot
    # drift AND the stage is paid once per session
    from ..operators.components import attach_clusters, family_components

    docs = load(spark, sf_dir, "documents")
    comp = family_components(spark, sf_dir, threshold=Q157_THRESHOLD)
    alldocs = attach_clusters(docs.select("doc_id", "n_chars"), comp)
    w = Window.partitionBy("cluster_id")
    rk = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    out = alldocs.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
        (F.row_number().over(rk) == 1).cast("int").alias("is_kept"),
    )
    return materialize(out)


# --------------------------------------------------------------------------
# q159 — Gopher-style composite rule gate (Rae et al. 2021 §A1.1, adapted
# to the synthetic vocabulary): word-count bounds, mean-word-length
# bounds, type-token-ratio floor (repetition proxy), and a minimum
# distinct-stopword count. Reported per source with per-rule failure
# diagnostics — the shape a curation dashboard consumes. One pass, one
# map-side-combinable groupBy on `source`.
# --------------------------------------------------------------------------
Q159_WC_LO, Q159_WC_HI = 20, 80
Q159_MWL_LO, Q159_MWL_HI = 3.0, 6.0
Q159_TTR_MIN = 0.45
Q159_STOPWORDS = ("the", "a", "order", "table", "row")
Q159_STOP_MIN = 2

_STOP_SQL = ", ".join(f"'{s}'" for s in Q159_STOPWORDS)


@register(
    "q159_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT source, string_split(text, ' ') AS w FROM documents
    ),
    feat AS (
      SELECT source,
             len(w) AS wc,
             list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w) AS mwl,
             len(list_distinct(w)) * 1.0 / len(w) AS ttr,
             len(list_distinct(list_filter(w, x -> x IN ({_STOP_SQL}))))
                 AS n_stop
      FROM t
    ),
    rules AS (
      SELECT source,
             CAST(wc BETWEEN {Q159_WC_LO} AND {Q159_WC_HI} AS INT) AS ok_wc,
             CAST(mwl BETWEEN {Q159_MWL_LO} AND {Q159_MWL_HI} AS INT) AS ok_mwl,
             CAST(ttr >= {Q159_TTR_MIN} AS INT) AS ok_ttr,
             CAST(n_stop >= {Q159_STOP_MIN} AS INT) AS ok_stop
      FROM feat
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ok_wc * ok_mwl * ok_ttr * ok_stop) AS BIGINT) AS n_pass,
           CAST(sum(1 - ok_wc) AS BIGINT) AS n_fail_wc,
           CAST(sum(1 - ok_mwl) AS BIGINT) AS n_fail_mwl,
           CAST(sum(1 - ok_ttr) AS BIGINT) AS n_fail_ttr,
           CAST(sum(1 - ok_stop) AS BIGINT) AS n_fail_stop
    FROM rules
    GROUP BY source
    """,
)
def q159_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    wc = F.size(w)
    mwl = (
        F.aggregate(F.transform(w, F.length), F.lit(0), lambda a, x: a + x)
        * F.lit(1.0)
        / wc
    )
    ttr = F.size(F.array_distinct(w)) * F.lit(1.0) / wc
    n_stop = F.size(
        F.array_distinct(F.filter(w, lambda x: x.isin(*Q159_STOPWORDS)))
    )
    feat = docs.select(
        "source",
        wc.between(Q159_WC_LO, Q159_WC_HI).cast("int").alias("ok_wc"),
        mwl.between(Q159_MWL_LO, Q159_MWL_HI).cast("int").alias("ok_mwl"),
        (ttr >= Q159_TTR_MIN).cast("int").alias("ok_ttr"),
        (n_stop >= Q159_STOP_MIN).cast("int").alias("ok_stop"),
    )
    return feat.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.col("ok_wc") * F.col("ok_mwl") * F.col("ok_ttr") * F.col("ok_stop")
        ).cast("bigint").alias("n_pass"),
        F.sum(1 - F.col("ok_wc")).cast("bigint").alias("n_fail_wc"),
        F.sum(1 - F.col("ok_mwl")).cast("bigint").alias("n_fail_mwl"),
        F.sum(1 - F.col("ok_ttr")).cast("bigint").alias("n_fail_ttr"),
        F.sum(1 - F.col("ok_stop")).cast("bigint").alias("n_fail_stop"),
    )


# --------------------------------------------------------------------------
# q160 — containment near-dup (asymmetric): C(a,b) = |A∩B| / min(|A|,|B|)
# over word-3-gram shingle sets. Catches a short document quoted inside a
# longer one — invisible to symmetric Jaccard (the union denominator
# drowns the overlap). Same inverted-index candidate join as q23 — only
# pairs sharing >= 1 shingle are ever materialized — with two scale
# levers:
# 1. GRAM ORDER is the sparsity knob: containment uses 5-gram shingles
#    (vs q23's 3-grams). A gram in f docs emits f^2/2 candidate rows;
#    the 3-gram space of this corpus averages f ~ n_docs/1000 and the
#    sf1.0 audit measured 353 s with near-total candidate blow-up, while
#    5-grams are ~unique (f ~ 1) and the join is linear. Longer shingles
#    for containment is the standard choice (substring-dedup tools use
#    8-13-gram windows) — exact, 100% recall at the 5-gram semantics.
# 2. The join keys on the 60-bit md5 gram hash (q111's convention):
#    8-byte shuffle keys instead of ~40-byte gram strings.
# --------------------------------------------------------------------------
Q160_THRESHOLD = 0.6
Q160_N = 5


@register(
    "q160_containment_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shl AS (SELECT doc_id,
                   list_distinct(list_filter(
                       list_transform(w, (x, i) -> CASE WHEN i <= len(w) - 4
                           THEN x || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                                  || w[i+3] || ' ' || w[i+4] END),
                       s -> s IS NOT NULL)) AS sh
            FROM toks),
    shx AS (SELECT doc_id,
                   CAST('0x' || substr(md5(unnest(sh)), 1, 15) AS BIGINT)
                       AS gh
            FROM shl),
    sizes AS (SELECT doc_id, len(sh) AS n FROM shl),
    inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
        FROM shx a JOIN shx b USING (gh)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT ia, ib,
           round(c * 1.0 / least(sa.n, sb.n), 6) AS containment
    FROM inter
    JOIN sizes sa ON ia = sa.doc_id
    JOIN sizes sb ON ib = sb.doc_id
    WHERE c * 1.0 / least(sa.n, sb.n) >= {Q160_THRESHOLD}
    """,
)
def q160_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = load(spark, sf_dir, "documents")
    # cache the shingle+hash stream: sizes and BOTH self-join sides read
    # it, so without the pin the interpreted-HOF tokenize+md5 stage — the
    # expensive step — runs 3x (r7 review; the dedup module's own
    # convention for exactly this shape)
    sh = DD.cache_pinned(
        DD.shingles_long(docs, n=Q160_N).select(
            "doc_id",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("ia"), "gh")
    b = sh.select(F.col("doc_id").alias("ib"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("ia"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("ib"), F.col("n").alias("nb"))
    cont = F.col("c") * F.lit(1.0) / F.least("na", "nb")
    out = (
        inter.join(sa, "ia")
        .join(sb, "ib")
        .filter(cont >= Q160_THRESHOLD)
        .select("ia", "ib", F.round(cont, 6).alias("containment"))
    )
    result = materialize(out)
    DD.release_caches()
    return result


# --------------------------------------------------------------------------
# q161 — n-gram novelty by ingest order: a document's novelty is the
# fraction of its distinct 3-grams whose FIRST corpus occurrence (min
# doc_id = arrival order) is this document. Freshness/diversity signal:
# boilerplate-heavy late arrivals score near 0. The gram->first-doc
# attribution is one map-side-combinable min() groupBy on the 60-bit md5
# gram hash (q111's convention, 8-byte shuffle keys). There is NO
# gram-level join: n_novel per doc falls out of grouping the
# first-occurrence table by its winning doc, so the only joins run at
# DOC granularity (|docs| rows, not |grams|) — the first cut joined the
# full gram stream back to the attribution table and the sf1.0 audit
# measured it 12x at 10x data, dominated by that shuffle.
# --------------------------------------------------------------------------
@register(
    "q161_ngram_novelty",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shl AS (SELECT doc_id,
                   list_distinct(list_filter(
                       list_transform(w, (x, i) -> CASE WHEN i <= len(w) - 2
                           THEN x || ' ' || w[i+1] || ' ' || w[i+2] END),
                       s -> s IS NOT NULL)) AS sh
            FROM toks),
    shx AS (SELECT doc_id,
                   CAST('0x' || substr(md5(unnest(sh)), 1, 15) AS BIGINT)
                       AS gh
            FROM shl),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM shx GROUP BY 1),
    first AS (SELECT gh, min(doc_id) AS first_doc FROM shx GROUP BY 1),
    novel AS (SELECT first_doc AS doc_id, count(*) AS n_novel
              FROM first GROUP BY 1)
    SELECT s.doc_id,
           CAST(s.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(v.n_novel, 0) AS BIGINT) AS n_novel,
           round(coalesce(v.n_novel, 0) * 1.0 / s.n_grams, 6) AS novelty
    FROM sizes s LEFT JOIN novel v USING (doc_id)
    """,
)
def q161_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = load(spark, sf_dir, "documents")
    # cache the gram stream: the sizes (by doc_id) and first-occurrence
    # (by gh) aggregates are independent consumers — without the pin the
    # gram tokenize+md5 bill (the stage the header's sf1.0 audit showed
    # dominating) is paid twice (r7 review)
    sh = DD.cache_pinned(
        DD.shingles_long(docs).select(
            "doc_id",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    first = sh.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    out = sizes.join(novel, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.round(
            F.coalesce("n_novel", F.lit(0)) * F.lit(1.0) / F.col("n_grams"), 6
        ).alias("novelty"),
    )
    result = materialize(out)
    DD.release_caches()
    return result


# --------------------------------------------------------------------------
# q163 — quality-mass (nucleus) selection: per source, rank documents by
# content mass (n_chars DESC, doc_id ASC) and keep the smallest prefix
# whose cumulative mass reaches Q163_P of the source total — top-p
# sampling applied to corpus curation. All sums are INTEGER (n_chars), so
# the cumulative comparison is bit-exact on both engines. The window is
# partitioned by source — never global.
# --------------------------------------------------------------------------
Q163_P = 0.5


@register(
    "q163_quality_mass_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    ),
    verdict AS (
      SELECT source, n_chars,
             CAST(cum - n_chars < {Q163_P} * total AS INT) AS kept
      FROM ranked
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM verdict
    GROUP BY source
    """,
)
def q163_quality_mass_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wcum = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(wcum).alias("cum"),
        F.sum("n_chars").over(wtot).alias("total"),
    )
    kept = (F.col("cum") - F.col("n_chars") < Q163_P * F.col("total")).cast(
        "int"
    )
    return (
        ranked.select("source", "n_chars", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).cast("bigint").alias(
                "kept_chars"
            ),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# q176 — Neyman allocation for stratified sampling: allocate a total
# sample budget across strata proportionally to N_h * S_h (stratum size
# x standard deviation) — the variance-minimizing allocation, vs q72's
# fixed-fraction strata. All moments are computed from INTEGER sums
# (sum, sum of squares, count) so both engines derive identical doubles
# per stratum; the builtin stddev aggregates are avoided on purpose
# (Welford vs naive accumulation would diverge in float order).
#
# The CROSS-stratum denominator is the one place a raw double sum would
# reintroduce accumulation-order dependence (Spark sums partials in
# partition order, DuckDB in scan order — a last-ulp difference feeding
# round()+CAST flips alloc by 1 near a .5 boundary). So S_h is quantized
# to fixed point FIRST (x{Q176_SCALE}, bigint) and the denominator is an
# INTEGER sum — order-free on both engines; the allocation ratio then
# divides identical integers. The x1e4 quantum keeps nh*sh_fp within
# bigint at warehouse scale (1e10 docs x 1e7 fp-std ~ 1e17 < 2^63).
# --------------------------------------------------------------------------
Q176_BUDGET = 100
Q176_SCALE = 10_000


@register(
    "q176_neyman_allocation",
    oracle=f"""
    WITH m AS (
      SELECT source,
             count(*) AS nh,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY 1
    ),
    sd AS (
      SELECT source, nh,
             sqrt((s2 - s1 * 1.0 * s1 / nh) / nh) AS sh,
             CAST(round(sqrt((s2 - s1 * 1.0 * s1 / nh) / nh)
                        * {Q176_SCALE}) AS BIGINT) AS sh_fp
      FROM m
    ),
    tot AS (SELECT CAST(sum(nh * sh_fp) AS BIGINT) AS denom_fp FROM sd)
    SELECT sd.source,
           CAST(sd.nh AS BIGINT) AS n_h,
           round(sd.sh, 6) AS s_h,
           CAST(least(sd.nh * 1.0,
                      round({Q176_BUDGET} * (sd.nh * 1.0) * sd.sh_fp
                            / tot.denom_fp))
                AS BIGINT) AS alloc
    FROM sd CROSS JOIN tot
    """,
)
def q176_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.count("*").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    sh = F.sqrt(
        (F.col("s2") - F.col("s1") * F.lit(1.0) * F.col("s1") / F.col("nh"))
        / F.col("nh")
    )
    sd = m.select(
        "source",
        "nh",
        sh.alias("sh"),
        F.round(sh * Q176_SCALE).cast("bigint").alias("sh_fp"),
    )
    tot = sd.agg(
        F.sum(F.col("nh") * F.col("sh_fp")).cast("bigint").alias("denom_fp")
    )
    return sd.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("nh").cast("bigint").alias("n_h"),
        F.round("sh", 6).alias("s_h"),
        F.least(
            F.col("nh") * F.lit(1.0),
            F.round(
                F.lit(Q176_BUDGET)
                * (F.col("nh") * F.lit(1.0))
                * F.col("sh_fp")
                / F.col("denom_fp")
            ),
        )
        .cast("bigint")
        .alias("alloc"),
    )


# --------------------------------------------------------------------------
# q197 — cross-source duplication matrix: for every source pair, how
# many NEAR-duplicate document pairs (banded-LSH candidates +
# exact-Jaccard verify >= 0.5 — q24's recipe, the r5 default pair
# generator; candidate counts stay ~linear in corpus size) span them —
# the provenance / licensing audit that shows which feeds copy from
# which. The source labels ride along on doc_id joins.
# --------------------------------------------------------------------------
Q197_THRESHOLD = 0.5


def _q197_oracle() -> str:
    from .llm_ops import minhash_pair_ctes

    from ..operators.dedup import DEFAULT_BUCKET_CAP

    return f"""
    WITH {minhash_pair_ctes(Q197_THRESHOLD, max_bucket=DEFAULT_BUCKET_CAP)},
    lab AS (
        SELECT p.id_a AS ia, p.id_b AS ib, da.source AS sa, db.source AS sb
        FROM mh_pairs p
        JOIN documents da ON p.id_a = da.doc_id
        JOIN documents db ON p.id_b = db.doc_id
    )
    SELECT least(sa, sb) AS source_lo,
           greatest(sa, sb) AS source_hi,
           CAST(count(*) AS BIGINT) AS n_dup_pairs,
           CAST(least(sa, sb) = greatest(sa, sb) AS INT) AS within_source
    FROM lab GROUP BY 1, 2
    """


@register("q197_cross_source_dups", oracle=_q197_oracle())
def q197_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import family_pairs

    docs = load(spark, sf_dir, "documents")
    # session-shared capped 0.5 pair table (same generation as q172's
    # near arm; hygiene lives inside the family helper)
    near = family_pairs(spark, sf_dir, threshold=Q197_THRESHOLD).select(
        F.col("id_a").alias("ia"), F.col("id_b").alias("ib")
    )
    src = docs.select("doc_id", "source")
    lab = (
        near.join(
            src.select(F.col("doc_id").alias("ia"), F.col("source").alias("sa")),
            "ia",
        ).join(
            src.select(F.col("doc_id").alias("ib"), F.col("source").alias("sb")),
            "ib",
        )
    )
    out = (
        lab.groupBy(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
        )
        .agg(F.count("*").cast("bigint").alias("n_dup_pairs"))
        .select(
            "source_lo",
            "source_hi",
            "n_dup_pairs",
            (F.col("source_lo") == F.col("source_hi"))
            .cast("int")
            .alias("within_source"),
        )
    )
    return materialize(out)


# --------------------------------------------------------------------------
# q225 — duplicate-SPAN coverage per document (the ExactSubstr-dedup
# diagnostic of Lee et al., "Deduplicating Training Data Makes Language
# Models Better", ACL 2022: before cutting duplicated spans, measure how
# much of each document sits inside text shared with ANOTHER document).
# A token position is covered when at least one 5-token window containing
# it also occurs verbatim in a different doc. Distinct from q160
# (containment scores PAIRS by shingle-set overlap), q161 (novelty
# attributes each gram to its first arrival), and q111 (EXTRACTS the
# span intervals themselves, counting within-doc repeats too, gated on
# a minimum span length): this is the position-level per-doc ROLLUP —
# "what fraction of THIS doc's tokens would cross-doc span-dedup cut" —
# the number a curation policy thresholds on.
#
# Scale shape: gram stream with start positions is linear in tokens; the
# cross-doc test is one map-side-combinable min/max groupBy on the
# 60-bit gram hash (q111's 8-byte-key convention — no count(distinct));
# the interval union exploits fixed window length 5: sort a doc's dup
# window starts once and each start contributes min(5, next - start)
# tokens (gaps-and-islands via lead()), so coverage costs ONE shuffle at
# doc granularity instead of exploding every window into 5 position
# rows. No pair join anywhere — this stays linear when near-everything
# is duplicated, the regime where pair-emitting dedup floods.
# --------------------------------------------------------------------------
Q225_N = 5


def _q225_oracle() -> str:
    # parameterized on Q225_N like q111 (a window-length change must move
    # both engines together, not strand the oracle at 5 — r9 review)
    n = Q225_N
    gram = " || ' ' || ".join(["x"] + [f"w[i+{j}]" for j in range(1, n)])
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    nt AS (SELECT doc_id, len(w) AS n_tokens FROM toks),
    gs AS (SELECT doc_id, u.i - 1 AS pos,
                  CAST('0x' || substr(md5(u.g), 1, 15) AS BIGINT) AS gh
           FROM (SELECT doc_id,
                        unnest(list_filter(list_transform(w, (x, i) ->
                            CASE WHEN i <= len(w) - {n - 1}
                                 THEN struct_pack(i := i, g := {gram}) END),
                            s -> s IS NOT NULL)) AS u
                 FROM toks)),
    dup AS (SELECT gh FROM gs GROUP BY gh HAVING min(doc_id) <> max(doc_id)),
    hits AS (SELECT doc_id, pos FROM gs JOIN dup USING (gh)),
    cov AS (SELECT doc_id,
                   least({n}, coalesce(lead(pos) OVER (PARTITION BY doc_id
                                                       ORDER BY pos) - pos,
                                       {n})) AS c
            FROM hits),
    pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens
           FROM cov GROUP BY 1)
    SELECT nt.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(pd.dup_tokens, 0) * 1.0 / n_tokens, 6) AS dup_frac
    FROM nt LEFT JOIN pd USING (doc_id)
    """


@register("q225_dup_span_coverage", oracle=_q225_oracle())
def q225_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    n = Q225_N
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    n_tok = toks.select("doc_id", F.size("w").cast("bigint").alias("n_tokens"))
    w = F.col("w")
    starts = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(" ", F.slice(w, i + 1, n))  # noqa: E731
    # cache the positioned gram-hash stream: the dup-gram aggregate AND
    # the hits join both read it (q160's convention for this shape)
    gs = DD.cache_pinned(
        toks.select(
            "doc_id",
            F.posexplode(F.transform(starts, gram)).alias("pos", "g"),
        ).select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("gh"),
        )
    )
    dup = (
        gs.groupBy("gh")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("gh")
    )
    hits = gs.join(dup, "gh").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    cov = hits.select(
        "doc_id",
        F.least(
            F.lit(n), F.coalesce(F.lead("pos").over(wd) - F.col("pos"), F.lit(n))
        ).alias("c"),
    )
    pd = cov.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("dup_tokens"))
    out = (
        n_tok.join(pd, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias(
                "dup_tokens"
            ),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )
    result = materialize(out)
    DD.release_caches()
    return result
