"""Data-selection tier (q227-q231, plus the q234 pair-listing variant
and the q236 stratified k-fold split): the corpus-SELECTION methods a
large-scale training-data pipeline runs after dedup/quality filtering
decided what is *removable* — these decide what is *worth keeping*:

- q227 winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003, the
  MOSS local fingerprinting algorithm): per-document k-gram hashes,
  window-of-w minimum selection with the rightmost tie-break, then
  document-pair overlap ranked on shared fingerprints. The guarantee the
  rolling-hash tier (q31) cannot give: every match of length >= w+k-1
  is detected by at least one shared fingerprint, with a bounded
  fingerprint density per document.
- q228 DSIR importance resampling (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed unigram+bigram
  features, per-bucket smoothed log-ratio of target vs raw feature
  distributions, per-document importance weight, top-fraction selection.
- q229 semi-supervised label propagation (Zhu & Ghahramani 2002 /
  Raghavan et al. 2007 LPA): propagate sparse trusted labels over the
  mutual-kNN similarity graph (q168's edge set) for a fixed number of
  synchronous rounds with deterministic majority tie-breaks — the way a
  pipeline spreads scarce human quality labels across an embedded corpus.
- q230 k-center greedy coreset (Gonzalez 1985 farthest-point traversal;
  Sener & Savarese 2018 for coreset selection): iteratively pick the
  point farthest from the selected set — the diversity-maximising
  subset selection used for annotation budgets and eval-set carving.
- q231 CCNet perplexity buckets (Wenzek et al. 2020): score every
  document with a bigram LM trained ONLY on a trusted reference slice,
  then bucket per language into head/middle/tail terciles — the CCNet
  quality stratification (q119 scores with a corpus-self model and has
  no train/score split, no OOV mass, no bucketing).

Cross-engine determinism discipline (the repo's established rules):
- hashes are md5-derived integers (identical on Spark and DuckDB);
- anything RANKED is ranked on integers, md5 strings, or ROUNDED floats
  with an id tie-break;
- per-document accumulations that feed a ranking are exact BIGINT sums
  (q228 sums integer log-ratio micros; q230 sums ann_ivf.int_sq_dist
  integer-quantized distances);
- free-standing float outputs are rounded to 6 dp (q119/q131 precedent).

Scale shapes (100 TB discipline):
- q227: fingerprints come from per-doc window minima (partitioned by
  doc_id, bounded by document length); the pair join is capped by
  Q227_DF_CAP — fingerprints shared by more than that many documents
  are suppressed as boilerplate (the standard MOSS "too common" rule),
  so join fan-out per fingerprint is bounded. The DEFAULT output is the
  per-doc aggregate (doc-linear — VERDICT r9 #4: the pair LISTING was
  output-bound at 75M rows / 160 s at sf10 with organic dup mass);
  q234 keeps the full pair listing as the opt-in variant.
- q228: one token-stream shuffle per feature grain (map-side
  combinable); the bucket model is B=256 rows — broadcast. The
  top-fraction selection finds the exact k-th boundary row via an
  approx-quantile bracket + a window over only the O(e*n) band, then
  flags rows with a per-row literal comparison — no global single-task
  window, no join (round-9 ADVICE).
- q229: the edge build is q168's corpus-scaled LSH + verify; each LPA
  round is one groupBy on the vote key + one window argmax, rounds are
  a fixed constant (3).
- q230: each greedy round is one distributed max over N (the argmax is
  a 1-row limit, the only driver transfer is that single row per round);
  T rounds = T linear passes served from one cached projection.
- q231: two count tables (reference unigrams/bigrams) joined back on
  their keys — AQE broadcasts them while vocabulary is small,
  co-partitions at 100 TB vocabulary; the tercile rank partitions by
  lang on the ROUNDED score.

Reference parity note: the reference pipeline has no selection tier at
all (it extracts and labels every frame); these operators are part of
the beyond-the-reference LLM-pipeline surface the build brief demands,
same as plans/llm_ops.py and plans/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# --------------------------------------------------------------------------
# q227 — winnowing fingerprints + capped shared-fingerprint overlap.
#
# Gram hash = first 15 md5 hex chars as a 60-bit integer. The window
# minimum is taken over a SORTABLE STRING KEY lpad(hash,19) ||
# lpad(10**8-1 - gpos, 8): lexicographic min = smallest hash, ties to
# the RIGHTMOST gram (larger gpos -> smaller suffix), which is exactly
# the robust-winnowing tie rule. Both engines compare the same ASCII
# digits, so min() agrees bit-for-bit.
# --------------------------------------------------------------------------
Q227_K = 4  # tokens per gram
Q227_W = 5  # grams per window
Q227_DF_CAP = 50  # suppress fingerprints shared by more docs (boilerplate)


def _q227_ctes() -> str:
    """Shared oracle prefix: documents -> winnowed fingerprints ->
    DF-capped keep set + per-doc fingerprint counts. Used by both the
    default per-doc aggregate (q227) and the opt-in pair listing
    (q234)."""
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos,
                   len(w) AS nw
            FROM d),
    g AS (
      SELECT doc_id, pos AS gpos, nw - {Q227_K - 1} AS ng,
             t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
               || ' ' || lead(t, 3) OVER win AS gram
      FROM tok
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(t, {Q227_K - 1}) OVER win IS NOT NULL
    ),
    h AS (
      SELECT doc_id, gpos, ng,
             lpad(CAST(('0x' || substr(md5(gram), 1, 15))::BIGINT AS VARCHAR),
                  19, '0')
             || lpad(CAST(99999999 - gpos AS VARCHAR), 8, '0') AS k
      FROM g
    ),
    wmin AS (
      SELECT doc_id, gpos, ng,
             min(k) OVER (PARTITION BY doc_id ORDER BY gpos
                          ROWS BETWEEN CURRENT ROW
                          AND {Q227_W - 1} FOLLOWING) AS mk
      FROM h
    ),
    fps AS (
      SELECT DISTINCT doc_id, CAST(substr(mk, 1, 19) AS BIGINT) AS fp_h
      FROM wmin WHERE gpos <= greatest(ng - {Q227_W - 1}, 1)
    ),
    df AS (SELECT fp_h, count(*) AS nd FROM fps GROUP BY 1),
    keep AS (
      SELECT f.doc_id, f.fp_h FROM fps f JOIN df USING (fp_h)
      WHERE df.nd <= {Q227_DF_CAP}
    ),
    sizes AS (SELECT doc_id, count(*) AS nf FROM keep GROUP BY 1)"""


def _q227_oracle() -> str:
    """Per-doc overlap AGGREGATE (the scale-safe default, VERDICT r9
    #4): doc-linear output instead of the pair listing the same join
    would otherwise emit (75M rows at sf10). Partner ranking is on
    integers (shared_fps DESC, partner ASC); best_overlap is the chosen
    pair's rounded ratio, display-only."""
    return f"""{_q227_ctes()},
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_fps
      FROM keep a JOIN keep b ON a.fp_h = b.fp_h AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    pstat AS (
      SELECT pr.doc_a, pr.doc_b, pr.shared_fps,
             round(pr.shared_fps / least(sa.nf, sb.nf), 6) AS overlap,
             CAST(count(*) OVER (PARTITION BY pr.doc_a) AS BIGINT)
               AS n_partners,
             max(pr.shared_fps) OVER (PARTITION BY pr.doc_a) AS max_shared,
             row_number() OVER (PARTITION BY pr.doc_a
                                ORDER BY pr.shared_fps DESC, pr.doc_b) AS rn
      FROM pr
      JOIN sizes sa ON sa.doc_id = pr.doc_a
      JOIN sizes sb ON sb.doc_id = pr.doc_b
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_partners, 0) AS BIGINT) AS n_partners,
           p.max_shared AS max_shared,
           p.doc_b AS best_partner,
           p.overlap AS best_overlap
    FROM documents d
    LEFT JOIN (SELECT * FROM pstat WHERE rn = 1) p ON p.doc_a = d.doc_id
    """


def _q234_oracle() -> str:
    """The full pair LISTING — opt-in variant of q227 for consumers that
    need every overlapping pair (MOSS-style reports). Output-bound by
    the organic duplicate mass; q227's aggregate is the default."""
    return f"""{_q227_ctes()},
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_fps
      FROM keep a JOIN keep b ON a.fp_h = b.fp_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT pr.doc_a, pr.doc_b, pr.shared_fps,
           round(pr.shared_fps / least(sa.nf, sb.nf), 6) AS overlap
    FROM pr
    JOIN sizes sa ON sa.doc_id = pr.doc_a
    JOIN sizes sb ON sb.doc_id = pr.doc_b
    """


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_h) — the winnowed fingerprint set of each document.

    Selected fingerprint of window s = min over grams s..s+W-1 of the
    (hash ASC, gpos DESC) order; windows exist at every gram start up to
    ng-W+1 (one whole-doc window when the doc is shorter than W grams).
    All expressions are codegen'd built-ins; windows partition by doc_id
    only.
    """
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "t")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.col("t"),
        F.lead("t", 1).over(wdoc),
        F.lead("t", 2).over(wdoc),
        F.lead("t", 3).over(wdoc),
    )
    nw = F.count("*").over(Window.partitionBy("doc_id"))
    # gram and its completeness guard MUST be projected together, BEFORE
    # the filter: a window expression evaluated after the filter would see
    # the truncated partition and rebuild end-of-doc grams from too few
    # tokens (concat_ws silently skips the NULL leads)
    g = tok.select(
        "doc_id",
        F.col("pos").alias("gpos"),
        (nw - (Q227_K - 1)).alias("ng"),
        gram.alias("gram"),
        F.lead("t", Q227_K - 1).over(wdoc).alias("g4"),
    ).filter(F.col("g4").isNotNull())
    key = F.concat(
        F.lpad(
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint")
            .cast("string"),
            19,
            "0",
        ),
        F.lpad((F.lit(99999999) - F.col("gpos")).cast("string"), 8, "0"),
    )
    h = g.select("doc_id", "gpos", "ng", key.alias("k"))
    wwin = (
        Window.partitionBy("doc_id").orderBy("gpos").rowsBetween(0, Q227_W - 1)
    )
    wmin = h.select(
        "doc_id", "gpos", "ng", F.min("k").over(wwin).alias("mk")
    )
    return (
        wmin.filter(
            F.col("gpos") <= F.greatest(F.col("ng") - (Q227_W - 1), F.lit(1))
        )
        .select(
            "doc_id", F.substring("mk", 1, 19).cast("bigint").alias("fp_h")
        )
        .distinct()
    )


def _winnowed_keep(spark: SparkSession, sf_dir: str):
    """(docs, keep, sizes): winnowed fingerprints with the MOSS
    "too common" DF-cap applied, plus per-doc kept-fingerprint counts.
    Shared by q227 (per-doc aggregate) and q234 (pair listing)."""
    from .registry import materialize

    docs = load(spark, sf_dir, "documents")
    # fps feeds its own DF table AND the cap join; keep feeds the size
    # table and both pair-join sides — without the pins the tokenize +
    # md5 + double-window winnowing subtree re-executes once per
    # consumer (~8 corpus passes; round-9 review). Both frames are the
    # winnowed fingerprint set: ~2/(W+1) of the gram stream.
    fps = materialize(winnowing_fingerprints(docs))
    # document-frequency cap: fingerprints shared by more than DF_CAP
    # docs are boilerplate (the MOSS "too common" suppression) — this is
    # also the scale bound on the pair join's per-key fan-out
    df_tab = fps.groupBy("fp_h").agg(F.count("*").alias("nd"))
    keep = materialize(
        fps.join(df_tab, "fp_h").filter(F.col("nd") <= Q227_DF_CAP)
        .select("doc_id", "fp_h")
    )
    sizes = keep.groupBy("doc_id").agg(F.count("*").alias("nf"))
    return docs, keep, sizes


@register("q227_winnowing_fingerprints", oracle=_q227_oracle())
def q227_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc winnowing overlap AGGREGATE (scale-safe default, VERDICT
    r9 #4): n_partners / max_shared / best partner per document —
    doc-linear output, so the query stays report-sized even when the
    corpus is mostly duplicates (the pair LISTING of the same join is
    q234, opt-in: 75M rows at sf10). The pair stream still flows through
    the DF-capped fingerprint join, but every window below partitions by
    doc — no global ordering anywhere."""
    docs, keep, sizes = _winnowed_keep(spark, sf_dir)
    a = keep.select(F.col("doc_id").alias("doc_a"), "fp_h")
    b = keep.select(F.col("doc_id").alias("doc_b"), "fp_h")
    # ONE aggregation of the fp-join stream (a < b halves it), then a
    # narrow symmetrize + a map-side-combinable struct-max groupBy — no
    # window over the pair stream, and the per-doc fingerprint-size
    # joins happen at DOC grain (after the aggregate), never on the
    # corpus-scaled pair table. struct max on (shared, -partner) is
    # exactly the oracle's (shared DESC, partner ASC) rank-1 row.
    pr = (
        a.join(b, "fp_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("s"))
    )
    sym = pr.unionAll(
        pr.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "s",
        )
    )
    agg = sym.groupBy("doc_a").agg(
        F.count("*").alias("n_partners"),
        F.max("s").alias("max_shared"),
        F.max(
            F.struct(F.col("s").alias("s"), (-F.col("doc_b")).alias("nb"))
        ).alias("best"),
    ).select(
        "doc_a",
        "n_partners",
        "max_shared",
        (-F.col("best.nb")).alias("best_partner"),
        F.col("best.s").alias("best_s"),
    )
    best = (
        agg.join(sizes.select(F.col("doc_id").alias("doc_a"),
                              F.col("nf").alias("nfa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("best_partner"),
                           F.col("nf").alias("nfb")), "best_partner")
        .select(
            "doc_a", "n_partners", "max_shared", "best_partner",
            F.round(
                F.col("best_s") / F.least("nfa", "nfb"), 6
            ).alias("best_overlap"),
        )
    )
    return (
        docs.select("doc_id")
        .join(best, docs.doc_id == best.doc_a, "left")
        .select(
            "doc_id",
            F.coalesce("n_partners", F.lit(0)).cast("bigint")
            .alias("n_partners"),
            "max_shared",
            "best_partner",
            "best_overlap",
        )
    )


@register("q234_winnowing_overlap_pairs", oracle=_q234_oracle())
def q234_winnowing_overlap_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full overlap-pair LISTING (opt-in variant of q227): every doc
    pair sharing a kept fingerprint, with the shared count and the
    containment-style overlap ratio. Output-bound by the corpus's
    organic duplicate mass (75M rows at sf10) — run q227's per-doc
    aggregate unless the report genuinely needs each pair."""
    _docs, keep, sizes = _winnowed_keep(spark, sf_dir)
    a = keep.select(F.col("doc_id").alias("doc_a"), "fp_h")
    b = keep.select(F.col("doc_id").alias("doc_b"), "fp_h")
    pr = (
        a.join(b, "fp_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
    )
    return (
        pr.join(sizes.select(F.col("doc_id").alias("doc_a"),
                             F.col("nf").alias("nfa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("nf").alias("nfb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.round(
                F.col("shared_fps") / F.least("nfa", "nfb"), 6
            ).alias("overlap"),
        )
    )


# --------------------------------------------------------------------------
# q228 — DSIR importance resampling. Features are hashed unigrams +
# bigrams ('u <tok>' / 'b <w1> <w2>' -> md5 -> bucket mod B); the
# per-bucket log importance ratio
#     lr(b) = ln( (ct[b]+1) * (tot_raw + B) / ((cr[b]+1) * (tot_tgt + B)) )
# is one double ln() of an exactly-representable rational (integer
# products stay far below 2^53), then frozen to BIGINT micros, so the
# per-document weight sum is EXACT and the top-fraction rank cannot be
# perturbed by summation order. Target distribution = the 'en' slice
# (the "trusted target corpus" of the paper); raw = the whole corpus.
# --------------------------------------------------------------------------
Q228_BUCKETS = 256
Q228_TARGET_LANG = "en"
Q228_KEEP_FRAC = 0.25


def _q228_oracle() -> str:
    return f"""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    tok AS (SELECT doc_id, lang, unnest(w) AS t,
                   generate_subscripts(w, 1) AS pos
            FROM d),
    feats AS (
      SELECT doc_id, lang, 'u ' || t AS f FROM tok
      UNION ALL
      SELECT doc_id, lang, 'b ' || t || ' ' ||
             lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS f
      FROM tok
      QUALIFY lead(t) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    fb AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(f), 1, 8))::BIGINT % {Q228_BUCKETS} AS b
      FROM feats
    ),
    rawc AS (SELECT b, count(*) AS cr FROM fb GROUP BY 1),
    tgtc AS (SELECT b, count(*) AS ct FROM fb
             WHERE lang = '{Q228_TARGET_LANG}' GROUP BY 1),
    tots AS (
      SELECT count(*) AS tr,
             count(*) FILTER (lang = '{Q228_TARGET_LANG}') AS tt
      FROM fb
    ),
    lr AS (
      SELECT r.b,
             CAST(round(ln(
               (coalesce(t.ct, 0) + 1) * 1.0 * (tots.tr + {Q228_BUCKETS})
               / ((r.cr + 1) * 1.0 * (tots.tt + {Q228_BUCKETS}))
             ) * 1000000, 0) AS BIGINT) AS lrm
      FROM rawc r LEFT JOIN tgtc t USING (b) CROSS JOIN tots
    ),
    db AS (SELECT doc_id, b, count(*) AS n FROM fb GROUP BY 1, 2),
    wts AS (SELECT d.doc_id, sum(d.n * lr.lrm) AS wm
            FROM db d JOIN lr USING (b) GROUP BY 1),
    nsel AS (SELECT CAST(ceil(count(*) * {Q228_KEEP_FRAC}) AS BIGINT) AS k
             FROM documents),
    rk AS (SELECT doc_id, wm,
                  row_number() OVER (ORDER BY wm DESC, doc_id) AS rn
           FROM wts)
    SELECT rk.doc_id, round(rk.wm / 1000000.0, 6) AS weight,
           rk.rn <= nsel.k AS selected
    FROM rk CROSS JOIN nsel
    """


@register("q228_dsir_selection", oracle=_q228_oracle())
def q228_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.posexplode(F.split("text", " ")).alias("pos", "t")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    uni = tok.select("doc_id", "lang", F.concat_ws(" ", F.lit("u"), "t").alias("f"))
    big = (
        tok.withColumn("t2", F.lead("t").over(wdoc))
        .filter(F.col("t2").isNotNull())
        .select(
            "doc_id", "lang",
            F.concat_ws(" ", F.lit("b"), "t", "t2").alias("f"),
        )
    )
    fb = uni.unionAll(big).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("bigint")
            % Q228_BUCKETS
        ).alias("b"),
    )
    from .registry import materialize

    # ONE pass over the hashed feature stream: the (doc, lang, bucket)
    # count table is materialized and every downstream table — bucket
    # counts, grand totals, per-doc weights — derives from it by exact
    # integer aggregation (the same values the oracle computes from the
    # stream). Without the pin fb's explode+md5 ran once per consumer
    # (round-9 review).
    db2 = materialize(
        fb.groupBy("doc_id", "lang", "b").agg(F.count("*").alias("n"))
    )
    tgt_n = F.when(F.col("lang") == Q228_TARGET_LANG, F.col("n")).otherwise(0)
    cnts = db2.groupBy("b").agg(
        F.sum("n").alias("cr"), F.sum(tgt_n).alias("ct")
    )
    tots = cnts.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    lr = cnts.crossJoin(F.broadcast(tots)).select(
        "b",
        F.round(
            F.log(
                (F.col("ct") + 1)
                * (F.col("tr") + Q228_BUCKETS).cast("double")
                / (
                    (F.col("cr") + 1)
                    * (F.col("tt") + Q228_BUCKETS).cast("double")
                )
            )
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("lrm"),
    )
    db = db2.select("doc_id", "b", "n")
    # the model is B=256 rows — broadcast onto the per-doc bucket counts
    wts = materialize(
        db.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("lrm")).alias("wm"))
    )
    # Top-fraction selection WITHOUT a global single-task window (round-9
    # ADVICE): k is corpus-scaled (25% of docs), so a
    # row_number().over(Window.orderBy(...)) would funnel the whole
    # weight frame through one task. Instead find the exact k-th
    # (wm DESC, doc_id ASC) boundary row via an approx-quantile bracket:
    #   1. approxQuantile gives [p_lo, p_hi] whose ranks provably
    #      bracket the k-th largest wm (rank error <= e*n per side, and
    #      we ask 3e beyond the target quantile on each side);
    #   2. n_above = exact count of wm > p_hi (all selected);
    #   3. the boundary row is rank (k - n_above) inside the band
    #      [p_lo, p_hi] — a window over only O(e*n) ~ thousands of rows;
    #   4. selected = (wm, doc_id) lexicographically >= boundary —
    #      a pure per-row comparison against two broadcast literals, no
    #      join, no global sort.
    # The selection set is bit-identical to the oracle's global
    # row_number ranking (same wm DESC, doc_id ASC tie-break).
    import math

    # k is derived from the DOCUMENT count, not the weight-row count
    # (round-10 ADVICE): the oracle's nsel is ceil(count(*) FROM
    # documents * frac), and a document with no features (NULL/empty
    # text) is absent from wts — counting wts would shift the whole
    # selection boundary on such corpora. m (the wts row count) still
    # drives the quantile-bracket math, which ranks within wts only.
    n_docs = docs.count()
    k = int(math.ceil(n_docs * Q228_KEEP_FRAC))
    m = wts.count()
    selected = F.lit(False)
    if m > 0 and k >= m:
        # fewer weighted docs than the selection budget: every weighted
        # doc is selected (the oracle's rn <= k is vacuously true)
        selected = F.lit(True)
    elif m > 0 and k > 0:
        e = max(1e-4, min(0.01, 2000.0 / m))
        q = (m - k) / m
        p_lo, p_hi = wts.stat.approxQuantile(
            "wm", [max(0.0, q - 3.0 * e), min(1.0, q + 3.0 * e)], e
        )
        n_above = wts.filter(F.col("wm") > p_hi).count()
        boundary = None
        if n_above == k:
            # the k-th row is the smallest of the strictly-above set
            selected, boundary = F.col("wm") > F.lit(p_hi), ()
        elif n_above < k:
            band = wts.filter(
                (F.col("wm") >= p_lo) & (F.col("wm") <= p_hi)
            )
            wb = Window.orderBy(F.desc("wm"), F.asc("doc_id"))
            bf = (
                band.withColumn("rn_b", F.row_number().over(wb))
                .filter(F.col("rn_b") == k - n_above)
                .select("wm", "doc_id")
            )
            from .registry import audit_round

            audit_round("q228:boundary_probe", bf)
            brow = bf.collect()
            if brow:
                bw, bd = brow[0]["wm"], brow[0]["doc_id"]
                selected = (F.col("wm") > F.lit(bw)) | (
                    (F.col("wm") == F.lit(bw)) & (F.col("doc_id") <= F.lit(bd))
                )
                boundary = (bw, bd)
        if boundary is None:
            # approx-quantile bracket failed to cover rank k (outside the
            # GK guarantee — defensive only): fall back to the exact
            # global ranking
            rk = wts.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(F.desc("wm"), F.asc("doc_id"))
                ),
            )
            selected = F.col("rn") <= F.lit(k)
            wts = rk
    return wts.select(
        "doc_id",
        F.round(F.col("wm") / 1000000.0, 6).alias("weight"),
        selected.alias("selected"),
    )


# --------------------------------------------------------------------------
# q229 — semi-supervised label propagation over the mutual-kNN graph.
#
# Seeds: every vec_id % 5 == 0 keeps its trusted `label`. Three
# synchronous rounds: a node's next label is the majority label among
# its labeled neighbors (count DESC, label ASC tie-break); seeds are
# clamped; a node with no labeled neighbor keeps its previous label
# (NULL until reached). The graph is q168's mutual-kNN edge set, so the
# construction (and its corpus-scaled LSH blocking) exists once.
# --------------------------------------------------------------------------
Q229_SEED_MOD = 5
Q229_ROUNDS = 3


def _q229_oracle() -> str:
    from .graph_metrics import _mutual_knn_edges_sql

    rounds = []
    prev = "l0"
    for r in range(1, Q229_ROUNDS + 1):
        rounds.append(f"""
    v{r} AS (
      SELECT a.u AS node, l.label, count(*) AS c
      FROM adj a JOIN {prev} l ON l.node = a.v
      WHERE l.label IS NOT NULL GROUP BY 1, 2
    ),
    w{r} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM v{r}) WHERE rn = 1
    ),
    l{r} AS MATERIALIZED (
      SELECT n.node, coalesce(s.label, w.label, p.label) AS label
      FROM nodes n
      LEFT JOIN seeds s USING (node)
      LEFT JOIN w{r} w USING (node)
      LEFT JOIN {prev} p USING (node)
    )""")
        prev = f"l{r}"
    return f"""
    WITH {_mutual_knn_edges_sql()},
    nodes AS (SELECT vec_id AS node FROM embeddings),
    seeds AS (SELECT vec_id AS node, label FROM embeddings
              WHERE vec_id % {Q229_SEED_MOD} = 0),
    adj AS MATERIALIZED (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    l0 AS MATERIALIZED (
      SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s USING (node)),
    {",".join(rounds)}
    SELECT n.node AS vec_id, s.node IS NOT NULL AS seeded,
           f.label AS final_label
    FROM nodes n
    LEFT JOIN seeds s USING (node)
    JOIN {prev} f USING (node)
    """


@register("q229_label_propagation", oracle=_q229_oracle())
def q229_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph_metrics import family_edges

    base = load(spark, sf_dir, "embeddings")
    edges = family_edges(spark, sf_dir)
    nodes = base.select(F.col("vec_id").alias("node"))
    seeds = (
        base.filter(F.col("vec_id") % Q229_SEED_MOD == 0)
        .select(F.col("vec_id").alias("node"), "label")
    )
    adj = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # edges is already an eager localCheckpoint; adj is two projections of
    # it, so the three rounds below never recompute the LSH verify
    from .registry import materialize

    lab = materialize(nodes.join(seeds, "node", "left"))  # round 0
    wv = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(Q229_ROUNDS):
        votes = (
            adj.join(
                lab.filter(F.col("label").isNotNull())
                .select(F.col("node").alias("v"), "label"),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("wlab"))
        )
        # per-round materialization: each round's label table is N bounded
        # rows; without the barrier the round-k plan re-joins every prior
        # round's lineage (the iterative-operator checkpoint discipline of
        # operators/components.py)
        lab = materialize(
            nodes.join(seeds.select("node", F.col("label").alias("slab")),
                       "node", "left")
            .join(winner, "node", "left")
            .join(lab.select("node", F.col("label").alias("plab")),
                  "node", "left")
            .select(
                "node",
                F.coalesce("slab", "wlab", "plab").alias("label"),
            )
        )
    return (
        nodes.join(seeds.select("node", F.lit(True).alias("seeded")),
                   "node", "left")
        .join(lab, "node")
        .select(
            F.col("node").alias("vec_id"),
            F.coalesce("seeded", F.lit(False)).alias("seeded"),
            F.col("label").alias("final_label"),
        )
    )


# --------------------------------------------------------------------------
# q230 — k-center greedy coreset (farthest-point traversal). The first
# center is the md5-smallest vec_id (the repo's seedless init, same as
# deterministic_lloyd); each later center is the point with the LARGEST
# integer-quantized distance to its nearest selected center (vec_id ASC
# tie-break). Distances are ann_ivf.int_sq_dist bigints, so the argmax
# agrees bit-for-bit on both engines; zero-distance duplicates of a
# selected center are excluded from candidacy (dmin > 0) on both sides.
# --------------------------------------------------------------------------
Q230_T = 8


def _q230_oracle() -> str:
    from .analytics import lloyd_dist_sql

    parts = [
        """
    WITH ex AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c1 AS (SELECT vec_id, e FROM ex
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
    d1 AS (SELECT x.vec_id, x.e, {d} AS dmin
           FROM ex x CROSS JOIN c1 c)""".format(d=lloyd_dist_sql("x.e", "c.e"))
    ]
    for t in range(2, Q230_T + 1):
        parts.append(f"""
    c{t} AS (SELECT vec_id, e, dmin FROM d{t - 1}
             WHERE dmin > 0 ORDER BY dmin DESC, vec_id LIMIT 1)""")
        if t < Q230_T:
            parts.append(
                """
    d{t} AS (SELECT x.vec_id, x.e, least(x.dmin, {d}) AS dmin
             FROM d{p} x CROSS JOIN c{t} c)""".format(
                    t=t, p=t - 1, d=lloyd_dist_sql("x.e", "c.e")
                )
            )
    sel = ["SELECT 1 AS sel_order, vec_id, CAST(NULL AS BIGINT) AS dist_q FROM c1"]
    sel += [
        f"SELECT {t} AS sel_order, vec_id, dmin AS dist_q FROM c{t}"
        for t in range(2, Q230_T + 1)
    ]
    return ",".join(parts) + "\n" + "\nUNION ALL ".join(sel)


@register("q230_kcenter_coreset", oracle=_q230_oracle())
def q230_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_ivf import _assert_quant_domain, int_sq_dist

    from .registry import materialize

    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _assert_quant_domain(base, "embedding")
    ex = base.repartition(base.sparkSession.sparkContext.defaultParallelism)
    from .registry import audit_round

    init = ex.orderBy(
        F.md5(F.col("vec_id").cast("string")), F.asc("vec_id")
    ).limit(1)
    audit_round("q230:init_pick", init)
    first = init.collect()[0]  # 1 row — the only driver transfer per round
    selected = [(1, int(first["vec_id"]), None)]

    def lit_vec(c: list) -> F.Column:
        return F.array(*[F.lit(float(x)) for x in c])

    # cur carries the RUNNING min distance as a materialized column, so
    # round t evaluates exactly ONE new literal-centroid distance
    # (least(dmin, dist(new))) instead of re-codegening all t-1 — the
    # q184 lesson: literal-array codegen compile cost per pass grows
    # with the number of embedded centroids (measured here: 95.8 s ->
    # ~16 s for T=8 at sf10). Each barrier stores N bounded rows.
    cur = materialize(
        ex.withColumn(
            "dmin", int_sq_dist(F.col("embedding"), lit_vec(list(first["embedding"])))
        )
    )
    for t in range(2, Q230_T + 1):
        cand = (
            cur.filter(F.col("dmin") > 0)
            .orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
        )
        # per-round argmax plan for the audit — the materialize barriers
        # hide it from the registry-level explain (VERDICT r9)
        audit_round("q230:round_argmax", cand)
        rows = cand.collect()
        if not rows:
            # fewer than T distinct points: the oracle's c{t} CTE is
            # empty from here on and contributes no UNION rows —
            # stop with the same shorter selection
            break
        nxt = rows[0]
        selected.append((t, int(nxt["vec_id"]), int(nxt["dmin"])))
        if t < Q230_T:
            cur = materialize(
                cur.withColumn(
                    "dmin",
                    F.least(
                        F.col("dmin"),
                        int_sq_dist(
                            F.col("embedding"), lit_vec(list(nxt["embedding"]))
                        ),
                    ),
                )
            )
    return base.sparkSession.createDataFrame(
        selected, "sel_order INT, vec_id BIGINT, dist_q BIGINT"
    )


# --------------------------------------------------------------------------
# q231 — CCNet perplexity buckets: interpolated bigram LM trained on the
# TRUSTED REFERENCE SLICE only (sources src0-src4 — the pipeline's
# "wikipedia" stand-in), per-language; every document scored under its
# language's reference model with additive-smoothed unigram backoff (so
# out-of-reference tokens get finite log-probability); per-language
# head/middle/tail terciles on the rank of the ROUNDED score.
# --------------------------------------------------------------------------
Q231_LAMBDA = 0.7
Q231_REF_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def _q231_oracle() -> str:
    refs = ", ".join(f"'{s}'" for s in Q231_REF_SOURCES)
    lam = Q231_LAMBDA
    return f"""
    WITH d AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w
               FROM documents),
    tok AS (SELECT doc_id, lang, source, unnest(w) AS t,
                   generate_subscripts(w, 1) AS pos
            FROM d),
    bgf AS (
      SELECT doc_id, lang, source, t AS w1,
             lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
      QUALIFY lead(t) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    runi AS (SELECT lang, t AS w, count(*) AS cu FROM tok
             WHERE source IN ({refs}) GROUP BY 1, 2),
    rtot AS (SELECT lang, count(*) AS nt, count(DISTINCT t) AS v FROM tok
             WHERE source IN ({refs}) GROUP BY 1),
    rbig AS (SELECT lang, w1, w2, count(*) AS cb FROM bgf
             WHERE source IN ({refs}) GROUP BY 1, 2, 3),
    sc AS (
      SELECT b.doc_id, b.lang,
             ln(CAST({lam} AS DOUBLE) * coalesce(rb.cb * 1.0 / u1.cu, 0)
                + CAST({1.0 - lam} AS DOUBLE) * (coalesce(u2.cu, 0) + 1)
                  / (coalesce(rt.nt, 0) + coalesce(rt.v, 0) + 1)) AS lp
      FROM bgf b
      LEFT JOIN rbig rb ON rb.lang = b.lang AND rb.w1 = b.w1 AND rb.w2 = b.w2
      LEFT JOIN runi u1 ON u1.lang = b.lang AND u1.w = b.w1
      LEFT JOIN runi u2 ON u2.lang = b.lang AND u2.w = b.w2
      LEFT JOIN rtot rt ON rt.lang = b.lang
    ),
    ds AS (
      SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(lp), 6) AS avg_logprob
      FROM sc GROUP BY 1, 2
    ),
    rk AS (
      SELECT doc_id, lang, n_bigrams, avg_logprob,
             row_number() OVER (PARTITION BY lang
                                ORDER BY avg_logprob DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM ds
    )
    SELECT doc_id, lang, n_bigrams, avg_logprob,
           CASE WHEN rn * 3 <= n THEN 'head'
                WHEN rn * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM rk
    """


@register("q231_ppl_buckets", oracle=_q231_oracle())
def q231_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", "source",
        F.posexplode(F.split("text", " ")).alias("pos", "t"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    bgf = (
        tok.withColumn("w2", F.lead("t").over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "lang", "source", F.col("t").alias("w1"), "w2")
    )
    from .registry import materialize

    ref = F.col("source").isin(*Q231_REF_SOURCES)
    # the unigram model feeds THREE consumers (both scoring legs + the
    # totals) — materialize it so the reference token scan runs once;
    # totals derive from the model table by exact integer aggregation
    # (sum of counts = token count, row count = distinct tokens), the
    # same values the oracle computes from the stream
    runi = materialize(
        tok.filter(ref)
        .groupBy("lang", F.col("t").alias("w"))
        .agg(F.count("*").alias("cu"))
    )
    rtot = runi.groupBy("lang").agg(
        F.sum("cu").alias("nt"), F.count("*").alias("v")
    )
    # bgf feeds the reference bigram counts AND the scoring stream —
    # materialize so the doc scan + lead() window run once per query
    bgf = materialize(bgf)
    rbig = (
        bgf.filter(ref)
        .groupBy("lang", "w1", "w2")
        .agg(F.count("*").alias("cb"))
    )
    lp = F.log(
        F.lit(Q231_LAMBDA)
        * F.coalesce(F.col("cb") * 1.0 / F.col("cu1"), F.lit(0.0))
        + F.lit(1.0 - Q231_LAMBDA)
        * (F.coalesce(F.col("cu2"), F.lit(0)) + 1)
        / (
            F.coalesce(F.col("nt"), F.lit(0))
            + F.coalesce(F.col("v"), F.lit(0))
            + 1
        )
    )
    # Float adjudication (round-9 review, MEASURED): the oracle casts
    # both interpolation literals to DOUBLE explicitly — DuckDB
    # otherwise evaluates them in decimal and ~15% of per-term lp values
    # drift by 1 ulp. Per-term INTEGER freezing (round(lp*1e6) micros)
    # was tried and is strictly WORSE here: libm vs JVM ln() disagree by
    # enough that one term in the 272k at sf0.1 flipped across a .5e-6
    # boundary (hash-gate failure), while the 6-dp ROUNDED AVERAGE
    # tolerates per-term noise up to ~5e-7 against summation-order
    # error of ~1e-15. The tercile rank consumes the rounded average
    # with a doc_id tie-break, so it inherits that stability.
    sc = (
        bgf.join(rbig, ["lang", "w1", "w2"], "left")
        .join(
            runi.select("lang", F.col("w").alias("w1"),
                        F.col("cu").alias("cu1")),
            ["lang", "w1"],
            "left",
        )
        .join(
            runi.select("lang", F.col("w").alias("w2"),
                        F.col("cu").alias("cu2")),
            ["lang", "w2"],
            "left",
        )
        .join(rtot, "lang", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )
    wrk = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    wn = Window.partitionBy("lang")
    rk = sc.withColumn("rn", F.row_number().over(wrk)).withColumn(
        "n", F.count("*").over(wn)
    )
    return rk.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "avg_logprob",
        F.when(F.col("rn") * 3 <= F.col("n"), "head")
        .when(F.col("rn") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# --------------------------------------------------------------------------
# q236 — stratified k-fold assignment (the split a training pipeline
# actually wants for cross-validation over a curated corpus): within
# each stratum (language), documents are ordered by their md5 hash (the
# repo's seedless deterministic shuffle, same as q36/q230's init) and
# dealt round-robin into K folds — every fold gets within-1-of-equal
# mass of EVERY stratum, unlike a plain hash-mod split whose per-stratum
# fold sizes are binomial. Output is doc-linear: (doc_id, lang, fold).
#
# Determinism: the order key is (md5(doc_id), doc_id) — no floats, no
# rand(); fold = (rank - 1) % K. Scale shape: ONE window partitioned by
# stratum (never global; a stratum's rows sort within its partition
# group), no joins, no driver state.
# --------------------------------------------------------------------------
Q236_K = 5


def _q236_oracle() -> str:
    return f"""
    SELECT doc_id, lang,
           CAST((row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                             doc_id) - 1)
                % {Q236_K} AS BIGINT) AS fold
    FROM documents
    """


@register("q236_stratified_kfold", oracle=_q236_oracle())
def q236_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return docs.select(
        "doc_id",
        "lang",
        ((F.row_number().over(w) - 1) % Q236_K).cast("bigint").alias("fold"),
    )
