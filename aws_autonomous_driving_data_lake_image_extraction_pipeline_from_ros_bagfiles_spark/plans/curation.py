"""Corpus-curation extensions (q109-q111): semantic dedup, model-based
quality filtering, and duplicated-substring span detection.

These are the three curation stages of a modern LLM data pipeline that the
earlier tiers (exact/MinHash/SimHash dedup, heuristic quality stats) do not
cover:

- q109 SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
  embedding space coarsely, then inside each cluster drop every vector
  that has a near-duplicate (cosine >= tau) closer to the cluster
  centroid — keeping the most "diverse" member of each semantic
  duplicate group.
- q110 model-based quality filter (fastText-style): a linear classifier
  over hashed bag-of-token features, scored entirely with built-in
  column expressions — the shape of CCNet / DCLM quality scoring, with
  deterministic weights so the oracle can replay it.
- q111 duplicated-substring spans (Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better"): find maximal word spans
  whose every k-gram occurs more than once in the corpus — the
  substring-level dedup the document-level tiers cannot see.

Scale notes (100 TB discipline shared by all three):
- No all-pairs joins: q109's quadratic verify is confined to coarse
  cluster blocks (exactly q42's blocking argument); q111 never pairs
  documents at all — duplicated k-grams are found by a map-side-combined
  groupBy on a 60-bit gram hash, so the shuffle carries one row per
  distinct gram, never the corpus body.
- Python never touches the hot path: md5 / integer arithmetic / folds /
  windows are all JVM column expressions.
- The only window functions partition by doc_id (bounded by document
  length), never globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import dot, norm
from ..operators.text import ngrams_all_from_tokens
from ..tables import load
from .registry import register

# --------------------------------------------------------------------------
# q109 — SemDeDup: cluster-then-prune semantic deduplication.
#
# Coarse cluster = a CORPUS-SCALED hyperplane-LSH cell (default since r5;
# operators/lsh_blocking.py): cell count ∝ N / TARGET_BLOCK, so per-cell
# pair counts stay linear in corpus size — the SemDeDup "k ∝ N" regime
# (Abbas et al. 2023 §3) in a deterministic, oracle-replayable form. The
# trained-quantizer sibling (actual k-means cells, rows-only) is q184.
# Within a cluster:
#   1. centroid c = element-wise mean of member embeddings,
#   2. every vector gets r = round(cos(v, c), 6),
#   3. v is DROPPED iff some cluster-mate u has cos(u, v) >= TAU and u is
#      strictly closer to "keep" by the (r ASC, vec_id ASC) order — i.e.
#      of each semantic-duplicate group the member with the LOWEST
#      centroid similarity survives (SemDeDup keeps edge points, pruning
#      redundant cluster-core vectors).
#
# Determinism: the keep order compares ROUNDED centroid cosines (6 dp)
# with vec_id tie-break, so engine-level float summation-order noise
# (~1e-15) cannot flip the ordering on either side.
# --------------------------------------------------------------------------
Q109_TAU = 0.3


def _centroids(emb: DataFrame, key_col: str = "cell") -> DataFrame:
    """(key, c: array<double>) — element-wise mean embedding per cluster.

    posexplode -> two-level agg: the (key, pos) partial means are
    map-side combinable, so the shuffle carries B x d rows total — O(1)
    in corpus size. The final array rebuild sorts by position via
    array_sort over (pos, m) structs.
    """
    ex = emb.select(key_col, F.posexplode("embedding").alias("pos", "x"))
    return (
        ex.groupBy(key_col, "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy(key_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )


def _q109_oracle() -> str:
    from ..operators import lsh_blocking as L

    return f"""
    WITH {L.nbits_param_sql("embeddings")},
    {L.cell_keys_sql("embeddings")},
    ex AS (
      SELECT lc.cell, e.vec_id, e.embedding::DOUBLE[] AS e
      FROM embeddings e JOIN lsh_cells lc USING (vec_id)
    ),
    exu AS (
      SELECT cell, vec_id,
             unnest(list_transform(e, (x, i) -> struct_pack(x := x, i := i))) AS u
      FROM ex
    ),
    dims AS (SELECT cell, u.i AS i, avg(u.x) AS m FROM exu GROUP BY 1, 2),
    cent AS (SELECT cell, list(m ORDER BY i) AS c FROM dims GROUP BY 1),
    cc AS (
      SELECT v.cell, v.vec_id,
             round(list_sum(list_transform(v.e, (x, i) -> x * c[i]))
                   / (sqrt(list_sum(list_transform(v.e, x -> x * x)))
                      * sqrt(list_sum(list_transform(c, x -> x * x)))), 6) AS r
      FROM ex v JOIN cent USING (cell)
    ),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM ex a JOIN ex b ON a.cell = b.cell AND a.vec_id <> b.vec_id
      WHERE list_sum(list_transform(a.e, (x, i) -> x * b.e[i]))
            / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
               * sqrt(list_sum(list_transform(b.e, x -> x * x)))) >= {Q109_TAU}
    ),
    dropped AS (
      SELECT DISTINCT p.ib AS vec_id
      FROM pairs p
      JOIN cc ca ON ca.vec_id = p.ia
      JOIN cc cb ON cb.vec_id = p.ib
      WHERE ca.r < cb.r OR (ca.r = cb.r AND p.ia < p.ib)
    )
    SELECT cc.vec_id, cc.cell, cc.r AS centroid_cos
    FROM cc LEFT JOIN dropped d ON cc.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    """


@register("q109_semantic_dedup", oracle=_q109_oracle())
def q109_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lsh_blocking as L

    raw = load(spark, sf_dir, "embeddings")
    # width from the raw scan's footer count (counting the repartitioned
    # frame would force a full pass + shuffle first)
    nbits = L.n_block_bits(raw.count())
    emb = raw.repartition(spark.sparkContext.defaultParallelism)
    # one cell per vector, cell count ∝ N (the SemDeDup k ∝ N regime);
    # the cell is a pure function of the vector, so it is a zero-shuffle
    # PROJECTION on the frame — never a join back onto itself
    emb = emb.select(
        L.cell_key_col("embedding", nbits).alias("cell"),
        "vec_id",
        "embedding",
    )
    # centroid table is ~N/TARGET_BLOCK rows of d doubles — broadcast,
    # never shuffled in
    cent = _centroids(emb)
    cc = emb.join(F.broadcast(cent), "cell").select(
        "cell",
        "vec_id",
        "embedding",
        F.round(
            dot(F.col("embedding"), F.col("c"))
            / (norm(F.col("embedding")) * norm(F.col("c"))),
            6,
        ).alias("r"),
    )
    normed = cc.select(
        "vec_id", "cell", "embedding", "r", norm(F.col("embedding")).alias("nm")
    )
    a = normed.select(
        F.col("vec_id").alias("ia"), "cell", F.col("embedding").alias("ea"),
        F.col("r").alias("ra"), F.col("nm").alias("na"),
    )
    b = normed.select(
        F.col("vec_id").alias("ib"), "cell", F.col("embedding").alias("eb"),
        F.col("r").alias("rb"), F.col("nm").alias("nb"),
    )
    # quadratic verify confined to bounded-size cells (linear in N by the
    # n_block_bits contract); norms are computed ONCE per vector before
    # the pair join (q42's discipline — the fold produces the same doubles
    # either way, so the oracle's inline form still matches exactly)
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("ia") != F.col("ib"))
        .filter(sim >= Q109_TAU)
        .filter(
            (F.col("ra") < F.col("rb"))
            | ((F.col("ra") == F.col("rb")) & (F.col("ia") < F.col("ib")))
        )
        .select(F.col("ib").alias("vec_id"))
        .distinct()
    )
    return cc.join(dropped, "vec_id", "left_anti").select(
        "vec_id", "cell", F.col("r").alias("centroid_cos")
    )


# --------------------------------------------------------------------------
# q110 — model-based quality filter: linear classifier over hashed
# bag-of-token features (the fastText / CCNet / DCLM quality-scoring
# shape). Feature j = md5(token) bucketed mod K; deterministic weight
# w(j) = ((j*37 + 11) mod 201 - 100) / 100 stands in for trained
# parameters — the MECHANISM (hash -> embed -> mean -> linear -> sigmoid)
# is the real thing, the weights are a fixture.
#
# Float discipline: the per-doc weight sum is accumulated as an exact
# BIGINT (weights x100), so score = sigmoid(sum / (5.0 * n) + 0.1) is one
# double division from identical integer operands on both engines —
# summation order cannot perturb it. The keep decision compares the exact
# pre-sigmoid logit, not the rounded probability.
#
# Scale shape: explode -> groupBy(doc_id) with map-side partial agg — the
# shuffle carries one partial row per doc per partition, never the token
# stream. All expressions are codegen'd built-ins (md5, conv, pmod).
# --------------------------------------------------------------------------
Q110_BUCKETS = 64
Q110_GAIN = 20.0  # logit gain: mean hashed weight in [-1,1] -> z in [-20,20]
Q110_BIAS = 0.1


def _wt_int(tok: Column) -> Column:
    """Integer weight x100 in [-100, 100] for a token's hash bucket."""
    k = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % Q110_BUCKETS
    return (k * 37 + 11) % 201 - 100


def _q110_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    w AS (
      SELECT doc_id,
             ((('0x' || substr(md5(t), 1, 8))::BIGINT % {Q110_BUCKETS}) * 37 + 11)
               % 201 - 100 AS wi
      FROM toks
    ),
    s AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(wi) / (5.0 * count(*)) AS z
      FROM w GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-(z + {Q110_BIAS}))), 6) AS score,
           z + {Q110_BIAS} >= 0 AS kept
    FROM s
    """


@register("q110_quality_classifier", oracle=_q110_oracle())
def q110_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).select("doc_id", _wt_int(F.col("t")).alias("wi"))
    s = w.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("wi").alias("sw")
    )
    # z = GAIN * mean(w) = GAIN * (sw/100)/n = sw / (5.0 * n): one division
    # from exact integers — bit-identical across engines
    z = F.col("sw") / (F.lit(5.0) * F.col("n_tokens"))
    logit = z + F.lit(Q110_BIAS)
    return s.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (logit >= 0).alias("kept"),
    )


# --------------------------------------------------------------------------
# q111 — duplicated-substring span detection (substring-level exact dedup).
# A word position is "duplicated" when the K-gram starting there occurs
# >= 2 times across the whole corpus (counting within-doc repeats — the
# same contract as suffix-array substring dedup). Overlapping duplicated
# K-gram windows merge into maximal spans (gaps-and-islands: positions
# within K-1 of each other share an island); spans shorter than
# MIN_SPAN_WORDS words are noise and dropped.
#
# Scale shape: documents are never pair-joined. Occurrence counting
# groups on a 60-bit md5 gram hash (map-side combinable; the shuffle is
# one row per distinct gram) and the join back to positions is linear in
# corpus gram count. The islands window partitions by doc_id only. The
# 60-bit hash admits ~2^-60-rate false merges at corpus scale — the
# standard fingerprint trade, harmless for span detection (the oracle
# groups raw gram text; equality at test scale certifies the hash is
# collision-free there).
# --------------------------------------------------------------------------
Q111_K = 5
Q111_MIN_SPAN_WORDS = 8


def _q111_oracle() -> str:
    k = Q111_K
    gram = " || ' ' || ".join(["x"] + [f"w[i+{j}]" for j in range(1, k)])
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_filter(list_transform(w, (x, i) ->
               CASE WHEN i <= len(w) - {k - 1}
                    THEN struct_pack(pos := i, g := {gram}) END),
               s -> s IS NOT NULL)) AS u
      FROM toks
    ),
    occ AS (SELECT doc_id, u.pos AS pos, u.g AS gram FROM g),
    f AS (SELECT gram, count(*) AS c FROM occ GROUP BY 1),
    dup AS (SELECT o.doc_id, o.pos FROM occ o JOIN f USING (gram) WHERE f.c >= 2),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  <= {k - 1} THEN 0 ELSE 1 END AS brk
      FROM dup
    ),
    grp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS isl_id
      FROM isl
    ),
    sp AS (
      SELECT doc_id, isl_id, min(pos) AS span_start,
             max(pos) + {k - 1} AS span_end
      FROM grp GROUP BY 1, 2
    )
    SELECT doc_id, span_start, span_end,
           span_end - span_start + 1 AS span_words
    FROM sp
    WHERE span_end - span_start + 1 >= {Q111_MIN_SPAN_WORDS}
    """


@register("q111_dup_substring_spans", oracle=_q111_oracle())
def q111_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = Q111_K
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # (doc_id, pos 1-based, gh): ngrams_all emits grams in position order,
    # so posexplode's index IS the 0-based start position; the gram text
    # is collapsed to a 60-bit int before any shuffle
    occ = docs.select(
        "doc_id", F.split("text", " ").alias("__toks")
    ).select(
        "doc_id",
        F.posexplode(ngrams_all_from_tokens(F.col("__toks"), k)).alias(
            "p0", "gram"
        ),
    ).select(
        "doc_id",
        (F.col("p0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint").alias("gh"),
    )
    # duplicated positions via a count window on gh — ONE shuffle and one
    # gram-build pass; the groupBy+join-back alternative recomputes the
    # gram subtree for both join sides and shuffles it twice (measured
    # 17.2s -> 2.9s for this stage at sf0.1). Partitions are per-gram:
    # even a gram repeated millions of times is a count-only window.
    wgh = Window.partitionBy("gh")
    dup = (
        occ.withColumn("c", F.count("*").over(wgh))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(wdoc) <= k - 1, F.lit(0)
        ).otherwise(F.lit(1)).alias("brk"),
    )
    grp = isl.select(
        "doc_id", "pos",
        F.sum("brk").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)).alias("isl_id"),
    )
    sp = grp.groupBy("doc_id", "isl_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (k - 1)).alias("span_end"),
    )
    span_words = F.col("span_end") - F.col("span_start") + 1
    return sp.filter(span_words >= Q111_MIN_SPAN_WORDS).select(
        "doc_id", "span_start", "span_end", span_words.alias("span_words")
    )


# --------------------------------------------------------------------------
# q130 — per-source quantile normalization of quality scores: a model-
# based quality score (q110) is NOT comparable across sources (each
# source has its own score distribution), so mixture curation ranks by
# the score's percent_rank WITHIN its source — the distribution-free
# normalization that makes a single global keep-threshold meaningful.
# Returns the top-20 docs by normalized rank.
#
# percent_rank = (rank-1)/(n_source-1) is a ratio of exact integers —
# bit-identical across engines; ties inherit rank() semantics (equal
# scores share a rank), identical on both sides because the underlying
# score is q110's integer-logit construction. The window partitions by
# source — no global funnel; top-k is a heap.
# --------------------------------------------------------------------------
Q130_TOPK = 20


def _q130_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    w AS (
      SELECT doc_id,
             ((('0x' || substr(md5(t), 1, 8))::BIGINT % {Q110_BUCKETS}) * 37 + 11)
               % 201 - 100 AS wi
      FROM toks
    ),
    s AS (
      SELECT doc_id, sum(wi) / (5.0 * count(*)) + {Q110_BIAS} AS logit
      FROM w GROUP BY 1
    ),
    ranked AS (
      SELECT s.doc_id, d.source,
             round(percent_rank() OVER (PARTITION BY d.source
                                        ORDER BY s.logit), 6) AS src_pct
      FROM s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, source, src_pct
    FROM ranked
    ORDER BY src_pct DESC, doc_id
    LIMIT {Q130_TOPK}
    """


@register("q130_source_quantile_norm", oracle=_q130_oracle())
def q130_source_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).select("doc_id", _wt_int(F.col("t")).alias("wi"))
    s = w.groupBy("doc_id").agg(
        (F.sum("wi") / (F.lit(5.0) * F.count("*")) + F.lit(Q110_BIAS)).alias(
            "logit"
        )
    )
    win = Window.partitionBy("source").orderBy("logit")
    ranked = (
        s.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("src_pct", F.round(F.percent_rank().over(win), 6))
    )
    return (
        ranked.select("doc_id", "source", "src_pct")
        .orderBy(F.desc("src_pct"), F.asc("doc_id"))
        .limit(Q130_TOPK)
    )


# --------------------------------------------------------------------------
# q137 — span-corruption mask generation (T5-style denoising objective):
# every token position starts a corruption span with probability
# START_PCT (decided by a position-keyed md5 — fully deterministic, no
# RNG state), spans run SPAN_LEN tokens, and overlapping spans merge.
# Per doc: token count, masked count, maximal-span count — the numbers a
# pretraining data loader needs to budget sentinel tokens. The masked
# flag is a window OR over the previous SPAN_LEN-1 start flags and span
# starts are rising edges — both windows partition by doc_id only.
# --------------------------------------------------------------------------
Q137_START_PCT = 5
Q137_SPAN = 3


def _q137_oracle() -> str:
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, generate_subscripts(w, 1) AS pos FROM d),
    st AS (
      SELECT doc_id, pos,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                        || CAST(pos AS VARCHAR)), 1, 8))::BIGINT % 100
                  < {Q137_START_PCT} THEN 1 ELSE 0 END AS s
      FROM tok),
    msk AS (
      SELECT doc_id, pos, s,
             CASE WHEN max(s) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN {Q137_SPAN - 1} PRECEDING AND CURRENT ROW) = 1
                  THEN 1 ELSE 0 END AS m
      FROM st),
    edge AS (
      SELECT doc_id, m,
             CASE WHEN m = 1 AND coalesce(lag(m) OVER (
                    PARTITION BY doc_id ORDER BY pos), 0) = 0
                  THEN 1 ELSE 0 END AS rise
      FROM msk)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(m) AS BIGINT) AS n_masked,
           CAST(sum(rise) AS BIGINT) AS n_spans
    FROM edge GROUP BY 1
    """


@register("q137_span_corruption", oracle=_q137_oracle())
def q137_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "t")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"))
    start = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        < Q137_START_PCT
    ).cast("int")
    st = tok.select("doc_id", "pos", start.alias("s"))
    wspan = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(Q137_SPAN - 1), 0)
    )
    msk = st.select(
        "doc_id",
        "pos",
        (F.max("s").over(wspan) == 1).cast("int").alias("m"),
    )
    wlag = Window.partitionBy("doc_id").orderBy("pos")
    edge = msk.select(
        "doc_id",
        "m",
        (
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(wlag), F.lit(0)) == 0)
        ).cast("int").alias("rise"),
    )
    return edge.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("m").alias("n_masked"),
        F.sum("rise").alias("n_spans"),
    )


# --------------------------------------------------------------------------
# q141 — end-to-end curation pass as ONE query: the composition a real
# corpus build runs — (1) model-based quality gate (q110's exact-integer
# logit), (2) exact dedup keep-first (q22's fingerprint discipline:
# groupBy the md5, min doc_id survives), (3) language + length gates —
# reported as a per-source curation funnel (total -> kept, with token
# volume). Each stage is the already-proven component; the value here is
# the composition: one declarative plan, one pass over the token stream
# for scoring, one 16-byte-key shuffle for dedup, gates as scan-side
# filters. This is the query a reference user replaces their whole
# curation DAG with.
# --------------------------------------------------------------------------
Q141_LANG = "en"
Q141_MIN_CHARS = 120


def _q141_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    w AS (
      SELECT doc_id,
             ((('0x' || substr(md5(t), 1, 8))::BIGINT % {Q110_BUCKETS}) * 37 + 11)
               % 201 - 100 AS wi
      FROM toks),
    s AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(wi) / (5.0 * count(*)) + {Q110_BIAS} AS logit
      FROM w GROUP BY 1),
    first_of_fp AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    kept AS (
      SELECT d.doc_id, d.source, s.n_tokens
      FROM documents d
      JOIN s USING (doc_id)
      JOIN first_of_fp f USING (doc_id)
      WHERE s.logit >= 0
        AND d.lang = '{Q141_LANG}'
        AND d.n_chars >= {Q141_MIN_CHARS})
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(k.doc_id) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(k.n_tokens), 0) AS BIGINT) AS kept_tokens
    FROM documents d LEFT JOIN kept k USING (doc_id)
    GROUP BY 1 ORDER BY 1
    """


@register("q141_curation_e2e", oracle=_q141_oracle())
def q141_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).select("doc_id", _wt_int(F.col("t")).alias("wi"))
    s = w.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("wi") / (F.lit(5.0) * F.count("*")) + F.lit(Q110_BIAS)).alias(
            "logit"
        ),
    )
    first_of_fp = (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = (
        docs.filter(
            (F.col("lang") == Q141_LANG)
            & (F.col("n_chars") >= Q141_MIN_CHARS)
        )
        .join(s.filter(F.col("logit") >= 0), "doc_id")
        .join(first_of_fp, "doc_id")
        .select("doc_id", "source", "n_tokens")
    )
    return (
        docs.select("doc_id", "source")
        .join(kept.select("doc_id", "n_tokens"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count("n_tokens").alias("n_kept"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("kept_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q148 — k-anonymity audit over quasi-identifiers: group documents by the
# (lang, source, length-bucket) quasi-identifier tuple and report every
# group smaller than K — the re-identification risk surface a privacy
# review checks before releasing a corpus (the structured complement of
# q71's PII redaction). One map-side-combinable aggregate; the HAVING
# survivor set is small by construction.
# --------------------------------------------------------------------------
Q148_K = 5


@register(
    "q148_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(n_chars // 100 AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1, 2, 3
    HAVING count(*) < {Q148_K}
    ORDER BY lang, source, len_bucket
    """,
)
def q148_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / 100).cast("bigint").alias("len_bucket"),
        )
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < Q148_K)
        .orderBy("lang", "source", "len_bucket")
    )


# --------------------------------------------------------------------------
# q152 — sequence-length histogram for packing planning: log2-bucketed
# token-length distribution with cumulative share — the input q76's
# sequence packer needs to pick its context length (what fraction of
# documents fit whole at 512? how much padding would 1024 waste?). One
# token-count aggregate per doc, then a |buckets|-sized rollup; the
# cumulative window runs over the bounded bucket table.
# --------------------------------------------------------------------------
@register(
    "q152_length_histogram",
    oracle="""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
    b AS (
      SELECT CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket,
             count(*) AS n_docs, sum(n_tokens) AS tok
      FROM dl GROUP BY 1),
    tot AS (SELECT sum(n_docs) AS nd FROM b)
    SELECT CAST(pow(2, bucket) AS BIGINT) AS bucket_lo,
           CAST(pow(2, bucket + 1) - 1 AS BIGINT) AS bucket_hi,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(tok AS BIGINT) AS total_tokens,
           round(sum(n_docs) OVER (ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) / tot.nd, 6)
             AS cum_doc_share
    FROM b CROSS JOIN tot
    ORDER BY bucket_lo
    """,
)
def q152_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dl = docs.select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    # integer-exact floor(log2): bit length of n_tokens. The float form
    # floor(ln(n)/ln(2)) has no exactness guarantee at power-of-two counts
    # (JVM Math.log and libm are different 1-ulp implementations), so a
    # 512-token doc could land in bucket 8 on one engine and 9 on the
    # other — the group KEY must never ride on a float boundary (the q177
    # discipline).
    b = dl.groupBy(
        (F.length(F.bin("n_tokens")) - 1)
        .cast("bigint")
        .alias("bucket")
    ).agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tok"))
    tot = b.agg(F.sum("n_docs").alias("nd"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            F.pow(F.lit(2.0), F.col("bucket")).cast("bigint").alias("bucket_lo"),
            (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1)
            .cast("bigint")
            .alias("bucket_hi"),
            F.col("n_docs"),
            F.col("tok").alias("total_tokens"),
            F.round(
                F.sum("n_docs").over(w) / F.col("nd"), 6
            ).alias("cum_doc_share"),
            F.col("bucket"),
        )
        .orderBy("bucket_lo")
        .drop("bucket")
    )


# --------------------------------------------------------------------------
# q153 — deterministic weighted sampling without replacement (Efraimidis-
# Spirakis A-ES): sample K documents with probability proportional to a
# weight (n_chars here — longer docs oversampled, the "sample by token
# count" mixture move) by ranking on key = ln(u)/w with u a fixed
# md5-derived uniform — no RNG state, so the sample is exactly
# reproducible and oracle-checkable (the same reason q96 replaced
# randomSplit). Top-K by key is a TakeOrderedAndProject heap; the whole
# pass is one scan + heap, distributed-sampling's canonical shape.
# --------------------------------------------------------------------------
Q153_K = 25
_Q153_SCALE = float(2**60)


@register(
    "q153_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln(greatest(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, 1)
                / {_Q153_SCALE!r}) / n_chars AS k
      FROM documents)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           round(k * 1e6, 6) AS key_x1e6
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {Q153_K}
    """,
)
def q153_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    u = F.greatest(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(1),
    ) / F.lit(_Q153_SCALE)
    k = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars"),
            k.alias("k"),
        )
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(Q153_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(F.col("k") * 1e6, 6).alias("key_x1e6"),
        )
    )


# --------------------------------------------------------------------------
# q154 — rendezvous (highest-random-weight) shard assignment and the
# rebalancing delta: assign every document to a shard by argmax over
# md5(doc:shard) scores, for S and S+1 shards, and report how many
# documents MOVE — the consistent-hashing property (≈ 1/(S+1) movement)
# that makes shard scale-out cheap, versus mod-hashing where nearly
# everything moves. Assignment is a per-row argmax over a CONSTANT-size
# shard list (array expression, no explode past the scan, no shuffle);
# the movement report is one aggregate.
# --------------------------------------------------------------------------
Q154_S = 8


def _q154_oracle() -> str:
    def pick(n: int) -> str:
        # lexicographic struct max = (max h, tie -> max s) on both engines
        return (
            "list_max(list_transform(range(0, {n}), s -> "
            "struct_pack(h := ('0x' || substr(md5(CAST(doc_id AS VARCHAR)"
            " || ':' || CAST(s AS VARCHAR)), 1, 15))::BIGINT, s := s))).s"
        ).format(n=n)

    return f"""
    WITH a AS (
      SELECT doc_id,
             {pick(Q154_S)} AS s_old,
             {pick(Q154_S + 1)} AS s_new
      FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           round(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END)
                 / count(*), 6) AS moved_frac,
           CAST(count(DISTINCT s_new) AS BIGINT) AS n_shards_new
    FROM a
    """


@register("q154_rendezvous_sharding", oracle=_q154_oracle())
def q154_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")

    def pick(n: int):
        scores = F.array(
            *[
                F.struct(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("doc_id").cast("string"),
                                    F.lit(str(s)),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("bigint").alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n)
            ]
        )
        # lexicographic struct max = (max h, tie -> max s), mirroring the
        # oracle's list_max
        return F.array_max(scores)["s"]

    a = docs.select(
        "doc_id",
        pick(Q154_S).alias("s_old"),
        pick(Q154_S + 1).alias("s_new"),
    )
    return a.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("s_old") != F.col("s_new")).cast("int")).alias("n_moved"),
        F.round(
            F.sum((F.col("s_old") != F.col("s_new")).cast("int")) / F.count("*"),
            6,
        ).alias("moved_frac"),
        F.countDistinct("s_new").alias("n_shards_new"),
    )
