"""Text retrieval & language-model scoring over the documents table —
the ranking/quality layer of an LLM training-data pipeline (beyond-
reference, SURVEY §7 M6 family): BM25 keyword retrieval, per-source
TF-IDF signature terms, sub-document chunk dedup (CCNet/RefinedWeb-style
line dedup generalized to fixed token windows), and unigram-LM log-prob
quality scoring (the cheap stand-in for perplexity filtering).

Scale notes (100 TB framing):
- Every aggregate here is a map-side-combinable groupBy on a small key
  (token / hash / doc_id); corpus-level artifacts (df table, vocabulary,
  corpus stats) are tiny and broadcast — the token stream itself is never
  shuffled by anything wider than doc_id.
- Top-k is `orderBy().limit(k)` → TakeOrderedAndProject (no global sort),
  or a partitioned rank window — never a single-partition window.
- Scores are rounded to 6 decimals on BOTH engines before any ordering
  that feeds a limit, so the oracle hash cannot drift on a final ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# --------------------------------------------------------------------------
# q80 — BM25 keyword retrieval (Lucene idf form, k1=1.2, b=0.75): score
# every document for a fixed query-term set, return the top 20. The df
# table and the (n_docs, avgdl) corpus stats are tiny frames
# broadcast into the per-(doc, term) tf aggregate; the only wide exchange
# is the tf groupBy on (doc_id, term) — map-side combinable.
# --------------------------------------------------------------------------
Q80_TERMS = ["spark", "vector", "merge"]
Q80_K1 = 1.2
Q80_B = 0.75
Q80_TOPK = 20

_Q80_TERMS_SQL = ", ".join(f"'{t}'" for t in Q80_TERMS)


@register(
    "q80_bm25",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    corpus AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM d),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM d),
    qtok AS (SELECT * FROM tok WHERE t IN ({_Q80_TERMS_SQL})),
    dft AS (SELECT t, count(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
    tf AS (SELECT doc_id, t, count(*) AS tf, min(dl) AS dl
           FROM qtok GROUP BY 1, 2),
    scored AS (
        SELECT tf.doc_id,
               sum(ln(1 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * ({Q80_K1} + 1)
                   / (tf.tf + {Q80_K1} * (1 - {Q80_B}
                      + {Q80_B} * tf.dl / corpus.avgdl))) AS raw
        FROM tf JOIN dft USING (t) CROSS JOIN corpus
        GROUP BY 1)
    SELECT doc_id, round(raw, 6) AS bm25
    FROM scored
    ORDER BY round(raw, 6) DESC, doc_id
    LIMIT {Q80_TOPK}
    """,
)
def q80_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    corpus = d.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("w")).alias("avgdl")
    )
    tok = d.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("t")
    ).filter(F.col("t").isin(Q80_TERMS))
    dft = (
        tok.select("doc_id", "t")
        .distinct()
        .groupBy("t")
        .agg(F.count("*").alias("df"))
    )
    tf = tok.groupBy("doc_id", "t").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * F.col("tf")
        * (Q80_K1 + 1)
        / (
            F.col("tf")
            + Q80_K1 * (1 - Q80_B + Q80_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dft), "t")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(Q80_TOPK)


# --------------------------------------------------------------------------
# q81 — per-source TF-IDF signature terms: for every source, the top 5
# tokens by tf·idf where tf counts occurrences within the source and idf
# is the smoothed inverse source-frequency ln((1+S)/(1+sf)). The rank
# window is PARTITIONED by source (no global funnel); the source-frequency
# table is |vocab|-sized and broadcast.
# --------------------------------------------------------------------------
Q81_TOPK = 5


@register(
    "q81_tfidf_terms",
    oracle=f"""
    WITH tok AS (SELECT source, doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    ns AS (SELECT count(DISTINCT source) AS n_src FROM documents),
    sf AS (SELECT t, count(DISTINCT source) AS src_df FROM tok GROUP BY 1),
    tf AS (SELECT source, t, count(*) AS tf FROM tok GROUP BY 1, 2),
    scored AS (
        SELECT tf.source, tf.t,
               round(tf.tf * ln((1.0 + ns.n_src) / (1.0 + sf.src_df)), 6)
                   AS tfidf
        FROM tf JOIN sf USING (t) CROSS JOIN ns),
    ranked AS (
        SELECT source, t AS term, tfidf,
               row_number() OVER (PARTITION BY source
                                  ORDER BY tfidf DESC, t) AS rk
        FROM scored)
    SELECT source, term, tfidf, rk FROM ranked WHERE rk <= {Q81_TOPK}
    """,
)
def q81_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    ns = docs.agg(F.countDistinct("source").alias("n_src"))
    sf = (
        tok.select("source", "t")
        .distinct()
        .groupBy("t")
        .agg(F.count("*").alias("src_df"))
    )
    tf = tok.groupBy("source", "t").agg(F.count("*").alias("tf"))
    scored = (
        tf.join(F.broadcast(sf), "t")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            F.col("t").alias("term"),
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_src")) / (1.0 + F.col("src_df"))),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= Q81_TOPK
    )


# --------------------------------------------------------------------------
# q82 — sub-document chunk dedup: split every document into fixed 10-token
# windows (the deterministic stand-in for line/paragraph units, which the
# synthetic word-soup corpus lacks), md5 each chunk, and report per-doc how
# many of its chunks also occur elsewhere (any second occurrence, same doc
# or not). The CCNet / RefinedWeb line-dedup shape: only 32-byte hashes
# shuffle, never chunk text; the global chunk-frequency table joins back
# on the hash.
#
# Chunks are built by slicing the token ARRAY (array_slice / list slicing
# on both engines) — never collect_list after an explode, whose order is
# not guaranteed.
# --------------------------------------------------------------------------
Q82_CHUNK = 10


@register(
    "q82_chunk_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ch AS (SELECT doc_id,
                  unnest(list_transform(
                      range(1, CAST(ceil(len(w) / {Q82_CHUNK}.0) AS BIGINT) + 1),
                      i -> md5(array_to_string(
                          w[(i - 1) * {Q82_CHUNK} + 1 : i * {Q82_CHUNK}],
                          ' ')))) AS h
           FROM d),
    freq AS (SELECT h, count(*) AS n FROM ch GROUP BY 1)
    SELECT ch.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup,
           round(sum(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS dup_ratio
    FROM ch JOIN freq USING (h)
    GROUP BY 1
    """,
)
def q82_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    n_chunks = F.ceil(F.size("w") / F.lit(float(Q82_CHUNK))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.md5(
            F.concat_ws(
                " ", F.slice("w", (i - 1) * Q82_CHUNK + 1, Q82_CHUNK)
            )
        ),
    )
    ch = d.select("doc_id", F.explode(chunks).alias("h"))
    freq = ch.groupBy("h").agg(F.count("*").alias("n"))
    return (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
            F.round(
                F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# q83 — unigram-LM log-probability scoring: estimate p(t) from corpus
# counts (MLE; every scored token is in-corpus by construction), then
# score each document by its mean token log-prob — the cheap proxy for
# perplexity-based quality filtering (CCNet's KenLM stage). The unigram
# table is |vocab|-sized and broadcast; the token stream shuffles only on
# doc_id for the final rollup.
# --------------------------------------------------------------------------
@register(
    "q83_unigram_logprob",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    tot AS (SELECT count(*) AS n FROM tok),
    lm AS (SELECT t, count(*) AS c FROM tok GROUP BY 1)
    SELECT tok.doc_id,
           count(*) AS n_tok,
           round(avg(ln(lm.c * 1.0 / tot.n)), 6) AS mean_logprob
    FROM tok JOIN lm USING (t) CROSS JOIN tot
    GROUP BY 1
    """,
)
def q83_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    tot = tok.agg(F.count("*").alias("n"))
    lm = tok.groupBy("t").agg(F.count("*").alias("c"))
    return (
        tok.join(F.broadcast(lm), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("mean_logprob"),
        )
    )


# --------------------------------------------------------------------------
# q90 — KMV (k-minimum-values) distinct-count sketch per source, audited
# against the exact count. Unlike HLL/approx_count_distinct — whose
# estimates are engine-implementation-specific — KMV over md5-derived
# hashes is fully DETERMINISTIC, so the sketch itself is oracle-checked,
# not just bounded: estimate = (k-1) / kth_min_normalized_hash when the
# group holds >= k distinct values, else the exact count.
#
# The sketch is MERGEABLE (union of k-min sets -> k-min of union), which
# is the 100 TB property: per-partition partial sketches combine
# associatively, so distinct-count audits over petabyte token streams
# never shuffle raw values — here the shuffle is already only the
# (source, token-hash) distinct, and the rank window prunes to k rows per
# group via WindowGroupLimit.
# --------------------------------------------------------------------------
Q90_K = 64
_Q90_SCALE = float(2**60)


@register(
    "q90_kmv_distinct",
    oracle=f"""
    WITH tok AS (SELECT DISTINCT source,
                        CAST('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15)
                             AS BIGINT) AS h
                 FROM documents),
    exact AS (SELECT source, count(*) AS exact_distinct FROM tok GROUP BY 1),
    ranked AS (SELECT source, h,
                      row_number() OVER (PARTITION BY source ORDER BY h) AS rk
               FROM tok),
    sk AS (SELECT source, count(*) AS n_in_sketch, max(h) AS kth
           FROM ranked WHERE rk <= {Q90_K} GROUP BY 1)
    SELECT sk.source,
           exact.exact_distinct,
           round(CASE WHEN sk.n_in_sketch < {Q90_K}
                      THEN sk.n_in_sketch * 1.0
                      ELSE ({Q90_K} - 1) / (sk.kth / {_Q90_SCALE!r})
                 END, 6) AS kmv_estimate
    FROM sk JOIN exact USING (source)
    """,
)
def q90_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("t"))
        .select(
            "source",
            F.conv(F.substring(F.md5("t"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    exact = tok.groupBy("source").agg(F.count("*").alias("exact_distinct"))
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        tok.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= Q90_K)
        .groupBy("source")
        .agg(F.count("*").alias("n_in_sketch"), F.max("h").alias("kth"))
    )
    est = F.when(
        F.col("n_in_sketch") < Q90_K, F.col("n_in_sketch").cast("double")
    ).otherwise((Q90_K - 1) / (F.col("kth") / F.lit(_Q90_SCALE)))
    return (
        sk.join(exact, "source")
        .select("source", "exact_distinct", F.round(est, 6).alias("kmv_estimate"))
    )


# --------------------------------------------------------------------------
# q96 — deterministic hash split: the REPRODUCIBLE train/val/test
# assignment (60/20/20 by md5(doc_id) mod 10) that production corpora
# use instead of randomSplit (q36): membership is a pure function of the
# row, so it survives reruns, repartitioning, late-arriving shards, and
# engine changes — and is therefore fully oracle-checkable, where
# q36's sampler can only ever be rows-only. Pure projection: no shuffle
# for the assignment; one tiny aggregate for the audit counts.
# --------------------------------------------------------------------------
def _q96_oracle() -> str:
    from ..operators.sampling import hash_split_sql

    return f"""
    WITH assigned AS (
        SELECT doc_id, {hash_split_sql("doc_id")} AS split FROM documents)
    SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM assigned GROUP BY 1
    """


@register("q96_hash_split", oracle=_q96_oracle())
def q96_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_split

    assigned = load(spark, sf_dir, "documents").select(
        "doc_id", hash_split(F.col("doc_id")).alias("split")
    )
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


# --------------------------------------------------------------------------
# q113 — positional-index phrase search: find documents containing the
# exact phrase "<t1> <t2>" via posting-list intersection with position
# adjacency — the inverted-index primitive under every phrase/proximity
# query an IR engine serves (BM25 q80 ranks bags of words; this is the
# ordered-adjacency tier).
#
# Scale shape: the term filter runs pipelined on the scan side of the
# explode, so only postings of the two query terms ever reach a shuffle
# (posting-list size, not corpus size); the self-join intersects postings
# doc-locally on (doc_id, pos+1 = pos). No corpus-wide index build is
# needed for a fixed query — and a full materialized positional index is
# the same frame without the term filter, written partitioned by term
# hash (the q89 persisted-index pattern).
# --------------------------------------------------------------------------
Q113_T1 = "table"
Q113_T2 = "hash"


@register(
    "q113_phrase_search",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    p AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(w, (x, i) -> struct_pack(pos := i, t := x)),
               s -> s.t IN ('{Q113_T1}', '{Q113_T2}'))) AS u
      FROM toks
    ),
    occ AS (SELECT doc_id, u.pos AS pos, u.t AS t FROM p),
    m AS (
      SELECT a.doc_id, a.pos
      FROM occ a JOIN occ b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       AND a.t = '{Q113_T1}' AND b.t = '{Q113_T2}'
    )
    SELECT doc_id, count(*) AS n_matches, min(pos) AS first_pos
    FROM m GROUP BY 1
    """,
)
def q113_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "t")
        )
        .filter(F.col("t").isin(Q113_T1, Q113_T2))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "t")
    )
    a = occ.filter(F.col("t") == Q113_T1).select("doc_id", F.col("pos").alias("pa"))
    b = occ.filter(F.col("t") == Q113_T2).select("doc_id", F.col("pos").alias("pb"))
    m = a.join(b, "doc_id").filter(F.col("pb") == F.col("pa") + 1)
    return m.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"), F.min("pa").alias("first_pos")
    )


# --------------------------------------------------------------------------
# q117 — two-stage retrieval: BM25 candidate generation -> model rerank.
# The canonical serving architecture of every modern search/RAG stack:
# a cheap sparse scorer over the whole corpus produces a small candidate
# set, then an expensive model rescores ONLY the candidates. Stage 1 is
# q80's BM25 (top-20, rounded-score + doc_id tie-break so the candidate
# set is engine-stable); stage 2 re-scores candidates with the q110
# hashed-feature linear model (the cross-encoder stand-in — the exact-
# integer logit makes it oracle-reproducible) blended with the BM25
# prior, and returns the top-5.
#
# Scale shape: stage 2's token explode runs AFTER the candidate
# semi-join, so the expensive model touches 20 documents regardless of
# corpus size — the whole point of the two-stage shape. Stage 1's only
# wide exchange remains the map-side-combined (doc, term) tf groupBy.
# --------------------------------------------------------------------------
Q117_CANDIDATES = 20
Q117_TOPK = 5
Q117_BM25_WEIGHT = 0.1


def _q117_oracle() -> str:
    from .curation import Q110_BIAS, Q110_BUCKETS

    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    corpus AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM d),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM d),
    qtok AS (SELECT * FROM tok WHERE t IN ({_Q80_TERMS_SQL})),
    dft AS (SELECT t, count(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
    tf AS (SELECT doc_id, t, count(*) AS tf, min(dl) AS dl
           FROM qtok GROUP BY 1, 2),
    scored AS (
        SELECT tf.doc_id,
               round(sum(ln(1 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * ({Q80_K1} + 1)
                   / (tf.tf + {Q80_K1} * (1 - {Q80_B}
                      + {Q80_B} * tf.dl / corpus.avgdl))), 6) AS bm25
        FROM tf JOIN dft USING (t) CROSS JOIN corpus
        GROUP BY 1),
    cand AS (
        SELECT doc_id, bm25 FROM scored
        ORDER BY bm25 DESC, doc_id LIMIT {Q117_CANDIDATES}),
    ctok AS (
        SELECT d.doc_id, unnest(string_split(doc.text, ' ')) AS t
        FROM cand d JOIN documents doc USING (doc_id)),
    wi AS (
        SELECT doc_id,
               ((('0x' || substr(md5(t), 1, 8))::BIGINT % {Q110_BUCKETS}) * 37 + 11)
                 % 201 - 100 AS wi
        FROM ctok),
    z AS (SELECT doc_id, sum(wi) / (5.0 * count(*)) AS z FROM wi GROUP BY 1),
    final AS (
        SELECT c.doc_id, c.bm25,
               round(z.z + {Q110_BIAS} + {Q117_BM25_WEIGHT} * c.bm25, 6)
                 AS rerank_score
        FROM cand c JOIN z USING (doc_id))
    SELECT doc_id, bm25, rerank_score,
           CAST(row_number() OVER (ORDER BY rerank_score DESC, doc_id) AS BIGINT)
             AS rk
    FROM final
    ORDER BY rerank_score DESC, doc_id LIMIT {Q117_TOPK}
    """


@register("q117_retrieve_rerank", oracle=_q117_oracle())
def q117_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .curation import Q110_BIAS, _wt_int

    cand = q80_bm25(spark, sf_dir).limit(Q117_CANDIDATES)
    docs = load(spark, sf_dir, "documents")
    ctok = cand.join(docs, "doc_id").select(
        "doc_id", "bm25", F.explode(F.split("text", " ")).alias("t")
    )
    z = (
        ctok.select("doc_id", "bm25", _wt_int(F.col("t")).alias("wi"))
        .groupBy("doc_id", "bm25")
        .agg((F.sum("wi") / (F.lit(5.0) * F.count("*"))).alias("z"))
    )
    final = z.select(
        "doc_id",
        "bm25",
        F.round(
            F.col("z") + F.lit(Q110_BIAS) + F.lit(Q117_BM25_WEIGHT) * F.col("bm25"), 6
        ).alias("rerank_score"),
    )
    # unpartitioned window is safe here: it ranks the bounded candidate
    # set (<= Q117_CANDIDATES rows), never corpus rows
    w = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return (
        final.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .orderBy(F.desc("rerank_score"), F.asc("doc_id"))
        .limit(Q117_TOPK)
    )


# --------------------------------------------------------------------------
# q118 — BPE merge-candidate counting (one tokenizer-training iteration).
# A BPE trainer repeatedly merges the most frequent adjacent symbol pair;
# this query produces the top-20 candidate merges of the first round over
# the corpus, with characters as the initial symbol alphabet.
#
# Scale shape (the fast-BPE trick): the corpus token stream is FIRST
# compacted to a word-frequency vocabulary (groupBy word — map-side
# combinable, one shuffled row per distinct word), and the quadratic-ish
# pair explode runs over |vocab| rows weighted by count, never over the
# raw token stream — at 100 TB the vocabulary is millions of rows while
# the stream is trillions. The pair aggregate keys on 2-char strings
# (tiny domain, map-side combinable); top-k is TakeOrderedAndProject.
# --------------------------------------------------------------------------
Q118_TOPK = 20


@register(
    "q118_bpe_pairs",
    oracle=f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    v AS (SELECT word, count(*) AS c FROM w WHERE word <> '' GROUP BY 1),
    p AS (SELECT substr(word, i, 2) AS pair, c
          FROM v, unnest(range(1, length(word))) AS r(i)
          WHERE length(word) >= 2)
    SELECT pair, CAST(sum(c) AS BIGINT) AS cnt
    FROM p GROUP BY 1
    ORDER BY cnt DESC, pair
    LIMIT {Q118_TOPK}
    """,
)
def q118_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    # sequence(1, length-1) under a length>=2 guard (sequence() would run
    # DESCENDING for a 1-char word — the guard is semantic, not cosmetic)
    pairs = vocab.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(Q118_TOPK)
    )


# --------------------------------------------------------------------------
# q119 — interpolated bigram language-model scoring (perplexity filtering,
# the quality gate CCNet/RefinedWeb run with a KenLM model): score every
# document by its average bigram log-probability under the corpus's own
# MLE bigram model, interpolated with the unigram model
# (p = LAMBDA * cb(w1,w2)/cu(w1) + (1-LAMBDA) * cu(w2)/T), and return the
# 20 WORST-scoring documents — the ones a perplexity filter would drop.
#
# Scale shape: the unigram and bigram count tables are groupBy aggregates
# on the token / token-pair key (map-side combinable; one shuffled row
# per distinct gram). The per-doc bigram stream joins those tables on
# their keys — plain shuffle joins that AQE turns into broadcasts while
# the model tables are small and keeps as co-partitioned shuffle joins at
# 100 TB vocabulary scale. The lead() window partitions by doc_id only.
# --------------------------------------------------------------------------
Q119_LAMBDA = 0.7
Q119_TOPK = 20


@register(
    "q119_bigram_lm",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos
            FROM d),
    bg AS (SELECT doc_id, t AS w1,
                  lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
           FROM tok),
    bgf AS (SELECT * FROM bg WHERE w2 IS NOT NULL),
    uni AS (SELECT t AS w, count(*) AS cu FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS n_tok FROM tok),
    big AS (SELECT w1, w2, count(*) AS cb FROM bgf GROUP BY 1, 2),
    sc AS (
      SELECT b.doc_id,
             ln({Q119_LAMBDA} * big.cb / u1.cu
                + {1.0 - Q119_LAMBDA} * u2.cu / tot.n_tok) AS lp
      FROM bgf b
      JOIN big USING (w1, w2)
      JOIN uni u1 ON b.w1 = u1.w
      JOIN uni u2 ON b.w2 = u2.w
      CROSS JOIN tot)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 6) AS avg_logprob
    FROM sc GROUP BY 1
    ORDER BY avg_logprob, doc_id
    LIMIT {Q119_TOPK}
    """,
)
def q119_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgf = (
        tok.select("doc_id", F.col("t").alias("w1"), F.lead("t").over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    uni = tok.groupBy(F.col("t").alias("w")).agg(F.count("*").alias("cu"))
    tot = tok.agg(F.count("*").alias("n_tok"))
    big = bgf.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    lp = F.log(
        F.lit(Q119_LAMBDA) * F.col("cb") / F.col("cu1")
        + F.lit(1.0 - Q119_LAMBDA) * F.col("cu2") / F.col("n_tok")
    )
    scored = (
        bgf.join(big, ["w1", "w2"])
        .join(
            uni.select(F.col("w").alias("w1"), F.col("cu").alias("cu1")), "w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2"
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )
    return scored.orderBy(F.asc("avg_logprob"), F.asc("doc_id")).limit(Q119_TOPK)


# --------------------------------------------------------------------------
# q131 — per-source distribution-shift audit: KL divergence of each
# source's unigram distribution from the corpus unigram distribution,
# KL(p_source || p_corpus) = sum_t p_s(t) * ln(p_s(t) / p_c(t)). The
# audit a curation pipeline runs to spot sources whose token mix drifts
# from the blend (boilerplate farms, non-target-language pockets,
# machine-generated text).
#
# Scale shape: two map-side-combinable count aggregates — (source, token)
# and (token) — then a key join on token and a per-source sum. The token
# stream is shuffled once per grain; the corpus table joins on the token
# key (AQE broadcasts it while vocab is small, co-partitions at 100 TB
# vocab). p_c > 0 for every source token by construction (the corpus
# contains the source), so the log is total.
# --------------------------------------------------------------------------
@register(
    "q131_source_kl",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
    st AS (SELECT source, t, count(*) AS cs FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, sum(cs) AS ns FROM st GROUP BY 1),
    ct AS (SELECT t, count(*) AS cc FROM tok GROUP BY 1),
    ctot AS (SELECT count(*) AS nc FROM tok),
    kl AS (
      SELECT st.source,
             sum((st.cs / stot.ns)
                 * ln((st.cs / stot.ns) / (ct.cc / ctot.nc))) AS raw
      FROM st
      JOIN stot USING (source)
      JOIN ct USING (t)
      CROSS JOIN ctot
      GROUP BY 1)
    SELECT source, round(raw, 6) AS kl
    FROM kl ORDER BY source
    """,
)
def q131_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("t"))
    st = tok.groupBy("source", "t").agg(F.count("*").alias("cs"))
    stot = st.groupBy("source").agg(F.sum("cs").alias("ns"))
    ct = tok.groupBy("t").agg(F.count("*").alias("cc"))
    ctot = tok.agg(F.count("*").alias("nc"))
    ps = F.col("cs") / F.col("ns")
    pc = F.col("cc") / F.col("nc")
    return (
        st.join(F.broadcast(stot), "source")
        .join(ct, "t")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(F.round(F.sum(ps * F.log(ps / pc)), 6).alias("kl"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q149 — corpus-churn keyness (log-odds ratio with add-half smoothing):
# which tokens most distinguish one corpus slice from another — the
# lexical drift report between snapshots, sources, or time windows. The
# two slices here are the even/odd doc_id halves (a deterministic stand-
# in for "last month vs this month"). keyness(t) = ln((ca+0.5)/(Na-ca+0.5))
# - ln((cb+0.5)/(Nb-cb+0.5)); top-15 by |keyness| with count floor.
#
# Scale shape: one (slice, token) count aggregate (map-side combined),
# pivoted by conditional sums into per-token (ca, cb) — one shuffled row
# per distinct token; totals broadcast; top-k is a heap.
# --------------------------------------------------------------------------
Q149_TOPK = 15
Q149_MIN_COUNT = 50


@register(
    "q149_keyness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 2 AS slice, unnest(string_split(text, ' ')) AS t
      FROM documents),
    tc AS (
      SELECT t,
             sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS cb
      FROM tok GROUP BY 1),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM tc),
    scored AS (
      SELECT t, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
             round(ln((ca + 0.5) / (tot.na - ca + 0.5))
                   - ln((cb + 0.5) / (tot.nb - cb + 0.5)), 6) AS keyness
      FROM tc CROSS JOIN tot
      WHERE ca + cb >= {Q149_MIN_COUNT})
    SELECT t, ca, cb, keyness
    FROM scored
    ORDER BY abs(keyness) DESC, t
    LIMIT {Q149_TOPK}
    """,
)
def q149_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("slice"),
        F.explode(F.split("text", " ")).alias("t"),
    )
    tc = tok.groupBy("t").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = tc.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    keyness = F.round(
        F.log((F.col("ca") + 0.5) / (F.col("na") - F.col("ca") + 0.5))
        - F.log((F.col("cb") + 0.5) / (F.col("nb") - F.col("cb") + 0.5)),
        6,
    )
    return (
        tc.filter(F.col("ca") + F.col("cb") >= Q149_MIN_COUNT)
        .crossJoin(F.broadcast(tot))
        .select("t", "ca", "cb", keyness.alias("keyness"))
        .orderBy(F.abs(F.col("keyness")).desc(), F.asc("t"))
        .limit(Q149_TOPK)
    )


# --------------------------------------------------------------------------
# q150 — source-similarity matrix: pairwise cosine between the SOURCES'
# term-frequency vectors — which corpus slices are distribution-level
# near-duplicates of each other (mirror sites, scrape overlaps). The
# corpus is first collapsed to |sources| aggregated vectors (map-side-
# combined (source, token) counts), and the quadratic runs over the
# BOUNDED source pair set via a token-keyed join: dot products come from
# joining the two count tables ON TOKEN (one shuffled row per token per
# source pair that shares it), norms from per-source aggregates — the
# corpus body is never pair-joined.
# --------------------------------------------------------------------------
Q150_MIN_SIM = 0.5


@register(
    "q150_source_similarity",
    oracle=f"""
    WITH tc AS (
      SELECT source, t, count(*)::DOUBLE AS c FROM (
        SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY 1, 2),
    nrm AS (SELECT source, sqrt(sum(c * c)) AS n FROM tc GROUP BY 1),
    dots AS (
      SELECT a.source AS sa, b.source AS sb, sum(a.c * b.c) AS dp
      FROM tc a JOIN tc b ON a.t = b.t AND a.source < b.source
      GROUP BY 1, 2)
    SELECT sa, sb, round(dp / (na.n * nb.n), 6) AS cos_sim
    FROM dots
    JOIN nrm na ON na.source = sa
    JOIN nrm nb ON nb.source = sb
    WHERE dp / (na.n * nb.n) >= {Q150_MIN_SIM}
    ORDER BY sa, sb
    """,
)
def q150_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").cast("double").alias("c"))
    )
    nrm = tc.groupBy("source").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("n")
    )
    a = tc.select(F.col("source").alias("sa"), "t", F.col("c").alias("cx"))
    b = tc.select(F.col("source").alias("sb"), "t", F.col("c").alias("cy"))
    dots = (
        a.join(b, "t")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.sum(F.col("cx") * F.col("cy")).alias("dp"))
    )
    na = nrm.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    nb = nrm.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    sim = F.col("dp") / (F.col("na") * F.col("nb"))
    return (
        dots.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .filter(sim >= Q150_MIN_SIM)
        .select("sa", "sb", F.round(sim, 6).alias("cos_sim"))
        .orderBy("sa", "sb")
    )


# --------------------------------------------------------------------------
# q162 — BM25 hard-negative mining for retrieval training (DPR / sentence-
# transformers recipe): every 25th document becomes a query (its 3 RAREST
# distinct tokens of length >= 4 — ascending global df, term tie-break —
# are the query terms); the positives are the source documents
# themselves; the HARD negatives are the top-3 OTHER documents by BM25 —
# lexically close but not the gold passage, exactly what contrastive
# retrievers need.
#
# Scale shape — two guards, both standard IR machinery:
# 1. Rarest-first term selection (ascending global df) — the same
#    principle as q99's PPJoin prefix: discriminative terms have short
#    posting lists. (The first cut picked terms lexicographically; on a
#    small-vocabulary corpus that selects stop-terms and the sf1.0 scale
#    audit measured a 64x blow-up at 10x data. See BENCH_NOTES.)
# 2. Impact-ordered posting truncation (static index pruning, the
#    WAND-family serving trick): each term's posting list keeps only its
#    top-{cap} documents by (tf DESC, doc_id) — the docs any BM25 top-k
#    could plausibly surface. This bounds the qterms ⋈ postings join at
#    |queries| x NTERMS x cap REGARDLESS of df, which is what survives a
#    corpus whose every term is frequent. Exact for terms with
#    df <= cap; beyond that it is the standard documented
#    pruned-index approximation.
# The df table is vocabulary-sized and broadcast; the rank windows
# partition by query id / term. Same k1/b/idf constants as q80.
# --------------------------------------------------------------------------
Q162_EVERY = 25
Q162_NTERMS = 3
Q162_MINLEN = 4
Q162_NEGS = 3
Q162_POSTING_CAP = 128


def _bm25_scored_ctes() -> str:
    """Shared oracle CTE prefix for the q162/q195 retrieval core.

    Ends with ``scored(qid, doc_id, bm25)`` — bm25 rounded to 6 on BOTH
    engines before any ordering. One source of truth so a one-sided edit
    of the retrieval contract (term selection, posting cap, BM25 form)
    is structurally impossible (the same discipline as llm_ops'
    _sig_ctes_sql).
    """
    return f"""d AS (SELECT doc_id, source, string_split(text, ' ') AS w
               FROM documents),
    corpus AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM d),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM d),
    dfall AS (SELECT t, count(DISTINCT doc_id) AS df FROM tok
              WHERE length(t) >= {Q162_MINLEN} GROUP BY 1),
    qcand AS (
      SELECT doc_id AS qid, unnest(list_distinct(
                 list_filter(w, t -> length(t) >= {Q162_MINLEN}))) AS t
      FROM d WHERE doc_id % {Q162_EVERY} = 0
    ),
    qterms AS (
      SELECT qid, t FROM (
        SELECT c.qid, c.t,
               row_number() OVER (PARTITION BY c.qid
                                  ORDER BY dfall.df, c.t) AS rn
        FROM qcand c JOIN dfall USING (t))
      WHERE rn <= {Q162_NTERMS}
    ),
    qtok AS (SELECT DISTINCT t FROM qterms),
    rtok AS (SELECT tok.* FROM tok JOIN qtok USING (t)),
    dft AS (SELECT t, df FROM dfall JOIN qtok USING (t)),
    tfall AS (SELECT doc_id, t, count(*) AS tf, min(dl) AS dl
              FROM rtok GROUP BY 1, 2),
    tf AS (
      SELECT doc_id, t, tf, dl FROM (
        SELECT doc_id, t, tf, dl,
               row_number() OVER (PARTITION BY t
                                  ORDER BY tf DESC, doc_id) AS prn
        FROM tfall)
      WHERE prn <= {Q162_POSTING_CAP}
    ),
    scored AS (
      SELECT q.qid, tf.doc_id,
             round(sum(ln(1 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * tf.tf * ({Q80_K1} + 1)
                 / (tf.tf + {Q80_K1} * (1 - {Q80_B}
                    + {Q80_B} * tf.dl / corpus.avgdl))), 6) AS bm25
      FROM qterms q
      JOIN tf ON q.t = tf.t
      JOIN dft ON q.t = dft.t
      CROSS JOIN corpus
      WHERE tf.doc_id <> q.qid
      GROUP BY 1, 2
    )"""


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """Shared q162/q195 retrieval core (Spark twin of _bm25_scored_ctes).

    Every {Q162_EVERY}th document becomes a query (its {Q162_NTERMS}
    rarest distinct tokens of length >= {Q162_MINLEN}, ascending global
    df with term tie-break); candidates come from impact-ordered posting
    lists truncated at {Q162_POSTING_CAP}. Returns (qid, doc_id, bm25)
    with bm25 rounded to 6. Scale guards documented at q162's header.
    """
    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    corpus = d.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("w")).alias("avgdl")
    )
    tok = d.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("t")
    )
    dfall = (
        tok.filter(F.length("t") >= Q162_MINLEN)
        .select("doc_id", "t")
        .distinct()
        .groupBy("t")
        .agg(F.count("*").alias("df"))
    )
    qcand = d.filter(F.col("doc_id") % Q162_EVERY == 0).select(
        F.col("doc_id").alias("qid"),
        F.explode(
            F.array_distinct(
                F.filter("w", lambda t: F.length(t) >= Q162_MINLEN)
            )
        ).alias("t"),
    )
    wq = Window.partitionBy("qid").orderBy("df", "t")
    qterms = (
        qcand.join(F.broadcast(dfall), "t")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= Q162_NTERMS)
        .select("qid", "t")
    )
    qtok = qterms.select("t").distinct()
    rtok = tok.join(F.broadcast(qtok), "t")
    dft = dfall.join(F.broadcast(qtok), "t").select("t", "df")
    tfall = rtok.groupBy("doc_id", "t").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl")
    )
    wp = Window.partitionBy("t").orderBy(F.desc("tf"), F.asc("doc_id"))
    tf = (
        tfall.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= Q162_POSTING_CAP)
        .select("doc_id", "t", "tf", "dl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * F.col("tf")
        * (Q80_K1 + 1)
        / (
            F.col("tf")
            + Q80_K1 * (1 - Q80_B + Q80_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        F.broadcast(qterms)
        .join(tf, "t")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(F.broadcast(dft), "t")
        .crossJoin(F.broadcast(corpus))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )


@register(
    "q162_hard_negatives",
    oracle=f"""
    WITH {_bm25_scored_ctes()},
    ranked AS (
      SELECT qid, doc_id, bm25,
             row_number() OVER (PARTITION BY qid
                                ORDER BY bm25 DESC, doc_id) AS rk
      FROM scored
    )
    SELECT qid, CAST(rk AS INT) AS neg_rank, doc_id AS neg_doc_id, bm25
    FROM ranked WHERE rk <= {Q162_NEGS}
    """,
)
def q162_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(load(spark, sf_dir, "documents"))
    rk = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.select(
            "qid",
            F.row_number().over(rk).alias("neg_rank"),
            F.col("doc_id").alias("neg_doc_id"),
            "bm25",
        )
        .filter(F.col("neg_rank") <= Q162_NEGS)
    )


# --------------------------------------------------------------------------
# q175 — PMI token co-occurrence: document-level pointwise mutual
# information for token pairs, PMI = ln(n_ab * N / (n_a * n_b)) over
# document-frequency counts — the collocation/phrase-mining statistic
# (word2vec-era feature, still the standard phrase detector).
#
# Scale shape: the pair space is generated DOC-LOCALLY — a self-join on
# doc_id over each document's distinct long tokens, bounded by (distinct
# tokens per doc)^2 with document length capped upstream — then reduced
# by a map-side-combinable (a, b) groupBy. The df table is
# vocabulary-sized and broadcast twice. A min-support filter keeps the
# output to statistically meaningful pairs.
# --------------------------------------------------------------------------
Q175_MINLEN = 4
Q175_MIN_SUPPORT = 5


@register(
    "q175_pmi_cooccurrence",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, list_distinct(list_filter(string_split(text, ' '),
                 t -> length(t) >= {Q175_MINLEN})) AS toks
      FROM documents
    ),
    n AS (SELECT count(*) AS n FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
    df AS (SELECT t, count(*) AS df FROM tok GROUP BY 1),
    co AS (
      SELECT a.t AS ta, b.t AS tb, count(*) AS n_ab
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln(n_ab * 1.0 * n.n / (fa.df * fb.df)), 6) AS pmi
    FROM co
    JOIN df fa ON co.ta = fa.t
    JOIN df fb ON co.tb = fb.t
    CROSS JOIN n
    WHERE n_ab >= {Q175_MIN_SUPPORT}
    """,
)
def q175_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split("text", " "),
                        lambda t: F.length(t) >= Q175_MINLEN,
                    )
                )
            ).alias("t"),
        )
    )
    n = docs.agg(F.count("*").alias("n"))
    df = tok.groupBy("t").agg(F.count("*").alias("df"))
    a = tok.select("doc_id", F.col("t").alias("ta"))
    b = tok.select("doc_id", F.col("t").alias("tb"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= Q175_MIN_SUPPORT)
    )
    fa = df.select(F.col("t").alias("ta"), F.col("df").alias("dfa"))
    fb = df.select(F.col("t").alias("tb"), F.col("df").alias("dfb"))
    return (
        co.join(F.broadcast(fa), "ta")
        .join(F.broadcast(fb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta",
            "tb",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.lit(1.0)
                    * F.col("n")
                    / (F.col("dfa") * F.col("dfb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# q195 — ranking evaluation: NDCG@10 of the q162 retrieval pipeline
# (rarest-term queries, impact-pruned BM25) against a same-source
# relevance standard (a candidate is relevant to query doc q iff it
# comes from q's source — the weak-supervision label retrieval evals
# bootstrap from). DCG uses binary gains 1/log2(rank+1); IDCG is the
# ideal ordering of the SAME candidate pool, so ndcg = 1 means "every
# relevant candidate ranked on top". Per-query rank windows; the same
# posting-cap scale guards as q162.
# --------------------------------------------------------------------------
Q195_K = 10


@register(
    "q195_ndcg_eval",
    oracle=f"""
    WITH {_bm25_scored_ctes()},
    rel AS (
      SELECT s.qid, s.doc_id, s.bm25,
             CAST(dq.source = dc.source AS INT) AS r
      FROM scored s
      JOIN d dq ON s.qid = dq.doc_id
      JOIN d dc ON s.doc_id = dc.doc_id
    ),
    ranked AS (
      SELECT qid, r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY bm25 DESC, doc_id) AS rk,
             sum(r) OVER (PARTITION BY qid) AS n_rel
      FROM rel
    ),
    dcg AS (
      SELECT qid, max(n_rel) AS n_rel,
             sum(CASE WHEN rk <= {Q195_K} THEN r / log2(rk + 1.0)
                      ELSE 0 END) AS dcg
      FROM ranked GROUP BY 1
    ),
    idcg AS (
      SELECT qid,
             sum(CASE WHEN i <= least(n_rel, {Q195_K})
                      THEN 1.0 / log2(i + 1.0) ELSE 0 END) AS idcg
      FROM dcg CROSS JOIN (SELECT unnest(range(1, {Q195_K} + 1)) AS i)
      GROUP BY 1
    )
    SELECT dcg.qid, CAST(dcg.n_rel AS BIGINT) AS n_rel,
           round(dcg.dcg, 6) AS dcg,
           round(idcg.idcg, 6) AS idcg,
           CASE WHEN idcg.idcg > 0
                THEN round(dcg.dcg / idcg.idcg, 6) ELSE 0.0 END AS ndcg
    FROM dcg JOIN idcg USING (qid)
    """,
)
def q195_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = _bm25_scored(docs)
    src = docs.select("doc_id", "source")
    rel = (
        scored.join(
            src.select(F.col("doc_id").alias("qid"), F.col("source").alias("qsrc")),
            "qid",
        )
        .join(
            src.select("doc_id", F.col("source").alias("csrc")),
            "doc_id",
        )
        .select(
            "qid",
            "doc_id",
            "bm25",
            (F.col("qsrc") == F.col("csrc")).cast("int").alias("r"),
        )
    )
    wrk = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    wq2 = Window.partitionBy("qid")
    ranked = rel.select(
        "qid",
        "r",
        F.row_number().over(wrk).alias("rk"),
        F.sum("r").over(wq2).alias("n_rel"),
    )
    dcg = ranked.groupBy("qid").agg(
        F.max("n_rel").alias("n_rel"),
        F.sum(
            F.when(
                F.col("rk") <= Q195_K, F.col("r") / F.log2(F.col("rk") + 1.0)
            ).otherwise(0.0)
        ).alias("dcg"),
    )
    ranks = spark.range(1, Q195_K + 1).select(
        F.col("id").cast("int").alias("i")
    )
    idcg = (
        dcg.crossJoin(F.broadcast(ranks))
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(
                    F.col("i") <= F.least(F.col("n_rel"), F.lit(Q195_K)),
                    1.0 / F.log2(F.col("i") + 1.0),
                ).otherwise(0.0)
            ).alias("idcg")
        )
    )
    return dcg.join(idcg, "qid").select(
        "qid",
        F.col("n_rel").cast("bigint").alias("n_rel"),
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )


# --------------------------------------------------------------------------
# q237 — reciprocal-rank-fusion hybrid retrieval: the standard fusion of a
# LEXICAL retriever (q80's BM25 over the fixed query terms) and a DENSE
# retriever (q26's brute cosine against vec_id 0's embedding, doc_id ==
# vec_id — the partially-embedded-corpus case at sf0.1, where only some
# documents carry vectors, is handled by RRF's native treatment of
# missing ranks). RRF(doc) = sum over arms of 1/(K + rank); items absent
# from an arm contribute 0 for that arm. No score normalization needed —
# the whole point of RRF (Cormack et al.'s rank-only fusion).
#
# Scale shape: each arm ends in orderBy().limit(KEACH) — Spark plans a
# TakeOrderedAndProject (per-partition heap + driver merge), never a
# global sort or single-task window; the rank windows then run over the
# <= KEACH-row retained frames (bounded by the fusion depth, not the
# corpus), and the fusion join is KEACH x KEACH at most. Both arm
# orderings round/tie-break exactly like their parent queries (q80:
# round(bm25, 6) DESC, doc_id; q26: raw cosine DESC, vec_id — sequential
# float folds, bit-identical across engines).
# --------------------------------------------------------------------------
Q237_KEACH = 64   # fusion depth per arm
Q237_RRF_K = 60   # the canonical RRF constant
Q237_TOPK = 20
Q237_QUERY_ID = 0  # doc 0 is the query document / query vector


def _q237_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in Q80_TERMS)
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    corpus AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM d),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM d),
    qtok AS (SELECT * FROM tok WHERE t IN ({terms})),
    dft AS (SELECT t, count(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
    tf AS (SELECT doc_id, t, count(*) AS tf, min(dl) AS dl
           FROM qtok GROUP BY 1, 2),
    lexs AS (
        SELECT tf.doc_id,
               round(sum(ln(1 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * ({Q80_K1} + 1)
                   / (tf.tf + {Q80_K1} * (1 - {Q80_B}
                      + {Q80_B} * tf.dl / corpus.avgdl))), 6) AS bm25
        FROM tf JOIN dft USING (t) CROSS JOIN corpus
        WHERE tf.doc_id <> {Q237_QUERY_ID}
        GROUP BY 1),
    lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lrk
        FROM (SELECT * FROM lexs ORDER BY bm25 DESC, doc_id LIMIT {Q237_KEACH})),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
          WHERE vec_id = {Q237_QUERY_ID}),
    sims AS (
        SELECT e.vec_id AS doc_id,
               list_sum(list_transform(e.embedding::DOUBLE[], (x, i) -> x * q.qe[i]))
               / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
                  * sqrt(list_sum(list_transform(q.qe, x -> x * x)))) AS sim
        FROM embeddings e, q WHERE e.vec_id <> {Q237_QUERY_ID}),
    den AS (
        SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS drk
        FROM (SELECT * FROM sims ORDER BY sim DESC, doc_id LIMIT {Q237_KEACH})),
    fused AS (
        SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
               coalesce(1.0 / ({Q237_RRF_K} + lex.lrk), 0)
               + coalesce(1.0 / ({Q237_RRF_K} + den.drk), 0) AS rrf,
               lex.lrk, den.drk
        FROM lex FULL JOIN den USING (doc_id))
    SELECT doc_id, round(rrf, 6) AS rrf,
           CAST(lrk AS INT) AS lex_rank, CAST(drk AS INT) AS dense_rank
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {Q237_TOPK}
    """


@register("q237_rrf_hybrid", oracle=_q237_oracle())
def q237_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    # lexical arm — q80's exact scoring, minus its final LIMIT
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    corpus = d.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("w")).alias("avgdl")
    )
    tok = d.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("t")
    ).filter(F.col("t").isin(Q80_TERMS))
    dft = (
        tok.select("doc_id", "t").distinct()
        .groupBy("t").agg(F.count("*").alias("df"))
    )
    tf = tok.groupBy("doc_id", "t").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf * F.col("tf") * (Q80_K1 + 1)
        / (F.col("tf")
           + Q80_K1 * (1 - Q80_B + Q80_B * F.col("dl") / F.col("avgdl")))
    )
    lexs = (
        tf.filter(F.col("doc_id") != Q237_QUERY_ID)
        .join(F.broadcast(dft), "t")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        lexs.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(Q237_KEACH)
        .withColumn("lrk", F.row_number().over(wl))
        .select("doc_id", "lrk")
    )

    # dense arm — q26's brute cosine, truncated at the fusion depth
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == Q237_QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    sims = (
        emb.filter(F.col("vec_id") != Q237_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qvec")).alias("sim"),
        )
    )
    wd = Window.orderBy(F.desc("sim"), F.asc("doc_id"))
    den = (
        sims.orderBy(F.desc("sim"), F.asc("doc_id")).limit(Q237_KEACH)
        .withColumn("drk", F.row_number().over(wd))
        .select("doc_id", "drk")
    )

    fused = lex.join(den, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (Q237_RRF_K + F.col("lrk")), F.lit(0.0))
            + F.coalesce(1.0 / (Q237_RRF_K + F.col("drk")), F.lit(0.0))
        ).alias("rrf"),
        F.col("lrk").cast("int").alias("lex_rank"),
        F.col("drk").cast("int").alias("dense_rank"),
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(Q237_TOPK)
        .select("doc_id", F.round("rrf", 6).alias("rrf"),
                "lex_rank", "dense_rank")
    )
