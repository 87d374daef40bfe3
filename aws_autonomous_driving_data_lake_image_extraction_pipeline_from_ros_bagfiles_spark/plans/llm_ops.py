"""Beyond-reference LLM-pipeline queries (SURVEY §7 M6): dedup, similarity
search, text analysis over the documents/embeddings tables.

Oracle strategy: every hash in these operators is md5-over-strings, so the
DuckDB oracles replicate the *exact* pipeline (same signatures, same bands,
same candidates) — even MinHash-LSH is fully oracle-checked, not rows-only.
Long SQL strings are generated programmatically below to stay in lockstep
with the Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import pii as PII
from ..operators import similarity as S
from ..operators import text as T
from ..tables import load
from .registry import materialize, register

# Shared DuckDB CTEs: word tokens, distinct 3-gram shingle lists, exploded
# shingles, set sizes. Mirrors operators.dedup.shingles exactly.
_SHINGLE_CTES = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shl AS (SELECT doc_id,
                   list_distinct(list_filter(
                       list_transform(w, (x, i) -> CASE WHEN i <= len(w) - 2
                           THEN x || ' ' || w[i+1] || ' ' || w[i+2] END),
                       s -> s IS NOT NULL)) AS sh
            FROM toks),
    shx AS (SELECT doc_id, unnest(sh) AS shingle FROM shl),
    sizes AS (SELECT doc_id, len(sh) AS n FROM shl)
"""


# --------------------------------------------------------------------------
# q22 — exact dedup by content fingerprint (hash-groupBy tier).
# --------------------------------------------------------------------------
@register(
    "q22_dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q22_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q23 — exact n-gram Jaccard near-dup pairs (shingle self-join tier), with
# the stop-shingle guard ON: shingles occurring in more than
# Q23_MAX_SHINGLE_FREQ docs are dropped before the self-join. Without the
# cap a shingle in f docs creates f^2/2 candidate rows — quadratic blow-up
# on skewed corpora; with it the join stays ~linear (near-dup clusters are
# small, so their shared shingles survive the cap). Set sizes remain the
# UNCAPPED shingle counts, so jaccard is a lower bound for hot-shingle
# pairs — the standard trade. The oracle mirrors the cap exactly.
# --------------------------------------------------------------------------
Q23_MAX_SHINGLE_FREQ = 50


@register(
    "q23_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTES},
    freq AS (SELECT shingle, count(*) AS f FROM shx GROUP BY 1),
    shj AS (SELECT s.doc_id, s.shingle FROM shx s
            JOIN freq USING (shingle) WHERE f <= {Q23_MAX_SHINGLE_FREQ}),
    inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
        FROM shj a JOIN shj b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON ia = sa.doc_id
    JOIN sizes sb ON ib = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    """,
)
def q23_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=0.2, max_shingle_freq=Q23_MAX_SHINGLE_FREQ
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------------------
# q24 — MinHash + banded LSH near-dup pairs, exact-Jaccard verified.
# The oracle rebuilds the identical 16 md5-min signatures and 4 band keys,
# so candidate generation is checked too — not just the final pairs.
# --------------------------------------------------------------------------
def _sig_cols_sql() -> str:
    """The 16 minhash signature expressions (shared by every oracle
    that replays the Spark minhash family — twin of dedup.minhash_table)."""
    p = D.MERSENNE_P
    return ",\n                   ".join(
        "list_min(list_transform(hs, h -> ({a} * h + {b}) % {p})) AS s{i}".format(
            a=D.minhash_params(i)[0], b=D.minhash_params(i)[1], p=p, i=i
        )
        for i in range(D.NUM_HASHES)
    )


def _band_selects_sql(bands: int, rows: int) -> str:
    """UNION ALL band-key cut of the sigs CTE for a (bands, rows) plan —
    twin of dedup.bands_from_sig."""
    return "\n        UNION ALL\n        ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(
                f"s{i}" for i in range(b * rows, (b + 1) * rows)
            ),
        )
        for b in range(bands)
    )


def _sig_ctes_sql() -> str:
    """``based`` + ``sigs`` CTEs over ``shl`` — the shared signature
    prefix of :func:`minhash_pair_ctes` and
    :func:`minhash_pair_ctes_adaptive` (the q57/q65 variants
    parameterize their CTE names and keep their own copies).

    ``WHERE len(hs) > 0`` mirrors the Spark side's explode
    (dedup.minhash_table): a doc with no shingles (<3 tokens) produces
    no (id, hash) rows there, so it never reaches the signature, band,
    or flood-probe tables. Without the filter, DuckDB would emit an
    all-NULL signature row per such doc (list_min([]) is NULL), whose
    NULL band keys can never JOIN (so candidates agree) but DO land in
    the adaptive flood probe's per-band NULL bucket — on a corpus with
    many empty/short docs the two probes would disagree on the plan
    choice and break the q204 hash gate."""
    p = D.MERSENNE_P
    return f"""based AS (SELECT doc_id,
                     list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {p}) AS hs
              FROM shl),
    sigs AS (SELECT doc_id,
                   {_sig_cols_sql()}
             FROM based
             WHERE len(hs) > 0)"""


def _verify_tail_sql(threshold: float) -> str:
    """``inter`` + ``mh_pairs`` CTEs — the exact-Jaccard verify over a
    ``cand(id_a, id_b)`` CTE, shared by the plain and adaptive pair
    pipelines. ``jaccard`` is the UNROUNDED exact ratio; consumers
    round for display."""
    return f"""inter AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM cand c
        JOIN shx a ON a.doc_id = c.id_a
        JOIN shx b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    mh_pairs AS (
        SELECT i.id_a, i.id_b,
               i.c * 1.0 / (sa.n + sb.n - i.c) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.id_a = sa.doc_id
        JOIN sizes sb ON i.id_b = sb.doc_id
        WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {threshold}
    )"""


def minhash_pair_ctes(
    threshold: float,
    bands: int | None = None,
    rows: int | None = None,
    max_bucket: int | None = None,
) -> str:
    """Composable WITH-body ending in ``mh_pairs(id_a, id_b, jaccard)`` —
    the banded-LSH-candidates + exact-Jaccard-verify pipeline (q24's
    machinery). Shared by q24/q68/q87/q89 here and, since r5, by the
    cluster-resolution consumers (q54/q157/q172), for which this recipe
    replaced the raw shingle-inverted-index pair join: band-bucket
    candidate counts stay ~linear as the corpus grows, while the fixed
    3-gram vocabulary made inverted-index pair counts quadratic (the r4
    scale audit's fixed-block family). ``jaccard`` is the UNROUNDED exact
    ratio; consumers round for display.

    ``bands``/``rows`` override the default 4x4 plan (must multiply to
    NUM_HASHES) — the oracle twin of dedup.minhash_bands_param, used by
    q204's threshold-tuned banding. ``max_bucket`` applies the q68
    stop-bucket guard to candidate generation (the r5 sf10 audit showed
    the guard is what keeps candidates LINEAR when corpus density rises:
    capped buckets contribute <= bands*(cap-1)/2 pairs PER DOC, a hard
    linear bound independent of how degenerate the corpus is)."""
    bands = D.BANDS if bands is None else bands
    rows = D.ROWS_PER_BAND if rows is None else rows
    if bands * rows != D.NUM_HASHES:
        # explicit raise, not assert: asserts vanish under `python -O`,
        # which would silently emit a wrong-banded oracle (ADVICE r5);
        # matches the Spark twin dedup.minhash_bands_param's contract
        raise ValueError(
            f"bands*rows must be {D.NUM_HASHES}, got {bands}x{rows}"
        )
    band_selects = _band_selects_sql(bands, rows)
    if max_bucket is None:
        # NOTE: this exact cand text is the splice target of
        # _minhash_capped_oracle (q68) — keep it byte-stable
        cand_ctes = """cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),"""
    else:
        cand_ctes = f"""bfreq AS (SELECT band, band_key FROM bands
              GROUP BY 1, 2 HAVING count(*) <= {max_bucket}),
    jbands AS (SELECT b.* FROM bands b JOIN bfreq USING (band, band_key)),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM jbands a JOIN jbands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),"""
    return f"""{_SHINGLE_CTES},
    {_sig_ctes_sql()},
    bands AS (
        {band_selects}
    ),
    {cand_ctes}
    {_verify_tail_sql(threshold)}"""


def closure_ctes() -> str:
    """edges/closure/comp CTEs: transitive closure of ``mh_pairs`` into a
    min-id cluster assignment (comp: doc_id -> cluster_id, pair-touched
    docs only). Requires a ``WITH RECURSIVE`` prefix and a preceding
    ``mh_pairs`` CTE (minhash_pair_ctes). Shared by q54/q157/q203 — the
    cluster definition exists once; the Spark twin is
    operators/components.py (connected_components / assign_clusters).
    """
    return """edges AS (SELECT id_a AS u, id_b AS v FROM mh_pairs
              UNION SELECT id_b, id_a FROM mh_pairs),
    closure(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT c.u, e.v FROM closure c JOIN edges e ON c.v = e.u
    ),
    comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
             FROM closure GROUP BY u)"""


def _minhash_oracle() -> str:
    return f"""
    WITH {minhash_pair_ctes(0.2)}
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard
    FROM mh_pairs
    """


@register("q24_minhash_lsh", oracle=_minhash_oracle())
def q24_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session-shared UNCAPPED 0.2 pair table: q24/q91/q201 all consume
    # this exact pair set (q91/q201 are documented as operating on q24's
    # pairs) — computed once per session, served checkpointed; cache
    # hygiene lives inside the family helper
    from ..operators.components import family_pairs_uncapped

    pairs = family_pairs_uncapped(spark, sf_dir, threshold=0.2)
    out = pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    return materialize(out)


# --------------------------------------------------------------------------
# q68 — MinHash LSH with the STOP-BUCKET guard binding (ROADMAP #11): band
# buckets holding more than Q68_MAX_BUCKET docs are dropped before the
# self-join — the guard that keeps candidate generation linear when a
# boilerplate/template cluster (or adversarial corpus) floods one bucket
# with f docs and f^2/2 pairs. Cap=2 BINDS on this corpus (result differs
# from q24), so the hash-match proves the guard executes, bucket counts
# and all, not merely that it is plumbed through.
# --------------------------------------------------------------------------
Q68_MAX_BUCKET = 2


def _minhash_capped_oracle() -> str:
    base = _minhash_oracle()
    out = base.replace(
        """cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),""",
        f"""bfreq AS (SELECT band, band_key FROM bands
              GROUP BY 1, 2 HAVING count(*) <= {Q68_MAX_BUCKET}),
    jbands AS (SELECT b.* FROM bands b JOIN bfreq USING (band, band_key)),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM jbands a JOIN jbands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),""",
    )
    if out == base:
        # explicit raise, not assert (stripped under `python -O` — the
        # ADVICE-r5 rule at minhash_pair_ctes): a silent splice no-op
        # would hand q68 the UNCAPPED q24 oracle
        raise ValueError(
            "cap splice failed: cand CTE text drifted from _minhash_oracle"
        )
    return out


@register("q68_minhash_lsh_capped", oracle=_minhash_capped_oracle())
def q68_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # band keys recut from the session-shared signature table (the
    # stored-index contract — no corpus re-hash; see family_signatures)
    from ..operators.components import family_default_bands

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs,
        threshold=0.2,
        max_bucket_size=Q68_MAX_BUCKET,
        bands=family_default_bands(spark, sf_dir),
    )
    out = pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    result = materialize(out)
    D.release_caches()
    return result


# --------------------------------------------------------------------------
# q87 — MinHash LSH with BLOCKED (salted) candidate generation (ROADMAP
# #11 endgame): instead of dropping hot band buckets (q68's cap), bucket
# members are blocked and the self-join key carries (block_a, block_b),
# so no task ever emits more than block_size² pairs. The oracle is q24's
# — bit-identical output proves the salted join is a pure physical
# rewrite of the plain bucket self-join.
# --------------------------------------------------------------------------
Q87_BLOCK = 4


@register("q87_salted_lsh", oracle=_minhash_oracle())
def q87_salted_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import family_default_bands

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs_salted(
        docs,
        threshold=0.2,
        block_size=Q87_BLOCK,
        bands=family_default_bands(spark, sf_dir),
    )
    out = pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    result = materialize(out)
    D.release_caches()
    return result


# --------------------------------------------------------------------------
# q89 — LSH over a PERSISTED signature index (ROADMAP #12): the wide
# (doc_id, bk0..bk3) index — the same shape the streaming ingest stores
# with its corpus — is written to parquet once, read back, and candidate
# generation runs as a READ-ONLY join over the stored band keys; no
# document is re-tokenized or re-hashed. Only the exact-Jaccard verify touches text, and only for
# candidates. Same oracle as q24: the persisted path is bit-identical.
# --------------------------------------------------------------------------
@register("q89_persisted_lsh_index", oracle=_minhash_oracle())
def q89_persisted_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.components import family_signatures

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="lsh_index_")
    try:
        # build + persist the index once (production: at ingest,
        # q65-style); the band keys are cut from the session-shared
        # signature table — same md5 slices, no corpus re-hash
        D.band_cols_from_sig(
            family_signatures(spark, sf_dir)
        ).write.mode("overwrite").parquet(f"{work}/index")
        # query time: stored band keys only — no re-hashing
        persisted = D.bands_long(spark.read.parquet(f"{work}/index"))
        pairs = D.minhash_lsh_pairs(docs, threshold=0.2, bands=persisted)
        out = pairs.select(
            "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
        )
        result = materialize(out)
        D.release_caches()
        return result
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q57 — CROSS-corpus near-dup join (incremental-ingest dedup): new batch
# (doc_id % 3 = 0) against existing corpus (the rest). Same LSH machinery
# as q24 but left-right instead of self-join; the oracle rebuilds both
# sides' signatures and band keys.
# --------------------------------------------------------------------------
def _minhash_side_ctes(side: str, where: str) -> str:
    p = D.MERSENNE_P
    sig_cols = ", ".join(
        "list_min(list_transform(hs, h -> ({a} * h + {b}) % {p})) AS s{i}".format(
            a=D.minhash_params(i)[0], b=D.minhash_params(i)[1], p=p, i=i
        )
        for i in range(D.NUM_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM {side}_sigs".format(
            b=b,
            side=side,
            key=" || '|' || ".join(
                f"s{i}" for i in range(b * D.ROWS_PER_BAND, (b + 1) * D.ROWS_PER_BAND)
            ),
        )
        for b in range(D.BANDS)
    )
    return f"""
    {side}_toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE {where}),
    {side}_shl AS (SELECT doc_id,
                   list_distinct(list_filter(
                       list_transform(w, (x, i) -> CASE WHEN i <= len(w) - 2
                           THEN x || ' ' || w[i+1] || ' ' || w[i+2] END),
                       s -> s IS NOT NULL)) AS sh
            FROM {side}_toks),
    {side}_shx AS (SELECT doc_id, unnest(sh) AS shingle FROM {side}_shl),
    {side}_sizes AS (SELECT doc_id, len(sh) AS n FROM {side}_shl),
    {side}_based AS (SELECT doc_id,
                     list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {p}) AS hs
              FROM {side}_shl),
    {side}_sigs AS (SELECT doc_id, {sig_cols} FROM {side}_based),
    {side}_bands AS ({band_selects})
    """


def _minhash_join_oracle() -> str:
    return f"""
    WITH {_minhash_side_ctes("l", "doc_id % 3 = 0")},
    {_minhash_side_ctes("r", "doc_id % 3 <> 0")},
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM l_bands a JOIN r_bands b ON a.band = b.band AND a.band_key = b.band_key
    ),
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM cand c
        JOIN l_shx a ON a.doc_id = c.id_a
        JOIN r_shx b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           round(i.c * 1.0 / (sa.n + sb.n - i.c), 6) AS jaccard
    FROM inter i
    JOIN l_sizes sa ON i.id_a = sa.doc_id
    JOIN r_sizes sb ON i.id_b = sb.doc_id
    WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.2
    """


@register("q57_minhash_cross_join", oracle=_minhash_join_oracle())
def q57_minhash_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    pairs = D.minhash_lsh_join(new_batch, corpus, threshold=0.2)
    out = pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    result = materialize(out)
    D.release_caches()  # only this module's caches — not the whole session
    return result


# --------------------------------------------------------------------------
# q25 — 32-bit SimHash fingerprints (md5-nibble-MSB votes).
# --------------------------------------------------------------------------
def _simhash_oracle() -> str:
    bit_exprs = " || ".join(
        "(CASE WHEN list_sum(list_transform(md5s, m -> CASE WHEN substr(m, {j}, 1) IN "
        "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END)".format(j=j)
        for j in range(1, 33)
    )
    return f"""
    WITH md5d AS (
        SELECT doc_id, list_transform(string_split(text, ' '), t -> md5(t)) AS md5s
        FROM documents
    )
    SELECT doc_id, {bit_exprs} AS simhash
    FROM md5d
    """


@register("q25_simhash", oracle=_simhash_oracle())
def q25_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", D.simhash32("text").alias("simhash"))


# --------------------------------------------------------------------------
# q26 — brute-force cosine top-k (ANN baseline): 5 nearest neighbors of
# vec_id=0. Query side broadcast; corpus scanned once; global top-k runs as
# TakeOrderedAndProject (per-partition heap + driver merge), not a sort.
# --------------------------------------------------------------------------
@register(
    "q26_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    sims AS (
        SELECT e.vec_id,
               list_sum(list_transform(e.embedding::DOUBLE[], (x, i) -> x * q.qe[i]))
               / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
                  * sqrt(list_sum(list_transform(q.qe, x -> x * x)))) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, round(sim, 6) AS cosine
    FROM sims ORDER BY sim DESC, vec_id LIMIT 5
    """,
)
def q26_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    corpus = emb.filter(F.col("vec_id") != 0)
    topk = S.cosine_topk(corpus, query, k=5)
    return topk.select("vec_id", F.round("sim", 6).alias("cosine"))


# --------------------------------------------------------------------------
# q27 — bucket-pruned ANN (IVF coarse cell = label column): top-3 within
# the query's bucket only. With bucket-partitioned storage this becomes a
# partition-pruned scan — the similarity-at-scale path.
# --------------------------------------------------------------------------
@register(
    "q27_ann_bucketed",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe, label AS qbucket
               FROM embeddings WHERE vec_id = 0),
    sims AS (
        SELECT e.vec_id,
               list_sum(list_transform(e.embedding::DOUBLE[], (x, i) -> x * q.qe[i]))
               / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
                  * sqrt(list_sum(list_transform(q.qe, x -> x * x)))) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0 AND e.label = q.qbucket
    )
    SELECT vec_id, round(sim, 6) AS cosine
    FROM sims ORDER BY sim DESC, vec_id LIMIT 3
    """,
)
def q27_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("label").alias("qbucket")
    )
    corpus = emb.filter(F.col("vec_id") != 0)
    topk = S.bucketed_topk(corpus, query, k=3)
    return topk.select("vec_id", F.round("sim", 6).alias("cosine"))


# --------------------------------------------------------------------------
# q28 — per-doc quality stats (token count, mean token length, TTR).
# --------------------------------------------------------------------------
@register(
    "q28_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_token_len,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS type_token_ratio
    FROM documents
    """,
)
def q28_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.text_stats(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q29 — language ID by stopword voting (argmax, alphabetical tie-break).
# --------------------------------------------------------------------------
def _lang_oracle() -> str:
    score = {
        lang: "len(list_filter(string_split(text, ' '), t -> t IN ({})))".format(
            ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in T.LANG_KEYWORDS.items()
    }
    mx = "greatest({})".format(", ".join(score.values()))
    case = "CASE " + " ".join(
        f"WHEN {score[lang]} = {mx} THEN '{lang}'" for lang in sorted(score)
    ) + " END"
    return f"""
    SELECT doc_id, lang,
           {case} AS pred_lang,
           CAST({case} = lang AS INT) AS is_correct
    FROM documents
    """


@register("q29_lang_id", oracle=_lang_oracle())
def q29_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pred = T.lang_id(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("is_correct"),
    )


# --------------------------------------------------------------------------
# q30 — regex token counting rolled up per source.
# --------------------------------------------------------------------------
@register(
    "q30_token_count",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '{T.TOKEN_REGEX}'))) AS BIGINT) AS total_tokens,
           CAST(max(len(regexp_extract_all(text, '{T.TOKEN_REGEX}'))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY 1
    """,
)
def q30_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tc = T.token_count(F.col("text"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(tc).cast("bigint").alias("total_tokens"),
        F.max(tc).cast("bigint").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# q65 — streaming dedup ingest END-TO-END (the capstone composition,
# streaming/dedup_ingest.py): three mtime-ordered document batches
# (doc_id % 3 = 0, 1, 2) arrive one micro-batch each through a checkpointed
# file source; each batch is admitted only where novel under the tiered
# check (exact-within-batch -> exact-vs-corpus fingerprint -> intra-batch
# LSH -> cross-corpus LSH), and survivors land under batch=<id> partitions.
#
# The oracle replays the SAME sequential admission in chained CTEs. The key
# observation that makes this SQL-expressible: band collision and verified
# Jaccard are PAIRWISE properties of two documents' texts, independent of
# batch membership — so one global verified-near-dup relation ``np`` (both
# directions) computed once over all documents, restricted per tier by
# membership predicates, reproduces exactly what the engine's per-batch LSH
# runs see. Admission is deliberately NOT transitive-closure (a doc dropped
# for resembling an already-dropped doc stays dropped) — the oracle mirrors
# the engine's keep-min anti-join semantics, not connected components.
# --------------------------------------------------------------------------
INGEST_THRESHOLD = 0.5
_INGEST_BATCHES = 3


def _ingest_oracle() -> str:
    p = D.MERSENNE_P
    sig_cols = ", ".join(
        "list_min(list_transform(hs, h -> ({a} * h + {b}) % {p})) AS s{i}".format(
            a=D.minhash_params(i)[0], b=D.minhash_params(i)[1], p=p, i=i
        )
        for i in range(D.NUM_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(
                f"s{i}" for i in range(b * D.ROWS_PER_BAND, (b + 1) * D.ROWS_PER_BAND)
            ),
        )
        for b in range(D.BANDS)
    )

    def batch_ctes(i: int) -> str:
        prior = [f"n{j}" for j in range(i)]
        ek = f"ek{i} AS (SELECT min(doc_id) AS doc_id, fp FROM fps WHERE b = {i} GROUP BY fp)"
        if prior:
            cor_fp = " UNION ALL ".join(f"SELECT fp FROM {c}" for c in prior)
            ff = f"ff{i} AS (SELECT doc_id, fp FROM ek{i} WHERE fp NOT IN ({cor_fp}))"
        else:
            ff = f"ff{i} AS (SELECT doc_id, fp FROM ek{i})"
        ib = (
            f"ib{i} AS (SELECT d.doc_id, d.fp FROM ff{i} d WHERE NOT EXISTS ("
            f"SELECT 1 FROM np JOIN ff{i} a ON np.x = a.doc_id "
            f"WHERE np.y = d.doc_id AND a.doc_id < d.doc_id))"
        )
        if prior:
            cor_id = " UNION ALL ".join(f"SELECT doc_id FROM {c}" for c in prior)
            nv = (
                f"n{i} AS (SELECT d.doc_id, d.fp FROM ib{i} d WHERE NOT EXISTS ("
                f"SELECT 1 FROM np WHERE np.x = d.doc_id AND np.y IN ({cor_id})))"
            )
        else:
            nv = f"n{i} AS (SELECT doc_id, fp FROM ib{i})"
        return ",\n    ".join([ek, ff, ib, nv])

    chain = ",\n    ".join(batch_ctes(i) for i in range(_INGEST_BATCHES))
    final = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS batch FROM n{i}" for i in range(_INGEST_BATCHES)
    )
    return f"""
    WITH {_SHINGLE_CTES},
    based AS (SELECT doc_id,
                     list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {p}) AS hs
              FROM shl),
    sigs AS (SELECT doc_id, {sig_cols} FROM based),
    bands AS ({band_selects}),
    vcand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),
    vinter AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM vcand c
        JOIN shx a ON a.doc_id = c.id_a
        JOIN shx b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    vp AS (
        SELECT i.id_a, i.id_b
        FROM vinter i
        JOIN sizes sa ON i.id_a = sa.doc_id
        JOIN sizes sb ON i.id_b = sb.doc_id
        WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {INGEST_THRESHOLD}
    ),
    np AS (SELECT id_a AS x, id_b AS y FROM vp
           UNION ALL SELECT id_b AS x, id_a AS y FROM vp),
    fps AS (SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
                   doc_id % {_INGEST_BATCHES} AS b
            FROM documents),
    {chain}
    SELECT doc_id, batch FROM ({final})
    """


@register("q65_dedup_ingest", oracle=_ingest_oracle())
def q65_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    from ..streaming.dedup_ingest import run_dedup_ingest
    from ..streaming.staging import stage_sliced_parquet

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="dedup_ingest_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        now = int(time.time())
        # all three arrival files in ONE write job (mtime = arrival
        # order); the ingest's dedup logic is row-order-independent
        stage_sliced_parquet(
            docs,
            F.col("doc_id") % _INGEST_BATCHES,
            [
                (i, f"{src}/b{i}.parquet", now - 60 + i * 10)
                for i in range(_INGEST_BATCHES)
            ],
        )
        run_dedup_ingest(
            spark,
            src,
            docs.schema,
            corpus_dir=f"{work}/corpus",
            checkpoint_dir=f"{work}/ckpt",
            threshold=INGEST_THRESHOLD,
            # one-file micro-batches: size the drain's shuffles to the
            # bounded batch, not the full-corpus session width (the
            # cluster-scale form of this is adaptive=True + AQE coalesce)
            shuffle_partitions=max(
                8, spark.sparkContext.defaultParallelism // 4
            ),
        )
        final = spark.read.parquet(f"{work}/corpus").select(
            "doc_id", F.col("batch").cast("int").alias("batch")
        )
        return materialize(final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q31 — fingerprint uniqueness per source (dedup audit rollup).
# --------------------------------------------------------------------------
@register(
    "q31_fingerprint_audit",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(count(DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) AS n_unique
    FROM documents
    GROUP BY 1
    """,
)
def q31_fingerprint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(D.text_fingerprint(F.col("text"))).alias("n_unique"),
    )


# --------------------------------------------------------------------------
# q71 — PII redaction (curation scrub). The synthetic corpus carries no
# real PII, so the query first plants deterministic doc_id-derived PII
# snippets — with the SAME expression in Spark and the oracle — then
# redacts and counts via operators/pii.py. md5 + length of the redacted
# text pin the masking byte-for-byte; the regexes live in the Java/RE2
# common subset so both engines agree. Pure scan-side codegen: no
# shuffle, no UDF — the 100 TB shape for a corpus scrub.
# --------------------------------------------------------------------------
def _pii_injected(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")

    def pad(mod: int, width: int):
        return F.lpad((d % mod).cast("string"), width, "0")

    def maybe(mod: int, col):
        return F.when(d % mod == 0, col).otherwise(F.lit(""))

    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@example.com"),
            maybe(3, F.concat(F.lit(" ssn 123-45-"), pad(10000, 4))),
            maybe(5, F.concat(F.lit(" call 555-"), pad(1000, 3), F.lit("-"), pad(10000, 4))),
            maybe(
                7,
                F.concat(
                    F.lit(" host 10.0."),
                    (d % 256).cast("string"),
                    F.lit("."),
                    (d % 250).cast("string"),
                ),
            ),
            maybe(11, F.concat(F.lit(" card 4111-1111-1111-"), pad(10000, 4))),
        ).alias("text"),
    )


def _pii_oracle() -> str:
    red = "t"
    for _, pat, mask in PII.PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{mask}', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{cat}"
        for cat, pat, _ in PII.PII_PATTERNS
    )
    total = " + ".join(
        f"len(regexp_extract_all(t, '{pat}'))" for _, pat, _ in PII.PII_PATTERNS
    )
    return f"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
                 || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
            || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.'
                 || CAST(doc_id % 256 AS VARCHAR) || '.'
                 || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN ' card 4111-1111-1111-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
               AS t
        FROM documents)
    SELECT doc_id,
           md5({red}) AS red_fp,
           CAST(length({red}) AS BIGINT) AS red_len,
           {counts},
           CAST({total} AS BIGINT) AS n_pii
    FROM injected
    """


@register("q71_pii_redaction", oracle=_pii_oracle())
def q71_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scrubbed = PII.redact_pii(_pii_injected(docs))
    return scrubbed.select(
        "doc_id",
        F.md5("redacted").alias("red_fp"),
        F.length("redacted").cast("bigint").alias("red_len"),
        *[f"n_{cat}" for cat, _, _ in PII.PII_PATTERNS],
        "n_pii",
    )


# --------------------------------------------------------------------------
# q72 — deterministic stratified sampling audit. Both variants of
# operators/sampling.py over the documents table, stratified by lang:
# per-stratum Bernoulli fractions (shuffle-free hash filter) and
# exact-n-per-stratum (WindowGroupLimit top-n). Membership is pinned —
# not just counts — via per-stratum id sums; the oracle rebuilds the
# identical 60-bit md5 hash, thresholds embedded as integer literals
# computed by the same driver-side function.
# --------------------------------------------------------------------------
Q72_FRACTIONS = {"de": 0.25, "en": 0.5}
Q72_DEFAULT_FRACTION = 0.1
Q72_N_PER_STRATUM = 20


def _stratified_oracle() -> str:
    from ..operators.sampling import fraction_threshold

    cases = " ".join(
        f"WHEN '{v}' THEN {fraction_threshold(f)}" for v, f in sorted(Q72_FRACTIONS.items())
    )
    return f"""
    WITH h AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
        FROM documents),
    fs AS (SELECT * FROM h
           WHERE hv < CASE lang {cases} ELSE {fraction_threshold(Q72_DEFAULT_FRACTION)} END),
    ex AS (SELECT * FROM (
               SELECT h.*, row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
               FROM h)
           WHERE rn <= {Q72_N_PER_STRATUM}),
    base AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
    fagg AS (SELECT lang, count(*) AS n_frac, sum(doc_id) AS frac_id_sum FROM fs GROUP BY 1),
    eagg AS (SELECT lang, count(*) AS n_exact, sum(doc_id) AS exact_id_sum FROM ex GROUP BY 1)
    SELECT b.lang, b.n_total,
           CAST(COALESCE(n_frac, 0) AS BIGINT) AS n_frac,
           CAST(COALESCE(frac_id_sum, 0) AS BIGINT) AS frac_id_sum,
           CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(exact_id_sum, 0) AS BIGINT) AS exact_id_sum
    FROM base b LEFT JOIN fagg USING (lang) LEFT JOIN eagg USING (lang)
    """


@register("q72_stratified_sample", oracle=_stratified_oracle())
def q72_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling as SMP

    docs = load(spark, sf_dir, "documents")
    frac = SMP.stratified_sample(
        docs, "lang", Q72_FRACTIONS, Q72_DEFAULT_FRACTION, id_col="doc_id"
    )
    exact = SMP.stratified_sample_exact(docs, "lang", Q72_N_PER_STRATUM, id_col="doc_id")

    base = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    fagg = frac.groupBy("lang").agg(
        F.count("*").alias("n_frac"), F.sum("doc_id").alias("frac_id_sum")
    )
    eagg = exact.groupBy("lang").agg(
        F.count("*").alias("n_exact"), F.sum("doc_id").alias("exact_id_sum")
    )
    out = base.join(fagg, "lang", "left").join(eagg, "lang", "left")
    return out.select(
        "lang",
        "n_total",
        F.coalesce("n_frac", F.lit(0)).cast("bigint").alias("n_frac"),
        F.coalesce("frac_id_sum", F.lit(0)).cast("bigint").alias("frac_id_sum"),
        F.coalesce("n_exact", F.lit(0)).cast("bigint").alias("n_exact"),
        F.coalesce("exact_id_sum", F.lit(0)).cast("bigint").alias("exact_id_sum"),
    )


# --------------------------------------------------------------------------
# q73 — repetition-based quality filter (Gopher-style). Complements q49's
# scalar features with the signals that need per-term multiplicities:
# top-word share, duplicate-word mass, top-2-gram share. The repetitive
# flag compares the UNROUNDED doubles against shared literals — both
# engines do the identical IEEE division, so the flag is exact; the
# reported fractions are rounded for display only. Thresholds were
# chosen to BIND on this corpus (all three fire on some docs).
# --------------------------------------------------------------------------
Q73_TOP_WORD = 0.15
Q73_DUP_WORD = 0.9
Q73_TOP_2GRAM = 0.05


@register(
    "q73_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    wx AS (SELECT doc_id, unnest(w) AS t FROM toks),
    wc AS (SELECT doc_id, t, count(*) AS c FROM wx GROUP BY 1, 2),
    ws AS (SELECT doc_id, sum(c) AS n_tok, max(c) AS top_word_c,
                  sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_word_mass
           FROM wc GROUP BY 1),
    g AS (SELECT doc_id,
                 list_filter(list_transform(w, (x, i) -> CASE WHEN i <= len(w) - 1
                     THEN x || ' ' || w[i+1] END), s -> s IS NOT NULL) AS gl
          FROM toks),
    gx AS (SELECT doc_id, unnest(gl) AS gram FROM g),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM gx GROUP BY 1, 2),
    gs AS (SELECT doc_id, sum(c) AS n_2gram, max(c) AS top_2gram_c FROM gc GROUP BY 1),
    j AS (SELECT ws.doc_id,
                 CAST(n_tok AS BIGINT) AS n_tok,
                 top_word_c * 1.0 / n_tok AS twf,
                 dup_word_mass * 1.0 / n_tok AS dwf,
                 CASE WHEN COALESCE(n_2gram, 0) > 0
                      THEN COALESCE(top_2gram_c, 0) * 1.0 / n_2gram
                      ELSE 0.0 END AS tgf
          FROM ws LEFT JOIN gs ON ws.doc_id = gs.doc_id)
    SELECT doc_id, n_tok,
           round(twf, 6) AS top_word_frac,
           round(dwf, 6) AS dup_word_frac,
           round(tgf, 6) AS top_2gram_frac,
           CAST(twf > {Q73_TOP_WORD} OR dwf > {Q73_DUP_WORD}
                OR tgf > {Q73_TOP_2GRAM} AS INT) AS repetitive
    FROM j
    """,
)
def q73_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    stats = T.repetition_stats(docs)
    rep = (
        (F.col("top_word_frac") > Q73_TOP_WORD)
        | (F.col("dup_word_frac") > Q73_DUP_WORD)
        | (F.col("top_2gram_frac") > Q73_TOP_2GRAM)
    )
    return stats.select(
        "doc_id",
        "n_tok",
        F.round("top_word_frac", 6).alias("top_word_frac"),
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.round("top_2gram_frac", 6).alias("top_2gram_frac"),
        rep.cast("int").alias("repetitive"),
    )


# --------------------------------------------------------------------------
# q74 — benchmark-contamination check (GPT-3 appendix-C style). src0 plays
# the held-out benchmark; every other source is the training corpus. A
# doc is contaminated if it shares a word 4-gram with the benchmark
# (4 binds on this corpus: 3 flags nearly everything, 5 nearly nothing).
# The benchmark's distinct-gram set is broadcast, so the corpus gram
# stream is map-side semi-joined — never shuffled; broadcast asserted in
# tests. n_hits counts occurrences, n_grams_hit distinct leaked grams.
# --------------------------------------------------------------------------
Q74_NGRAM = 4
Q74_BENCH_SOURCE = "src0"


@register(
    "q74_contamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, source,
                 unnest(list_filter(list_transform(w, (x, i) ->
                     CASE WHEN i <= len(w) - {Q74_NGRAM - 1}
                          THEN list_aggregate(w[i:i+{Q74_NGRAM - 1}], 'string_agg', ' ') END),
                     s -> s IS NOT NULL)) AS gram
          FROM toks),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = '{Q74_BENCH_SOURCE}')
    SELECT doc_id,
           count(*) AS n_hits,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_grams_hit
    FROM g
    WHERE source <> '{Q74_BENCH_SOURCE}' AND gram IN (SELECT gram FROM bench)
    GROUP BY 1
    """,
)
def q74_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.contamination import contamination_report

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == Q74_BENCH_SOURCE)
    train = docs.filter(F.col("source") != Q74_BENCH_SOURCE)
    return contamination_report(train, bench, n=Q74_NGRAM)


# --------------------------------------------------------------------------
# q75 — domain-mixture resampling to per-source token budgets (the DoReMi /
# Pile-style "domain reweighting" step). Integer budgets come from
# mixture weights (src2 overweighted so its fraction caps at 1.0 at
# sf0.01 — the least() path executes); per-source keep fraction is
# budget/tokens as ONE int/int IEEE division, so the oracle reproduces
# every threshold bit-for-bit. The corpus filter itself is scan-side
# (no shuffle); only the |sources|-row planning rollup aggregates.
# Membership pinned via id sums, not just counts.
# --------------------------------------------------------------------------
Q75_SOURCES = [f"src{i}" for i in range(20)]
Q75_WEIGHTS = {"src1": 3, "src2": 12}
Q75_DEFAULT_WEIGHT = 1
Q75_TOTAL_BUDGET = 20_000


def _mixture_oracle() -> str:
    from ..operators.sampling import HASH_SPACE, mixture_budgets

    budgets = mixture_budgets(
        Q75_SOURCES, Q75_WEIGHTS, Q75_DEFAULT_WEIGHT, Q75_TOTAL_BUDGET
    )
    bcases = " ".join(f"WHEN '{s}' THEN {b}" for s, b in sorted(budgets.items()))
    bexpr = f"CASE source {bcases} END"
    return f"""
    WITH t AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS tok,
               CAST('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
        FROM documents),
    agg AS (SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_total
            FROM t GROUP BY 1),
    thr AS (SELECT source, n_docs, tok_total,
                   CAST({bexpr} AS BIGINT) AS budget,
                   CAST(floor(least(1.0, {bexpr} / CAST(tok_total AS DOUBLE))
                        * {float(HASH_SPACE)}) AS BIGINT) AS kthr
            FROM agg),
    s AS (SELECT t.source, t.doc_id, t.tok
          FROM t JOIN thr USING (source) WHERE t.hv < kthr),
    sagg AS (SELECT source, count(*) AS n_sampled,
                    CAST(sum(tok) AS BIGINT) AS tok_sampled,
                    CAST(sum(doc_id) AS BIGINT) AS id_sum
             FROM s GROUP BY 1)
    SELECT th.source, th.n_docs, th.tok_total, th.budget,
           CAST(COALESCE(n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(tok_sampled, 0) AS BIGINT) AS tok_sampled,
           CAST(COALESCE(id_sum, 0) AS BIGINT) AS id_sum
    FROM thr th LEFT JOIN sagg USING (source)
    """


@register("q75_domain_mixture", oracle=_mixture_oracle())
def q75_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import mixture_budgets, mixture_sample

    budgets = mixture_budgets(
        Q75_SOURCES, Q75_WEIGHTS, Q75_DEFAULT_WEIGHT, Q75_TOTAL_BUDGET
    )
    docs = load(spark, sf_dir, "documents")
    tok = F.size(F.split(F.col("text"), " "))
    base = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum(tok).alias("tok_total")
    )
    bmap = F.create_map(*[F.lit(x) for kv in sorted(budgets.items()) for x in kv])
    sampled = mixture_sample(docs, budgets).groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.sum(tok).alias("tok_sampled"),
        F.sum("doc_id").alias("id_sum"),
    )
    return (
        base.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("tok_total").cast("bigint").alias("tok_total"),
            bmap[F.col("source")].cast("bigint").alias("budget"),
            F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
            F.coalesce("tok_sampled", F.lit(0)).cast("bigint").alias("tok_sampled"),
            F.coalesce("id_sum", F.lit(0)).cast("bigint").alias("id_sum"),
        )
    )


# --------------------------------------------------------------------------
# q76 — greedy sequence packing into fixed context windows (training-batch
# prep). Packing is sequential within a shard, so the Spark shape is
# groupBy(source).applyInPandas with a per-group linear scan — one
# shuffle, shards pack in parallel. The oracle replays the identical
# greedy recurrence as a DuckDB recursive CTE; every doc's (bin, pos,
# bin_fill) is hash-pinned, not just bin counts.
# --------------------------------------------------------------------------
Q76_CAPACITY = 256


@register(
    "q76_sequence_packing",
    oracle=f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS tok FROM documents),
    ordered AS (
        SELECT source, doc_id, CAST(tok AS BIGINT) AS tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM t),
    packed AS (
        SELECT source, rn, doc_id, tok,
               CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS pos, tok AS bin_fill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.source, o.rn, o.doc_id, o.tok,
               CASE WHEN p.bin_fill + o.tok > {Q76_CAPACITY} THEN p.bin + 1 ELSE p.bin END,
               CASE WHEN p.bin_fill + o.tok > {Q76_CAPACITY} THEN 0 ELSE p.pos + 1 END,
               CASE WHEN p.bin_fill + o.tok > {Q76_CAPACITY} THEN o.tok
                    ELSE p.bin_fill + o.tok END
        FROM packed p JOIN ordered o ON o.source = p.source AND o.rn = p.rn + 1)
    SELECT source, doc_id, tok, bin, pos, bin_fill FROM packed
    """,
)
def q76_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    tok = F.size(F.split(F.col("text"), " "))
    return pack_sequences(
        docs.select("source", "doc_id", tok.alias("tok")), capacity=Q76_CAPACITY
    )


# --------------------------------------------------------------------------
# q77 — int8 embedding quantization audit. Codes use the explicit
# floor(x/scale + 0.5) half-up form so the oracle reproduces them
# bit-for-bit (round() half-even vs half-away varies by engine); floats
# cast to double before arithmetic, error sums fold left-to-right per
# the repo's cross-engine float rule. Output pins per-vector code
# checksums and reconstruction error — a wrong scale, rounding mode, or
# cast order all flip the hash.
# --------------------------------------------------------------------------
@register(
    "q77_int8_quantize",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        FROM embeddings),
    codes AS (
        SELECT vec_id, v, scale,
               CASE WHEN scale > 0
                    THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                    ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qvec
        FROM q)
    SELECT vec_id,
           round(scale, 9) AS scale_r,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           CAST(list_min(qvec) AS BIGINT) AS q_min,
           CAST(list_max(qvec) AS BIGINT) AS q_max,
           round(list_sum(list_transform(list_zip(qvec, v),
                 p -> abs(p[1] * scale - p[2]))) / len(v), 9) AS mae
    FROM codes
    """,
)
def q77_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantize import dequant_error, quantize_int8

    emb = load(spark, sf_dir, "embeddings")
    out = dequant_error(quantize_int8(emb))
    return out.select(
        "vec_id",
        F.round("scale", 9).alias("scale_r"),
        F.aggregate("qvec", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.array_min("qvec").alias("q_min"),
        F.array_max("qvec").alias("q_max"),
        F.round("mae", 9).alias("mae"),
    )


# --------------------------------------------------------------------------
# q78 — two-stage quantized retrieval: int8 shortlist (k*expand) by
# descaled integer dot product, exact float64 cosine rerank. The
# integer dot products are exact in both engines, so shortlist
# membership and final ranking are deterministic; the oracle rebuilds
# normalize -> quantize -> ip -> approx -> shortlist -> rerank with the
# identical expression order.
# --------------------------------------------------------------------------
Q78_K = 5
Q78_EXPAND = 4


@register(
    "q78_quantized_retrieval",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
    nrm AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nr FROM base),
    normed AS (SELECT vec_id,
                      CASE WHEN nr > 0 THEN list_transform(v, x -> x / nr) ELSE v END AS vn
               FROM nrm),
    sc AS (SELECT vec_id, vn,
                  list_max(list_transform(vn, x -> abs(x))) / 127.0 AS scale
           FROM normed),
    codes AS (SELECT vec_id, vn, scale,
                     CASE WHEN scale > 0
                          THEN list_transform(vn, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                          ELSE list_transform(vn, x -> CAST(0 AS BIGINT)) END AS qvec
              FROM sc),
    qside AS (SELECT qvec AS qq, scale AS qs FROM codes WHERE vec_id = 0),
    qraw AS (SELECT v AS qe FROM base WHERE vec_id = 0),
    stage1 AS (
        SELECT c.vec_id, c.vn,
               CAST(list_sum(list_transform(list_zip(c.qvec, q.qq), p -> p[1] * p[2])) AS BIGINT) AS ip,
               CAST(list_sum(list_transform(list_zip(c.qvec, q.qq), p -> p[1] * p[2])) AS DOUBLE)
                   * c.scale * q.qs AS approx
        FROM codes c, qside q
        WHERE c.vec_id <> 0),
    short AS (SELECT * FROM stage1 ORDER BY approx DESC, vec_id LIMIT {Q78_K * Q78_EXPAND}),
    rer AS (
        SELECT s.vec_id, s.ip,
               list_sum(list_transform(list_zip(s.vn, r.qe), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(s.vn, x -> x * x)))
                  * sqrt(list_sum(list_transform(r.qe, x -> x * x)))) AS cos
        FROM short s, qraw r)
    SELECT vec_id, ip, round(cos, 6) AS cos_r
    FROM rer ORDER BY cos DESC, vec_id LIMIT {Q78_K}
    """,
)
def q78_quantized_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantize import quantized_topk

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        "vec_id", F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    out = quantized_topk(corpus, query, k=Q78_K, expand=Q78_EXPAND)
    return out.select("vec_id", "ip", F.round("cos", 6).alias("cos_r"))


# --------------------------------------------------------------------------
# q79 — vocabulary induction + OOV audit (tokenizer prep). Build the
# top-N token vocabulary by corpus frequency (ties break on token so
# the cutoff is deterministic), then score every doc's out-of-vocab
# rate via a BROADCAST membership join on the exploded token stream —
# the corpus is never shuffled by token; only the per-doc rollup and
# the |vocab|-sized wordcount aggregate shuffle. The build-artifact-
# then-apply shape every tokenizer pipeline runs at scale.
# --------------------------------------------------------------------------
Q79_VOCAB_SIZE = 20


@register(
    "q79_vocab_oov",
    oracle=f"""
    WITH wx AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    wc AS (SELECT t, count(*) AS c FROM wx GROUP BY 1),
    vocab AS (SELECT t FROM wc ORDER BY c DESC, t LIMIT {Q79_VOCAB_SIZE}),
    flags AS (
        SELECT doc_id,
               CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END AS oov
        FROM wx)
    SELECT doc_id,
           count(*) AS n_tok,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
    FROM flags GROUP BY 1
    """,
)
def q79_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wx = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    vocab = (
        wx.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(Q79_VOCAB_SIZE)
        .select("t", F.lit(0).alias("in_vocab"))
    )
    flagged = wx.join(F.broadcast(vocab), "t", "left")
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# q91 — PageRank over the near-dup similarity graph (operators/pagerank.py):
# rank the symmetrized q24 LSH pair graph for 3 damped iterations — the
# centrality a dedup pipeline uses to pick each family's CANONICAL doc.
# The iteration count is fixed, so the oracle UNROLLS all three rounds in
# SQL over the identically-rebuilt pair graph: the whole iterative
# computation is hash-checked, not just its shape.
# --------------------------------------------------------------------------
Q91_DAMPING = 0.85
Q91_ITERS = 3


def _pagerank_oracle() -> str:
    p = D.MERSENNE_P
    sig_cols = ", ".join(
        "list_min(list_transform(hs, h -> ({a} * h + {b}) % {p})) AS s{i}".format(
            a=D.minhash_params(i)[0], b=D.minhash_params(i)[1], p=p, i=i
        )
        for i in range(D.NUM_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(
                f"s{i}" for i in range(b * D.ROWS_PER_BAND, (b + 1) * D.ROWS_PER_BAND)
            ),
        )
        for b in range(D.BANDS)
    )
    d = Q91_DAMPING
    rounds = []
    prev = "r0"
    for i in range(1, Q91_ITERS + 1):
        rounds.append(
            f"""c{i} AS (SELECT np.y AS node, sum({prev}.rank / deg.deg) AS mass
           FROM np JOIN {prev} ON np.x = {prev}.node
                   JOIN deg ON np.x = deg.node GROUP BY 1),
    r{i} AS (SELECT nodes.node,
                    (1 - {d}) / nn.n + {d} * coalesce(c{i}.mass, 0) AS rank
             FROM nodes CROSS JOIN nn LEFT JOIN c{i} USING (node))"""
        )
        prev = f"r{i}"
    rounds_sql = ",\n    ".join(rounds)
    return f"""
    WITH {_SHINGLE_CTES},
    based AS (SELECT doc_id,
                     list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {p}) AS hs
              FROM shl),
    sigs AS (SELECT doc_id, {sig_cols} FROM based),
    bands AS ({band_selects}),
    vcand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),
    vinter AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM vcand c
        JOIN shx a ON a.doc_id = c.id_a
        JOIN shx b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    vp AS (
        SELECT i.id_a, i.id_b
        FROM vinter i
        JOIN sizes sa ON i.id_a = sa.doc_id
        JOIN sizes sb ON i.id_b = sb.doc_id
        WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.2
    ),
    np AS (SELECT id_a AS x, id_b AS y FROM vp
           UNION ALL SELECT id_b AS x, id_a AS y FROM vp),
    nodes AS (SELECT DISTINCT x AS node FROM np),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT x AS node, count(*) AS deg FROM np GROUP BY 1),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
    {rounds_sql}
    SELECT node AS doc_id, round(rank, 6) AS rank FROM {prev}
    """


@register("q91_pagerank_neardup", oracle=_pagerank_oracle())
def q91_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    # session-shared pair table (q24's exact pair set — see q24): already
    # an eager localCheckpoint, so every PageRank round references
    # materialized partitions, never the LSH lineage (the same property
    # the previous per-query checkpoint provided; the family helper also
    # carries the audit_round capture and cache hygiene). On a long-lived
    # cluster run pass checkpoint_dir= to pagerank() — reliable
    # checkpoints on shared storage (operators/checkpointing.py).
    from ..operators.components import family_pairs_uncapped

    pairs = family_pairs_uncapped(spark, sf_dir, threshold=0.2).select(
        "id_a", "id_b"
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    ranks = pagerank(edges, damping=Q91_DAMPING, iterations=Q91_ITERS)
    return ranks.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


# --------------------------------------------------------------------------
# q99 — EXACT set-similarity join via prefix filtering (the PPJoin family):
# the deterministic-complete alternative to LSH. Shingles are globally
# ordered rarest-first; a pair with Jaccard >= t MUST share a shingle in
# each side's first n - ceil(t*n) + 1 shingles (pigeonhole), so the
# candidate join indexes only prefixes — and because the ordering is
# rarest-first, hot shingles land OUTSIDE prefixes, which is what keeps
# the join linear without q23's lossy frequency cap. Verify is exact
# Jaccard, candidate-scoped. 100% recall at the threshold (cf. q24/q98,
# whose banding trades recall); the oracle rebuilds the same ordering,
# prefixes, and verify. Threshold 0.8 is the regime prefix filtering is
# built for: prefix length (1-t)·n+1 ≈ 21% of each doc — at t near 0.5
# prefixes approach half the corpus and the filter stops paying.
# --------------------------------------------------------------------------
Q99_T = 0.8
# Exact-rational form of the threshold (round-10 ADVICE): every pruning
# bound below is computed in BIGINT arithmetic from these integers, so a
# pair sitting EXACTLY at the threshold (e.g. 4-of-5 containment,
# J = 4/5) can never be gated differently by double(0.8) > 4/5 rounding
# on one engine. _Q99_TN/_Q99_TD is t as a reduced fraction; alpha's
# denominator is TN+TD because t/(1+t) = TN/(TN+TD).
from fractions import Fraction as _Fraction

_Q99_FRAC = _Fraction(str(Q99_T))
_Q99_TN, _Q99_TD = _Q99_FRAC.numerator, _Q99_FRAC.denominator


@register(
    "q99_ppjoin",
    oracle=f"""
    WITH {_SHINGLE_CTES},
    freq AS (SELECT shingle, count(*) AS f FROM shx GROUP BY 1),
    ordered AS (
        SELECT shx.doc_id, shx.shingle,
               row_number() OVER (PARTITION BY shx.doc_id
                                  ORDER BY freq.f, shx.shingle) AS rn
        FROM shx JOIN freq USING (shingle)),
    prefix AS (
        SELECT o.doc_id, o.shingle
        FROM ordered o JOIN sizes USING (doc_id)
        WHERE o.rn <= sizes.n
              - (({_Q99_TN} * sizes.n + {_Q99_TD - 1}) // {_Q99_TD}) + 1),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN prefix b ON a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM cand c
        JOIN shx a ON a.doc_id = c.id_a
        JOIN shx b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           round(i.c * 1.0 / (sa.n + sb.n - i.c), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.id_a = sa.doc_id
    JOIN sizes sb ON i.id_b = sb.doc_id
    WHERE {_Q99_TD} * i.c >= {_Q99_TN} * (sa.n + sb.n - i.c)
    """,
)
def q99_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = docs.repartition(spark.sparkContext.defaultParallelism)
    sh = D.cache_pinned(D.shingles_long(src))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy("f", "shingle")
    # prefix keeps (rn, n) so the candidate join can apply PPJoin's two
    # EXACT pruning filters below — both are candidate-side only (verify
    # is still exact Jaccard), so the result set and the oracle are
    # untouched; they exist to shrink the verify input (r10: candidates
    # 118k -> ~2k at sf0.1, and verify was 8.8 of the query's 9 s)
    prefix = (
        sh.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(
            # exact-integer ceil(t*n) = (TN*n + TD-1) div TD — no
            # double(0.8) anywhere in the bound (round-10 ADVICE)
            F.col("rn")
            <= F.col("n")
            - F.expr(f"({_Q99_TN} * n + {_Q99_TD - 1}) div {_Q99_TD}")
            + 1
        )
        .select("doc_id", "shingle", "rn", "n")
    )
    na, nb = F.col("a.n"), F.col("b.n")
    ra, rb = F.col("a.rn"), F.col("b.rn")
    # overlap needed for J >= t: inter/(na+nb-inter) >= t  <=>
    # inter >= ceil(t/(1+t) * (na+nb)) = ceil(TN*(na+nb) / (TN+TD)),
    # computed as exact BIGINT (TN*s + TN+TD-1) div (TN+TD) so a pair at
    # the exact threshold is never pruned by float rounding
    _ad = _Q99_TN + _Q99_TD
    alpha = F.expr(f"({_Q99_TN} * (a.n + b.n) + {_ad - 1}) div {_ad}")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        # length filter: a shorter set cannot reach t against a much
        # longer one — |x| >= t*|y| is NECESSARY for J(x,y) >= t;
        # exact-integer form TD*least >= TN*greatest (round-10 ADVICE)
        .filter(_Q99_TD * F.least(na, nb) >= _Q99_TN * F.greatest(na, nb))
        # positional filter: for a shared shingle at ordered positions
        # (ra, rb), overlap <= (min(ra,rb) - 1 common-before bound) + 1
        # + min(remaining suffixes); a pair survives if ANY shared
        # prefix shingle's bound reaches alpha — the first common
        # element (which PPJoin guarantees lies in both prefixes when
        # J >= t) always does, so no true pair is dropped
        .filter(
            F.least(ra, rb) + F.least(na - ra, nb - rb) >= alpha
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # Exact-Jaccard verify on per-doc shingle ARRAYS (r10): regroup the
    # cached shingle rows into one set-array per doc (shingles are
    # per-doc DISTINCT by construction — dedup's set semantics), join
    # the two arrays onto each candidate pair, and take
    # size(array_intersect()) inside codegen. The verify shuffle then
    # carries n_cand compact rows — NOT n_cand x avg_shingles exploded
    # rows (the pair-routed join) and NOT sum_s f_s^2 inverted-index
    # rows (which degenerates to ~all-pairs work on closed-vocabulary
    # corpora where prefixes stay hot: measured 150 s at the synthetic
    # sf1.0, vs ~9 s for this plan). One plan serves both regimes.
    arrs = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shs"))
    out = (
        cand.join(
            arrs.select(F.col("doc_id").alias("id_a"),
                        F.col("shs").alias("sha")), "id_a")
        .join(
            arrs.select(F.col("doc_id").alias("id_b"),
                        F.col("shs").alias("shb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sha", "shb")).alias("i"),
            F.size("sha").alias("na2"),
            F.size("shb").alias("nb2"),
        )
        .withColumn(
            "jaccard",
            F.col("i") / (F.col("na2") + F.col("nb2") - F.col("i")),
        )
        # exact-integer threshold: TD*i >= TN*(union) — mirrors the
        # oracle's integer WHERE, so a pair at exactly J = t passes on
        # both engines regardless of double rounding
        .filter(
            _Q99_TD * F.col("i")
            >= _Q99_TN * (F.col("na2") + F.col("nb2") - F.col("i"))
        )
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    result = materialize(out)
    D.release_caches()
    return result


# --------------------------------------------------------------------------
# q201 — banded-LSH recall evaluation (the audit for r5's default pair
# generator): joins the banded-minhash + verify pair set (mh_pairs, q24's
# recipe — what q54/q157/q172/q197 now run on) against the EXACT
# inverted-index pair set at the same threshold, and reports per-Jaccard-
# bucket recall — the measurement that tells a curation owner what the
# 4x4 band S-curve misses at their threshold (on this corpus: true dups
# sit at J >= 0.8 where recall ~ 1; see BENCH_NOTES round-5).
#
# Scale rule: the reference tier is q23's CAPPED exact join (stop-
# shingle guard at Q23_MAX_SHINGLE_FREQ keeps its inverted index
# near-linear) — the engine's canonical exact tier, so the audit
# compares the two recipes a user actually chooses between. Even so the
# exact tier is EVAL-ONLY: at production scale it runs on a bounded
# audit sample of the corpus (q151's rule); the banded tier under audit
# is the one that runs corpus-wide. Both tiers share one shingle table
# (the oracle's shx CTE / the operator's cached shingles).
# --------------------------------------------------------------------------
def _q201_oracle() -> str:
    return f"""
    WITH {minhash_pair_ctes(0.2)},
    exact_freq AS (SELECT shingle, count(*) AS f FROM shx GROUP BY 1),
    exact_shj AS (SELECT s.doc_id, s.shingle FROM shx s
                  JOIN exact_freq USING (shingle)
                  WHERE f <= {Q23_MAX_SHINGLE_FREQ}),
    exact_inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
        FROM exact_shj a JOIN exact_shj b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    exact_pairs AS (
        SELECT ia, ib, c * 1.0 / (sa.n + sb.n - c) AS j
        FROM exact_inter
        JOIN sizes sa ON ia = sa.doc_id
        JOIN sizes sb ON ib = sb.doc_id
        WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    )
    SELECT round(e.j, 1) AS j_bucket,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_found,
           round(sum(CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS recall
    FROM exact_pairs e
    LEFT JOIN mh_pairs m ON e.ia = m.id_a AND e.ib = m.id_b
    GROUP BY 1
    """


@register("q201_lsh_recall_eval", oracle=_q201_oracle())
def q201_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import family_pairs_uncapped

    docs = load(spark, sf_dir, "documents")
    exact = D.ngram_jaccard_pairs(
        docs, threshold=0.2, max_shingle_freq=Q23_MAX_SHINGLE_FREQ
    )
    # session-shared pair table (q24's exact pair set — see q24)
    found = family_pairs_uncapped(spark, sf_dir, threshold=0.2).select(
        "id_a", "id_b", F.lit(1).alias("hit")
    )
    joined = exact.join(found, ["id_a", "id_b"], "left")
    out = joined.groupBy(F.round("jaccard", 1).alias("j_bucket")).agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_found"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * F.lit(1.0) / F.count("*"),
            6,
        ).alias("recall"),
    )
    result = materialize(out)
    D.release_caches()
    return result


# --------------------------------------------------------------------------
# q204 — threshold-TUNED banded LSH: the default 4x4 banding's S-curve
# midpoint sits at J~0.71 (right for near-identical dup detection); at a
# mid-Jaccard threshold its recall decays steeply — exactly what q201
# measures. The tuning rule (dedup.lsh_band_plan) recuts the SAME 16
# stored signatures into the (bands, rows) plan whose midpoint is
# closest to the query threshold — here t=0.35 -> 8 bands x 2 rows
# (midpoint (1/8)^(1/2) ~ 0.354). No re-hashing: a q89-style persisted
# signature index serves every plan, so switching thresholds is a
# band-key recut, not a corpus pass. Oracle replays the tuned plan.
# --------------------------------------------------------------------------
Q204_THRESHOLD = 0.35


def minhash_pair_ctes_adaptive(threshold: float) -> str:
    """Oracle twin of dedup.lsh_band_plan_adaptive: a WITH-body ending
    in ``mh_pairs`` that computes BOTH the S-curve-ideal banding and its
    wider-rows fallback over the same 16 signatures, measures the ideal
    plan's over-cap bucket-mass fraction, and selects the candidate set
    by the SAME flood rule the Spark side applies (frac > FLOOD_FRAC).
    Both branches stay in the query so the plan CHOICE — not a baked-in
    plan — is what the hash gate certifies: a one-sided change to the
    decision rule or either plan's cut breaks the match."""
    b1, r1 = D.lsh_band_plan(threshold)
    if b1 < 2:
        return minhash_pair_ctes(
            threshold, bands=b1, rows=r1, max_bucket=D.compensated_cap(b1)
        )
    b2, r2 = b1 // 2, r1 * 2
    cap1, cap2 = D.compensated_cap(b1), D.compensated_cap(b2)
    return f"""{_SHINGLE_CTES},
    {_sig_ctes_sql()},
    bands1 AS (
        {_band_selects_sql(b1, r1)}
    ),
    bands2 AS (
        {_band_selects_sql(b2, r2)}
    ),
    flood AS (
        SELECT coalesce(sum(CASE WHEN m > {cap1} THEN m ELSE 0 END), 0) * 1.0
               > {D.FLOOD_FRAC} * coalesce(sum(m), 0) AS f
        FROM (SELECT count(*) AS m FROM bands1 GROUP BY band, band_key)
    ),
    bfreq1 AS (SELECT band, band_key FROM bands1
               GROUP BY 1, 2 HAVING count(*) <= {cap1}),
    jb1 AS (SELECT b.* FROM bands1 b JOIN bfreq1 USING (band, band_key)),
    cand1 AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM jb1 a JOIN jb1 b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),
    bfreq2 AS (SELECT band, band_key FROM bands2
               GROUP BY 1, 2 HAVING count(*) <= {cap2}),
    jb2 AS (SELECT b.* FROM bands2 b JOIN bfreq2 USING (band, band_key)),
    cand2 AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM jb2 a JOIN jb2 b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),
    cand AS (
        SELECT id_a, id_b FROM cand1 WHERE NOT (SELECT f FROM flood)
        UNION ALL
        SELECT id_a, id_b FROM cand2 WHERE (SELECT f FROM flood)
    ),
    {_verify_tail_sql(threshold)}"""


def _q204_oracle() -> str:
    return f"""
    WITH {minhash_pair_ctes_adaptive(Q204_THRESHOLD)}
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard
    FROM mh_pairs
    """


@register("q204_threshold_tuned_lsh", oracle=_q204_oracle())
def q204_threshold_tuned_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuned banding with a degenerate-density fallback: the
    S-curve-ideal plan for t=0.35 is 8 bands x 2 rows, but 2-row band
    keys stop discriminating on dense corpora (the r5/r6 sf10 audit
    measured the capped 8x2 bill AT its linear bound, 426 s, while 4x4
    consumers sat well under theirs). One cheap aggregate over the
    ideal plan's band-key counts (dedup.band_flood_frac) detects that
    regime — over-cap bucket mass 0.0 at sf0.01/0.1 vs ~0.12 at sf10 —
    and recuts the SAME cached 16 signatures to the wider-rows 4x4
    fallback, whose longer keys restore discrimination. The oracle
    replays plan probe, decision rule, and both cuts in SQL, so the
    hash gate certifies the CHOICE, not one baked-in plan."""
    from ..operators.components import family_signatures

    docs = load(spark, sf_dir, "documents")
    # session-shared signature table (already checkpointed): the density
    # probe reads the ideal plan's cut, a fallback recuts it, and the
    # chosen band table feeds the bucket-frequency scan plus both sides
    # of the candidate self-join — every reference reads stored blocks,
    # never the 16-signature minhash pipeline
    sig = family_signatures(spark, sf_dir)
    _b, _r, cap, _frac, bands = D.lsh_band_plan_adaptive(sig, Q204_THRESHOLD)
    pairs = D.minhash_lsh_pairs(
        docs,
        threshold=Q204_THRESHOLD,
        bands=D.cache_pinned(bands),
        max_bucket_size=cap,
    )
    out = pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    result = materialize(out)
    D.release_caches()
    return result
