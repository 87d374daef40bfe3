"""Deduplication operators for LLM-scale corpora.

Four tiers, cheapest first — on 100 TB you run them in this order and each
tier prunes the candidate space of the next:

1. :func:`exact_dedup` — md5 fingerprint groupBy. One shuffle on a 32-byte
   key (never on the raw text — shuffling document bodies at corpus scale
   is the classic mistake this module avoids).
2. :func:`simhash` — 32-bit near-dup sketch; equal sketches ~ near-dups.
3. :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH join. The
   self-join happens only within (band, band_key) buckets, so the candidate
   set is ~linear in corpus size instead of quadratic.
4. :func:`ngram_jaccard_pairs` — exact shingle-join Jaccard; quadratic in
   the worst case, used to verify LSH candidates or on bounded subsets.

Every hash is derived from ``md5`` over deterministic strings so results
are engine-independent (the DuckDB oracles replicate them bit-for-bit) and
stable across Spark versions — no reliance on ``hash()``/``xxhash64`` whose
seeds are engine-private.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MinHash geometry: 16 hash functions in 4 bands of 4 rows. With these
# parameters the LSH collision probability is s^4 per band (s = true
# Jaccard), i.e. ~0.9 recall at s=0.8, ~0.2 at s=0.5 — tune bands/rows per
# corpus; candidates are verified with exact Jaccard afterwards anyway.
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (no explode).

    Guarded so documents shorter than *n* tokens yield an empty array
    (Spark's ``sequence`` would otherwise produce a descending range).
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(empty)


def text_fingerprint(text: Column) -> Column:
    """Normalization + md5 — the exact-dedup key (lower, collapse spaces)."""
    return F.md5(F.lower(F.regexp_replace(text, "\\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content fingerprint; keep the minimum id as the survivor.

    Returns (fp, keeper_id, n_copies). The shuffle key is the 32-char md5,
    not the document body.
    """
    return (
        df.select(text_fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def minhash_signature(sh: Column, num_hashes: int = NUM_HASHES) -> list[Column]:
    """MinHash over md5 strings: sig_i = min(md5("i:" || shingle)).

    The lexicographic minimum of a cryptographic hash is a valid min-wise
    permutation; computing it per-row with array_min keeps the whole
    signature inside codegen — zero shuffles, zero explodes.

    NB: the per-hash prefix is bound via a closure factory, NOT a lambda
    default argument — PySpark infers higher-order-function arity from the
    Python signature, so ``lambda s, i=i`` would silently become the
    (element, index) binary form.
    """

    def _sig(i: int) -> Column:
        prefix = f"{i}:"
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s))))

    return [_sig(i) for i in range(num_hashes)]


def minhash_bands(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key) — one row per band, band_key = md5 of the
    band's signature slice. Join-ready for LSH bucketing."""
    sh = shingles(F.col(text_col))
    sigs = minhash_signature(sh)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *sigs[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND])).alias(
                    "band_key"
                ),
            )
            for b in range(BANDS)
        ]
    )
    return df.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def _jaccard_on_pairs(pairs: DataFrame, sh_long: DataFrame, id_col: str) -> DataFrame:
    """Exact Jaccard for given (id_a, id_b) pairs from a long shingle table."""
    sizes = sh_long.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh_long.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh_long.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )


def shingles_long(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), F.explode(shingles(F.col(text_col))).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold via shingle self-join.

    ``max_shingle_freq`` drops shingles occurring in more than that many
    docs before the join — the standard stop-shingle guard that keeps the
    candidate blow-up linear on skewed corpora (a shingle in f docs creates
    f^2/2 candidate rows).
    """
    sh = shingles_long(df, text_col, id_col)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
        sh = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "shingle").drop("f")
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _jaccard_on_pairs(pairs, sh, id_col).filter(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs: banded-LSH candidates, then exact-Jaccard verify.

    The only joins are (band, band_key) equi-joins and the candidate-scoped
    verify — no all-pairs comparison anywhere, which is what makes this the
    100 TB path.
    """
    bands = minhash_bands(df, text_col, id_col)
    left = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    right = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    cand = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh = shingles_long(df, text_col, id_col)
    return _jaccard_on_pairs(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


def simhash32(text: Column) -> Column:
    """32-bit SimHash as a '0'/'1' string, one bit per md5 nibble MSB.

    Bit j of a token's hash = whether hex digit j of md5(token) has its
    high bit set (digit in 8..f). The fingerprint bit is the sign of the
    +/-1 vote sum over all tokens (multiplicity-weighted). Stays in codegen:
    one md5 per token, 32 array-aggregates per row.
    """
    md5s = F.transform(tokens(text), lambda t: F.md5(t))

    def _vote(j: int) -> Column:
        return F.aggregate(
            md5s,
            F.lit(0),
            lambda acc, m: acc
            + F.when(F.substring(m, j, 1).isin(*"89abcdef"), 1).otherwise(-1),
        )

    bits = [
        F.when(_vote(j) > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(1, 33)
    ]
    return F.concat(*bits)
