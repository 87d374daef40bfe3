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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# MinHash geometry: 16 hash functions in 4 bands of 4 rows. With these
# parameters the LSH collision probability is s^4 per band (s = true
# Jaccard), i.e. ~0.9 recall at s=0.8, ~0.2 at s=0.5 — tune bands/rows per
# corpus; candidates are verified with exact Jaccard afterwards anyway.
#
# WHY THE FIXED 4x4 CONSUMERS DON'T ROUTE THROUGH THE ADAPTIVE PLANNER
# (VERDICT r7 #4): the cluster-resolution family (q54/q157/q172/q197/
# q203) deliberately keeps this default plan — its ~0.71 S-curve midpoint
# IS their near-dup cluster definition, and rerouting through
# lsh_band_plan_adaptive would silently change which mid-Jaccard pairs
# cluster. The degenerate-density failure the adaptive probe exists for
# (q204's sf10 flood) is specific to SHORT band keys: a random non-dup
# pair collides in a band with probability ~s^rows, so 2-row keys (8x2)
# flood once corpus-wide shingle similarity rises, while 4-row keys need
# a 4-way coincidence — measured band_flood_frac of the 4x4 cut is 0.0
# at every SF probed (0.01 / 0.1 / 1.0 / 10; round-7/8 receipts in
# BENCH_NOTES) versus ~0.12 for 8x2 at sf10. Invariant, pinned by
# tests/test_operators.py::test_default_banding_never_floods: the
# adaptive decision rule, applied to the default plan, CHOOSES the
# default plan. And if a pathological corpus ever did flood 4x4, the
# stop-bucket cap still bounds candidates at BANDS*(cap-1)/2 per doc —
# degradation is bounded recall loss, never a quadratic bill.
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# Caches pinned by this module's operators (bands/shingle tables that are
# read more than once per query). Callers release them with
# :func:`release_caches` — NOT spark.catalog.clearCache(), which would also
# evict caches the embedding application pinned for itself.
_ACTIVE_CACHES: list[DataFrame] = []

# Memoized Column expression trees. A pyspark Column is an IMMUTABLE
# unresolved expression — it holds no DataFrame or session reference, so
# one instance is safely reused across any number of plans in the same
# process. Building these trees is NOT free: each F.* call and operator
# is a Py4J round trip, and the minhash/shingle trees cost thousands of
# round trips (~2 s of pure driver latency per build, r12 profile). A
# per-micro-batch caller (streaming/dedup_ingest.py rebuilds the plan for
# EVERY batch) was paying that per batch — 12 s of a 17 s drain was
# socket round trips. Keys are the free variables of each tree (column
# names / n); the hash-family constants are module-level and fixed.
_EXPR_CACHE: dict[tuple, object] = {}


def _expr_cached(key: tuple, build):
    col = _EXPR_CACHE.get(key)
    if col is None:
        col = build()
        _EXPR_CACHE[key] = col
    return col


def _cached(df: DataFrame) -> DataFrame:
    df = df.cache()
    _ACTIVE_CACHES.append(df)
    return df


def cache_pinned(df: DataFrame) -> DataFrame:
    """Public form of ``_cached`` for plan modules that build their own
    shingle/gram frames read more than once per query (q160/q161):
    pins the frame in this module's registry so ``release_caches()``
    evicts it with the operator-internal caches."""
    return _cached(df)


def release_caches() -> None:
    """Unpersist exactly the DataFrames this module cached, and no others."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def grams_from_tokens(toks: Column, n: int) -> Column:
    """NON-distinct word n-grams from a token-array column — the one
    gram builder (``shingles_from_tokens`` distincts it for dedup;
    text.ngrams_all_from_tokens re-exports it for repetition analysis,
    which needs multiplicity).

    PERF CONTRACT: pass a materialized array ATTRIBUTE (a column produced
    by an earlier projection), never an inline ``split(...)`` expression.
    The gram build references the array ~n times per gram via
    ``element_at``; Catalyst inlines an expression argument into every
    reference, turning gram construction O(len^2) per document — the
    round-4 sf1.0 audit measured 52.6 s vs 1.6 s for the same explode at
    50k docs. ``shingles_long`` below does the two-step projection.

    Guarded so documents shorter than *n* tokens yield an empty array
    (Spark's ``sequence`` would otherwise produce a descending range).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (dedup's set semantics) — see
    :func:`grams_from_tokens` for the builder and its perf contract."""
    return F.array_distinct(grams_from_tokens(toks, n))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (no explode).

    NOTE: inlines the tokenizer into the gram build — fine for one-off
    array use, but exploding callers should go through ``shingles_long``
    (see the perf contract on ``shingles_from_tokens``).
    """
    return shingles_from_tokens(tokens(text), n)


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


# Universal-hash family parameters: h_i(x) = (a_i * x + b_i) mod p over a
# Mersenne prime. One md5 per shingle provides the base integer; the 16
# permutations are then pure arithmetic (16x fewer digests than hashing
# per-permutation). a_i*h < p^2 < 2^62 keeps everything in int64.
# Default stop-bucket cap for cluster-consumer recipes (q54/q157/q172/
# q197/q203/q204): a (band, band_key) bucket larger than this carries
# corpus-density noise, not near-dup signal, and capping it bounds
# candidate generation at bands*(cap-1)/2 pairs PER DOC — a hard linear
# guarantee at any corpus degeneracy (r5 sf10 audit receipt in
# BENCH_NOTES; q68 pins that the guard binds and hash-matches).
DEFAULT_BUCKET_CAP = 32

MERSENNE_P = 2_147_483_647
_A_MULT = 12_582_917
_B_MULT = 31_415_927


def minhash_params(i: int) -> tuple[int, int]:
    return ((i + 1) * _A_MULT) % MERSENNE_P, ((i + 1) * _B_MULT) % MERSENNE_P


def shingle_base_hash(sh: Column) -> Column:
    """array<bigint>: md5 -> first 15 hex chars -> int mod p, per shingle."""
    return F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % F.lit(MERSENNE_P),
    )


def minhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, s0..s{H-1}) signature columns via explode + ONE hash aggregate.

    Catalyst's project-collapsing would otherwise inline the base-hash
    array expression into every per-permutation ``array_min`` (computing
    each shingle digest H times); exploding to (id, base_hash) rows
    materializes each digest exactly once and the H signature mins become
    vectorized aggregates over one shuffle on id.
    """
    toks = df.select(
        F.col(id_col),
        _expr_cached(("toks", text_col), lambda: tokens(F.col(text_col)).alias("__toks")),
    )
    hs = toks.select(
        F.col(id_col),
        _expr_cached(
            ("mh_explode",),
            lambda: F.explode(
                shingle_base_hash(shingles_from_tokens(F.col("__toks")))
            ).alias("h"),
        ),
    )

    def build_aggs():
        aggs = []
        for i in range(NUM_HASHES):
            a, b = minhash_params(i)
            aggs.append(
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"s{i}")
            )
        return aggs

    return hs.groupBy(id_col).agg(*_expr_cached(("mh_aggs",), build_aggs))


def band_cols_from_sig(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, bk0..bk{BANDS-1}) default-plan band keys cut from an EXISTING
    signature frame — a narrow projection, no hashing (the wide sibling
    of :func:`bands_from_sig`; serves cached/persisted signature
    tables)."""
    cols = _expr_cached(
        ("band_cols",),
        lambda: [
            F.md5(
                F.concat_ws(
                    "|", *[f"s{b * ROWS_PER_BAND + i}" for i in range(ROWS_PER_BAND)]
                )
            ).alias(f"bk{b}")
            for b in range(BANDS)
        ],
    )
    return sig.select(F.col(id_col), *cols)


def minhash_band_cols(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, bk0..bk{BANDS-1}) wide band keys — the PERSISTABLE index shape.

    One row per doc makes this storable as plain columns alongside the
    corpus (streaming/dedup_ingest.py persists exactly these), so
    re-checking a grown corpus never re-hashes its text: the signature
    cost is paid once per document at admission."""
    return band_cols_from_sig(minhash_table(df, text_col, id_col), id_col)


def bands_long(wide: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wide (id, bk0..) -> join-ready long (id, band, band_key). Narrow op,
    no hashing — safe to apply to persisted index columns on every read."""
    pos = _expr_cached(
        ("bands_posexplode",),
        lambda: F.posexplode(
            F.array(*[F.col(f"bk{b}") for b in range(BANDS)])
        ).alias("band", "band_key"),
    )
    return wide.select(F.col(id_col), pos)


def minhash_bands(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key) — one row per band, band_key = md5 of the
    band's signature slice. Join-ready for LSH bucketing."""
    return bands_long(minhash_band_cols(df, text_col, id_col), id_col)


def lsh_band_plan(
    threshold: float, n_hashes: int = NUM_HASHES
) -> tuple[int, int]:
    """Pick (bands, rows) with bands*rows == n_hashes whose S-curve
    midpoint (1/bands)^(1/rows) — the Jaccard where a pair's collision
    probability crosses ~50% (Leskovec/Rajaraman/Ullman, MMDS §3.4) —
    sits closest to the target threshold. The default 4x4 banding has
    its midpoint at ~0.71 (the production near-dup regime); lower
    thresholds want wider-flatter plans (0.35 -> 8x2, 0.2 -> 16x1).
    Wider plans hash the SAME 16 signatures, so a stored q89-style
    signature index serves every plan — only the band keys are recut.
    Ties break toward fewer bands (cheaper candidate generation)."""
    best = None
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        mid = (1.0 / b) ** (1.0 / r)
        key = (abs(mid - threshold), b)
        if best is None or key < best[0]:
            best = (key, b, r)
    return best[1], best[2]


# A banding plan is DEGENERATE when its short band keys stop
# discriminating: on a dense/repetitive corpus, random-pair collisions
# (not near-dup signal) fill band buckets past the stop-bucket cap. The
# probe metric is the fraction of (doc, band) rows landing in over-cap
# buckets — 0.0 on healthy corpora at every bench SF, ~0.09-0.12 on the
# degenerate sf1.0/sf10 fixtures (round-7 probe receipts in
# BENCH_NOTES). Above FLOOD_FRAC, the adaptive planner falls back one
# factorization step to wider rows (e.g. 8x2 -> 4x4): longer keys
# restore discrimination at the cost of S-curve recall, which under
# flood the cap was already destroying (over-cap buckets are dropped
# wholesale, so the tuned plan's nominal recall is fiction there).
FLOOD_FRAC = 0.05


def compensated_cap(bands: int) -> int:
    """Stop-bucket cap holding the per-doc candidate bound
    bands*(cap-1)/2 constant across plans, anchored at the default
    BANDS x DEFAULT_BUCKET_CAP: tuning the threshold can never silently
    multiply the verify bill (the r5 sf10 audit measured the
    uncompensated 8x2 plan at 2x the 4x4 verify cost)."""
    return max(2, 1 + (DEFAULT_BUCKET_CAP - 1) * BANDS // bands)


def band_flood_frac(bands_df: DataFrame, cap: int) -> float:
    """One cheap aggregate over band-key counts: the fraction of
    (doc, band) rows that sit in buckets larger than ``cap``. Input is
    the (id, band, band_key) long table; the group-by is map-side
    combinable and the result is a single driver scalar (a plan
    DECISION, not data — O(1) driver memory at any corpus size)."""
    row = (
        bands_df.groupBy("band", "band_key")
        .agg(F.count("*").alias("m"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("m") > cap, F.col("m")).otherwise(0)), F.lit(0)
            ).alias("overmass"),
            F.coalesce(F.sum("m"), F.lit(0)).alias("mass"),
        )
        .collect()[0]
    )
    return (row.overmass / row.mass) if row.mass else 0.0


def lsh_band_plan_adaptive(
    sig: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> tuple[int, int, int, float, DataFrame]:
    """Probe-driven banding: start from :func:`lsh_band_plan`'s S-curve
    ideal, measure its bucket density on THIS corpus, and fall back one
    factorization step to wider rows when the plan is degenerate
    (> FLOOD_FRAC of band rows in over-cap buckets — see FLOOD_FRAC).

    Returns ``(bands, rows, cap, flood_frac, bands_df)`` where
    ``bands_df`` is the (id, band, band_key) table of the CHOSEN plan
    and ``cap`` its :func:`compensated_cap`. ``sig`` should be cached:
    the probe reads the ideal plan's band cut once, and a fallback
    recut is a second narrow projection over the same signatures — no
    corpus re-hash either way. The decision rule is deliberately
    SQL-derivable (counts and a fixed constant) so a DuckDB oracle can
    replay the identical plan choice on the same data."""
    b, r = lsh_band_plan(threshold)
    bands_df = bands_from_sig(sig, b, r, id_col)
    frac = band_flood_frac(bands_df, compensated_cap(b))
    if frac > FLOOD_FRAC and b >= 2 and r * 2 * (b // 2) == NUM_HASHES:
        b, r = b // 2, r * 2
        bands_df = bands_from_sig(sig, b, r, id_col)
    return b, r, compensated_cap(b), frac, bands_df


def bands_from_sig(
    sig: DataFrame, bands: int, rows: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, band_key) cut from an EXISTING signature frame
    (:func:`minhash_table` output, possibly cached/persisted). Band b's
    key is md5 of signature slice [b*rows, (b+1)*rows); bands*rows must
    equal NUM_HASHES. This is the recut primitive: switching (bands,
    rows) plans over a cached/stored signature table costs only this
    narrow projection, never a corpus re-hash."""
    if bands * rows != NUM_HASHES:
        raise ValueError(f"bands*rows must be {NUM_HASHES}, got {bands}x{rows}")
    cols = [
        F.md5(
            F.concat_ws(
                "|", *[f"s{b * rows + i}" for i in range(rows)]
            )
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    wide = sig.select(F.col(id_col), *cols)
    arr = F.array(*[F.col(f"bk{b}") for b in range(bands)])
    return wide.select(F.col(id_col), F.posexplode(arr).alias("band", "band_key"))


def minhash_bands_param(
    df: DataFrame,
    bands: int,
    rows: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_key) under an arbitrary (bands, rows) plan from
    :func:`lsh_band_plan`; hashes signatures from text then delegates to
    :func:`bands_from_sig`."""
    return bands_from_sig(minhash_table(df, text_col, id_col), bands, rows, id_col)


def _attach_jaccard(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    """(id_a, id_b, inter) + per-doc set sizes -> jaccard column."""
    na = sizes.select(F.col(sizes.columns[0]).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(sizes.columns[0]).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )


def _jaccard_on_pairs(
    pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact Jaccard for given candidate (id_a, id_b) pairs.

    The doc table is semi-joined down to candidate docs BEFORE shingle
    construction (LSH candidates are a vanishing fraction of the corpus,
    and building shingles is the expensive interpreted-HOF step — pruning
    must happen below it, which Catalyst cannot do through an explode on
    its own), and the candidate shingle table is cached because the
    intersection join reads it twice.
    """
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    docs_cand = docs.join(F.broadcast(cand_ids), id_col, "left_semi")
    sh_cand = _cached(shingles_long(docs_cand, text_col, id_col))
    sizes = sh_cand.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh_cand.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh_cand.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(pairs), ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return _attach_jaccard(inter, sizes)


def jaccard_on_pairs(
    pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Public form of ``_jaccard_on_pairs`` for plan modules that build
    their own candidate generators (q99's prefix filter): exact Jaccard
    verify over a given (id_a, id_b) candidate frame."""
    return _jaccard_on_pairs(pairs, docs, text_col, id_col)


def shingles_long(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) rows. Tokenizes in its OWN projection so the gram
    build under the explode references a materialized array attribute —
    the O(len) form (see shingles_from_tokens perf contract)."""
    toks = df.select(
        F.col(id_col),
        _expr_cached(("toks", text_col), lambda: tokens(F.col(text_col)).alias("__toks")),
    )
    return toks.select(
        F.col(id_col),
        _expr_cached(
            ("sh_explode", n),
            lambda: F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("shingle"),
        ),
    )


def shingle_arrays(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sh_arr, n_sh) — each doc's DISTINCT shingle set as an array
    column plus its size, two-step projection per the
    shingles_from_tokens perf contract. The array shape serves verifiers
    over BOUNDED candidate doc sets (streaming/dedup_ingest.py): exact
    Jaccard becomes one array_intersect projection per pair instead of
    the explode -> shingle self-join -> count -> two size-joins pipeline
    (~6 fewer stages per micro-batch); the long/explode shape
    (:func:`shingles_long`) remains the right one when the candidate doc
    set is corpus-sized and per-doc arrays would skew task memory."""
    toks = df.select(
        F.col(id_col),
        _expr_cached(("toks", text_col), lambda: tokens(F.col(text_col)).alias("__toks")),
    )
    return toks.select(
        F.col(id_col),
        _expr_cached(
            ("sh_arr", n),
            lambda: shingles_from_tokens(F.col("__toks"), n).alias("sh_arr"),
        ),
    ).select(F.col(id_col), "sh_arr", F.size("sh_arr").alias("n_sh"))


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
    spark = df.sparkSession
    src = df.select(id_col, text_col).repartition(spark.sparkContext.defaultParallelism)
    sh = shingles_long(src, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    joinable = sh
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
        joinable = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "shingle").drop("f")
    a = joinable.select(F.col(id_col).alias("id_a"), "shingle")
    b = joinable.select(F.col(id_col).alias("id_b"), "shingle")
    # shared-shingle counts in ONE join+groupBy pass — no materialized
    # distinct-pair set and no second join back onto the shingle table
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return _attach_jaccard(inter, sizes).filter(F.col("jaccard") >= threshold)


def cap_band_buckets(bands: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop (band, band_key) buckets holding more than *max_bucket_size*
    docs — the LSH analog of q23's stop-shingle guard. A bucket of f docs
    contributes f^2/2 candidate pairs, so one boilerplate/template cluster
    (or an adversarial corpus of near-identical docs) turns the bucketed
    join quadratic; hot buckets carry almost no discriminating signal and
    their members are still guarded by the exact-fingerprint tier and
    their remaining (cold) bands. Cost: one extra aggregate on the tiny
    band table."""
    freq = bands.groupBy("band", "band_key").agg(F.count("*").alias("f"))
    return bands.join(
        freq.filter(F.col("f") <= max_bucket_size), ["band", "band_key"]
    ).drop("f")


def salted_band_pairs(
    bands: DataFrame, block_size: int, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs from the band table with BLOCKED (salted) self-join:
    the straggler-proof alternative to :func:`cap_band_buckets`.

    ``cap_band_buckets`` *drops* hot buckets; this keeps them but bounds
    the work any single task can receive. Bucket members are numbered and
    grouped into blocks of ``block_size``; each side replicates its rows
    across the block pairs it participates in, and the join key becomes
    (band, band_key, block_a, block_b) — so one task emits at most
    block_size² pairs instead of bucket² . Shuffle volume for a bucket of
    n docs is O(n²/block_size) replicated ROWS (vs O(n²) PAIRS landing on
    one task unsalted): same total output, spread over n/block_size tasks.

    Exactly equivalent to the plain bucket self-join with ``id_a < id_b``
    (each ordered pair materializes once: the lower-id side targets the
    higher side's block) — q87's oracle hash-checks that equivalence.
    """
    w = Window.partitionBy("band", "band_key").orderBy(id_col)
    wcnt = Window.partitionBy("band", "band_key")
    rows = bands.select(
        F.col(id_col),
        "band",
        "band_key",
        ((F.row_number().over(w) - 1) / block_size).cast("int").alias("blk"),
        F.ceil(F.count("*").over(wcnt) / block_size).cast("int").alias("nblk"),
    )
    left = rows.select(
        F.col(id_col).alias("id_a"),
        "band",
        "band_key",
        F.col("blk").alias("ba"),
        F.explode(F.sequence(F.col("blk"), F.col("nblk") - 1)).alias("bb"),
    )
    right = rows.select(
        F.col(id_col).alias("id_b"),
        "band",
        "band_key",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ba"),
        F.col("blk").alias("bb"),
    )
    return (
        left.join(right, ["band", "band_key", "ba", "bb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs_salted(
    df: DataFrame,
    threshold: float,
    block_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: DataFrame | None = None,
) -> DataFrame:
    """:func:`minhash_lsh_pairs` with blocked candidate generation — same
    result set, no single-task hot bucket (the adversarial-corpus path).
    ``bands`` serves precomputed/persisted band rows (the q89 stored-index
    contract shared with :func:`minhash_lsh_pairs`)."""
    spark = df.sparkSession
    src = df.select(id_col, text_col).repartition(
        spark.sparkContext.defaultParallelism
    )
    if bands is None:
        bands = _cached(minhash_bands(src, text_col, id_col))
    cand = salted_band_pairs(bands, block_size, id_col)
    return _jaccard_on_pairs(cand, src, text_col, id_col).filter(
        F.col("jaccard") >= threshold
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs: banded-LSH candidates, then exact-Jaccard verify.

    The only joins are (band, band_key) equi-joins and the candidate-scoped
    verify — no all-pairs comparison anywhere, which is what makes this the
    100 TB path.

    The input is repartitioned to the cluster's parallelism before signature
    hashing (a single parquet file would otherwise pin the CPU-heavy md5
    stage to one core), and the bands table — 4 small rows per doc — is
    cached because the bucket self-join would recompute the signatures for
    each side. Callers holding precomputed/persisted band rows pass them as
    ``bands`` to skip the hashing entirely.
    """
    spark = df.sparkSession
    src = df.select(id_col, text_col).repartition(spark.sparkContext.defaultParallelism)
    if bands is None:
        bands = _cached(minhash_bands(src, text_col, id_col))
    if max_bucket_size is not None:
        bands = cap_band_buckets(bands, max_bucket_size)
    left = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    right = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    cand = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _jaccard_on_pairs(cand, src, text_col, id_col).filter(
        F.col("jaccard") >= threshold
    )


def minhash_lsh_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    left_bands: DataFrame | None = None,
    right_bands: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-corpus near-dup join: (left id_a, right id_b, jaccard).

    The incremental-ingest shape of dedup — dedupe a NEW batch (left)
    against the EXISTING corpus (right) without any self-pairing. Same
    banded-LSH candidate generation as :func:`minhash_lsh_pairs`; the
    right side's bands are what a production pipeline precomputes and
    stores alongside the corpus (``right_bands``, see
    streaming/dedup_ingest.py), so only the left (new) side pays
    signature hashing per run.
    """
    spark = left.sparkSession
    par = spark.sparkContext.defaultParallelism
    lsrc = left.select(id_col, text_col).repartition(par)
    rsrc = right.select(id_col, text_col).repartition(par)
    lbands = left_bands if left_bands is not None else _cached(minhash_bands(lsrc, text_col, id_col))
    rbands = right_bands if right_bands is not None else _cached(minhash_bands(rsrc, text_col, id_col))
    if max_bucket_size is not None:
        # a cross bucket of (fl, fr) docs emits fl*fr pairs; cap the
        # COMBINED occupancy so either side's hot bucket trips the guard
        combined = lbands.select("band", "band_key").unionAll(
            rbands.select("band", "band_key")
        )
        ok = (
            combined.groupBy("band", "band_key")
            .agg(F.count("*").alias("f"))
            .filter(F.col("f") <= max_bucket_size)
            .select("band", "band_key")
        )
        lbands = lbands.join(ok, ["band", "band_key"])
        rbands = rbands.join(ok, ["band", "band_key"])
    cand = (
        lbands.select(F.col(id_col).alias("id_a"), "band", "band_key")
        .join(rbands.select(F.col(id_col).alias("id_b"), "band", "band_key"), ["band", "band_key"])
        .select("id_a", "id_b")
        .distinct()
    )
    # verify with exact Jaccard over candidate docs only, sides kept apart
    a_ids = cand.select(F.col("id_a").alias(id_col)).distinct()
    b_ids = cand.select(F.col("id_b").alias(id_col)).distinct()
    sh_a = _cached(shingles_long(lsrc.join(F.broadcast(a_ids), id_col, "left_semi"), text_col, id_col))
    sh_b = _cached(shingles_long(rsrc.join(F.broadcast(b_ids), id_col, "left_semi"), text_col, id_col))
    sizes_a = sh_a.groupBy(id_col).agg(F.count("*").alias("na"))
    sizes_b = sh_b.groupBy(id_col).agg(F.count("*").alias("nb"))
    inter = (
        sh_a.select(F.col(id_col).alias("id_a"), "shingle")
        .join(sh_b.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
        .join(F.broadcast(cand), ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes_a.select(F.col(id_col).alias("id_a"), "na"), "id_a")
        .join(sizes_b.select(F.col(id_col).alias("id_b"), "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(text: Column | str) -> Column:
    """32-bit SimHash as a '0'/'1' string, one bit per md5 nibble MSB.

    Bit j of a token's hash = whether hex digit j of md5(token) has its
    high bit set (digit in 8..f). The fingerprint bit is the sign of the
    +/-1 vote sum over all tokens (multiplicity-weighted). Stays in codegen:
    one md5 per token, 32 array-aggregates per row.

    Pass a column NAME to hit the expression memo; a Column object is
    built fresh every call (ADVICE r12: a Column's repr omits the
    plan-id metadata PySpark attaches to df["col"] references, so
    repr-keyed memo entries could leak one frame's plan-id tag into
    another frame's plan — names can't carry a tag, so only they key
    the cache).
    """
    if not isinstance(text, str):
        return _simhash32_build(text)
    return _expr_cached(
        ("simhash32", text), lambda: _simhash32_build(F.col(text))
    )


def _simhash32_build(text: Column) -> Column:
    # 32 nested folds ≈ a thousand Py4J calls; memoized by NAME above
    md5s = F.transform(tokens(text), lambda t: F.md5(t))

    def _vote(j: int) -> Column:
        return F.aggregate(
            md5s,
            F.lit(0),
            lambda acc, m: acc
            + F.when(F.substring(m, j, 1).isin(*"89abcdef"), 1).otherwise(-1),
        )

    bits = [
        F.when(_vote(j) > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(1, 33)
    ]
    return F.concat(*bits)


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) via explode + one groupBy — the corpus-scale variant.

    The 32 nested array folds of :func:`simhash32` generate deep codegen
    that evaluates each token 32 times inside per-row expressions; at
    corpus scale it is faster to explode to (id, token_md5) rows once and
    let a single hash aggregate compute all 32 bit-votes as vectorized
    conditional sums (identical math, one shuffle on id).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(id_col, F.md5("tok").alias("m"))
    votes = _expr_cached(
        ("simhash_votes",),
        lambda: [
            F.sum(
                F.when(F.substring("m", j, 1).isin(*"89abcdef"), 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(1, 33)
        ],
    )
    agg = toks.groupBy(id_col).agg(*votes)
    bits = _expr_cached(
        ("simhash_bits",),
        lambda: F.concat(
            *[
                F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
                for j in range(1, 33)
            ]
        ),
    )
    return agg.select(F.col(id_col), bits.alias("simhash"))
