"""Corpus-scaled hyperplane-LSH blocking for embedding similarity graphs.

This is the default block-key recipe for every query that confines a
quadratic pairwise compare to coarse blocks (q42 near-dup pairs, q109
SemDeDup, the q168/q180 similarity-graph edge generation). The r4 scale
audit showed the previous ``label`` block key is a FIXTURE constant: the
block COUNT stayed fixed while the corpus grew, so in-block pair counts
grew quadratically (q42 was 77x wall at 10x data). Here the block count
scales with the corpus instead:

- ``n_block_bits(N)`` picks the smallest signature width ``k`` with
  ``2^k * TARGET_BLOCK >= N`` — expected block size stays in
  ``[TARGET_BLOCK/2, TARGET_BLOCK]`` at ANY corpus size, so in-block
  pair counts are linear in N (the SemDeDup "k ∝ N" regime, and the
  same idea as the trained-IVF q184 tier — but deterministic, so the
  DuckDB oracle can replay the block assignment bit-for-bit).
- Hyperplane signs come from deterministic Rademacher planes
  (coefficients ±1 from md5 parity, the q98 construction) — no RNG
  state, reproducible on any engine.
- ``MAX_BITS`` bounds the width; at 2^MAX_BITS * TARGET_BLOCK rows the
  blocks start growing again. It is a constant to raise with fleet
  size, not an architectural limit (the planes are free; only the
  signature compute grows, linearly).

Two access shapes:

- :func:`band_keys` / :func:`scaled_candidate_pairs` — N_BANDS banded
  keys (pairs colliding in ANY band are candidates): the recall shape
  for near-dup PAIR queries. Candidate verification stays
  candidate-scoped (join embeddings back by id).
- :func:`cell_keys` — ONE cell per vector (band 0's planes): the
  partition shape for SemDeDup-style within-cell dedup, where each
  vector must belong to exactly one cell.

Float discipline: the sign decision uses the same strict left-to-right
float64 fold as :mod:`.similarity` (``aggregate`` / DuckDB ``list_sum``),
so both engines see identical dot products — proven parity (q98).

Reference analog: the reference pipeline has no similarity index at all
(its only "index" is the detections table); this module is part of the
beyond-reference LLM-pipeline tier (SURVEY §2.5).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _expr_cached  # unresolved-expression memo (same policy)
from .dedup import cap_band_buckets  # key-column-agnostic flood guard (re-export)
from .similarity import dot

N_BANDS = 4
# Width ceiling: blocks regrow past 2^MAX_BITS * TARGET_BLOCK rows
# (~4.2M vectors at 16/64) — raise with fleet size; the only cost is
# signature compute, linear in the ceiling (the r5 sf10 audit ran
# 200k vectors at nbits=12 without clamping).
MAX_BITS = 16
TARGET_BLOCK = 64
DIM = 64


def n_block_bits(
    n_rows: int, target: int = TARGET_BLOCK, max_bits: int = MAX_BITS
) -> int:
    """Smallest k in [1, max_bits] with 2^k * target >= n_rows.

    Integer-exact (no float log2), mirrored verbatim by
    :func:`nbits_param_sql` so driver-side Spark and the DuckDB oracle
    can never disagree on the width.
    """
    for k in range(1, max_bits + 1):
        if (1 << k) * target >= n_rows:
            return k
    return max_bits


def plane(band: int, bit: int, dim: int = DIM) -> list[int]:
    """Deterministic Rademacher hyperplane for (band, bit): coefficient d
    is +1 iff the first hex digit of md5("hp:band:bit:d") < 8."""
    return [
        1
        if int(hashlib.md5(f"hp:{band}:{bit}:{d}".encode()).hexdigest()[0], 16) < 8
        else -1
        for d in range(dim)
    ]


def _bit(vec: Column, band: int, bit: int, dim: int) -> Column:
    return (
        F.when(
            dot(vec, F.array(*[F.lit(float(c)) for c in plane(band, bit, dim)]))
            >= 0,
            1,
        )
        .otherwise(0)
        .cast("bigint")
    )


def _prefix_key(vec: Column, band: int, nbits: int, dim: int) -> Column:
    """First-nbits sign prefix of the band's signature as one integer
    (== the MAX_BITS-wide key right-shifted by MAX_BITS - nbits, which is
    how the oracle derives it from a dynamic nbits)."""
    key = F.lit(0).cast("bigint")
    for i in range(nbits):
        key = key + _bit(vec, band, i, dim) * F.lit(1 << (nbits - 1 - i))
    return key


def _dim_guarded(vec: Column, dim: int, keyed: Column) -> Column:
    """Fail LOUDLY on an embedding whose length != the plane width.

    Without the guard a mismatch is silent and catastrophic: zip_with
    pads the shorter side with nulls, x*null poisons the dot fold to
    NULL, every sign bit reads 0 and ALL rows collide in band_key 0 —
    the quadratic blowup this module exists to prevent — while the
    DuckDB oracle's list_sum SKIPS nulls and computes real keys (silent
    parity failure). One size() compare per vector, negligible next to
    the plane dots.
    """
    return F.when(F.size(vec) == dim, keyed).otherwise(
        F.raise_error(
            F.concat(
                F.lit("lsh_blocking: embedding length "),
                F.size(vec).cast("string"),
                F.lit(f" != plane dim {dim}"),
            )
        )
    )


def cell_key_col(
    vec: Column | str, nbits: int, dim: int = DIM
) -> Column:
    """Single-assignment cell id (band 0's nbits-bit sign prefix) as a
    COLUMN — for callers that want the cell as a zero-shuffle projection
    on an existing frame (cf. q109) instead of the (id, cell) frame
    :func:`cell_keys` returns. Pass a column NAME to hit the expression
    memo for the nbits·dim plane-literal tree; a Column object is built
    fresh every call (ADVICE r12: a Column's repr omits plan-id metadata
    on df["col"] references, so repr-keyed entries could leak one
    frame's plan-id tag into another's plan — only names key the cache)."""
    if not isinstance(vec, str):
        return _dim_guarded(vec, dim, _prefix_key(vec, 0, nbits, dim))
    return _expr_cached(
        ("lsh_cell_key", vec, nbits, dim),
        lambda: _dim_guarded(
            F.col(vec), dim, _prefix_key(F.col(vec), 0, nbits, dim)
        ),
    )


def band_keys(
    emb: DataFrame,
    nbits: int,
    n_bands: int = N_BANDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = DIM,
) -> DataFrame:
    """(id, band, band_key) — one row per (vector, band). Narrow output:
    ids and two ints, never the vectors, so the candidate self-join
    shuffles O(N * n_bands) small rows. All bands come from ONE
    projection + posexplode (a per-band select union would scan the
    source n_bands times).

    The key array is memoized (dedup.py's `_expr_cached` policy): the
    tree inlines n_bands·nbits·dim plane-coefficient literals — ~1500+
    Py4J round trips at the defaults — and is fully determined by
    (vec_col, nbits, n_bands, dim); the planes themselves are md5
    constants, so one build serves every banding consumer in the
    process (q42/q98/q200/... at the same width)."""
    keys = _expr_cached(
        ("lsh_band_keys", vec_col, nbits, n_bands, dim),
        lambda: _dim_guarded(
            F.col(vec_col),
            dim,
            F.array(
                *[
                    _prefix_key(F.col(vec_col), b, nbits, dim)
                    for b in range(n_bands)
                ]
            ),
        ),
    )
    return emb.select(
        F.col(id_col), F.posexplode(keys).alias("band", "band_key")
    )


def scaled_candidate_pairs(
    emb: DataFrame,
    nbits: int,
    n_bands: int = N_BANDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = DIM,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b) distinct candidate pairs colliding in >= 1 band.

    In-bucket pair counts are linear in N by the n_block_bits contract;
    verification (exact cosine) is the caller's job and must stay
    candidate-scoped. ``max_bucket_size`` applies the
    :func:`cap_band_buckets` flood guard (None = uncapped, the
    oracle-replayable registry default).

    The band table feeds both sides of a self-join, so it is
    localCheckpoint'd (materialize once, lineage truncated, blocks freed
    by the ContextCleaner when unreferenced — no session-lifetime cache
    to leak across a long bench run). Executor loss would drop blocks;
    for fault-tolerant reruns swap in a reliable checkpoint dir, cf.
    operators/pagerank.py.
    """
    bands = band_keys(emb, nbits, n_bands, vec_col, id_col, dim)
    if max_bucket_size is not None:
        # dedup.cap_band_buckets is key-column-agnostic (groups on
        # band/band_key only); flooded cohorts carry no near-dup signal
        # — see the q68 rationale there
        bands = cap_band_buckets(bands, max_bucket_size)
    bands = bands.localCheckpoint(eager=True)
    cand = (
        bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
        .join(
            bands.select(F.col(id_col).alias("id_b"), "band", "band_key"),
            ["band", "band_key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return cand


def cell_keys(
    emb: DataFrame,
    nbits: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = DIM,
) -> DataFrame:
    """(id, cell) single-assignment cell ids (band 0's planes) — the
    SemDeDup partition shape: ~N / TARGET_BLOCK cells of bounded size."""
    return emb.select(
        F.col(id_col), cell_key_col(vec_col, nbits, dim).alias("cell")
    )


# --------------------------------------------------------------------------
# DuckDB oracle generators. The oracle cannot know N at registration time,
# so it derives nbits dynamically (same integer rule as n_block_bits) and
# right-shifts a full MAX_BITS-wide key down to the prefix.
# --------------------------------------------------------------------------


def _plane_sql(band: int, bit: int, src_vec: str, dim: int) -> str:
    coeffs = ", ".join(str(v) for v in plane(band, bit, dim))
    return (
        f"CASE WHEN list_sum(list_transform({src_vec}::DOUBLE[], "
        f"(x, i) -> x * ([{coeffs}]::DOUBLE[])[i])) >= 0 THEN 1 ELSE 0 END"
    )


def nbits_param_sql(
    table: str = "embeddings",
    target: int = TARGET_BLOCK,
    max_bits: int = MAX_BITS,
) -> str:
    """CTE body for ``lsh_params(nbits)``: smallest k with 2^k*target >= N,
    clamped to max_bits (min(k) over an empty range is NULL -> coalesce)."""
    return f"""
    lsh_n AS (SELECT count(*) AS cnt FROM {table}),
    lsh_params AS (
        SELECT coalesce(
            (SELECT min(k) FROM range(1, {max_bits + 1}) t(k), lsh_n
             WHERE (1::BIGINT << k) * {target} >= lsh_n.cnt),
            {max_bits}) AS nbits
    )"""


def band_keys_sql(
    table: str = "embeddings",
    n_bands: int = N_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
    max_bits: int = MAX_BITS,
    cte_prefix: str = "lsh",
) -> str:
    """CTE body for ``<prefix>_bands(id, band, band_key)`` (requires
    ``lsh_params`` in scope). Full max_bits-wide keys per band, then a
    dynamic right-shift to the nbits prefix. ``cte_prefix`` lets one
    query band two tables (e.g. a new batch vs a stored corpus index)
    without CTE-name collisions."""
    full_keys = []
    for b in range(n_bands):
        bits = " + ".join(
            f"({_plane_sql(b, i, vec_col, dim)}) * {1 << (max_bits - 1 - i)}"
            for i in range(max_bits)
        )
        full_keys.append(f"({bits}) AS fk{b}")
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, "
        f"fk{b} // (1::BIGINT << ({max_bits} - nbits)) AS band_key "
        f"FROM {cte_prefix}_full, lsh_params"
        for b in range(n_bands)
    )
    return f"""
    {cte_prefix}_full AS (SELECT {id_col}, {', '.join(full_keys)} FROM {table}),
    {cte_prefix}_bands AS ({band_rows})"""


def candidate_pairs_sql(id_col: str = "vec_id", cte_prefix: str = "lsh") -> str:
    """CTE body for ``lsh_cand(id_a, id_b)``: self-join over
    ``<prefix>_bands`` with the id_a < id_b orientation. ``cte_prefix``
    mirrors :func:`band_keys_sql` so prefixed band tables can use the
    canonical join instead of hand-rolling it."""
    return f"""
    lsh_cand AS (
        SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
        FROM {cte_prefix}_bands a JOIN {cte_prefix}_bands b
          ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.{id_col} < b.{id_col}
    )"""


def cross_candidate_pairs_sql(
    left_prefix: str, right_prefix: str, id_col: str = "vec_id"
) -> str:
    """CTE body for ``cand(id_a, id_b)``: candidates across TWO band
    tables (a query batch probed against a stored index, the q200 shape)
    — every (left id, right id) colliding in any band, no orientation
    filter (the tables are disjoint by construction)."""
    return f"""
    cand AS (
        SELECT DISTINCT q.{id_col} AS id_a, i.{id_col} AS id_b
        FROM {left_prefix}_bands q JOIN {right_prefix}_bands i
          ON q.band = i.band AND q.band_key = i.band_key
    )"""


def cell_keys_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
    max_bits: int = MAX_BITS,
) -> str:
    """CTE body for ``lsh_cells(id, cell)`` — band 0 single assignment
    (requires ``lsh_params`` in scope)."""
    bits = " + ".join(
        f"({_plane_sql(0, i, vec_col, dim)}) * {1 << (max_bits - 1 - i)}"
        for i in range(max_bits)
    )
    return f"""
    lsh_cell_full AS (SELECT {id_col}, ({bits}) AS fk FROM {table}),
    lsh_cells AS (
        SELECT {id_col}, fk // (1::BIGINT << ({max_bits} - nbits)) AS cell
        FROM lsh_cell_full, lsh_params
    )"""
