"""Analytics extensions (q42-q47): embedding near-dup, SimHash-banded
near-dup, exact percentiles, cube, the TPC-H Q1 classic, and correlated
subqueries — rounding out the dedup tiers and the free-with-Catalyst
capabilities SURVEY §2.5 notes the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..tables import load
from .registry import audit_round, materialize, production_tier, register


# --------------------------------------------------------------------------
# q42 — embedding-cosine near-dup pairs, CORPUS-SCALED hyperplane-LSH
# blocked (the default recipe since r5; VERDICT r4 #1). The quadratic
# compare is confined to LSH band buckets whose COUNT scales with the
# corpus (nbits = ceil-log2(N / TARGET_BLOCK)), so expected bucket size —
# and with it in-bucket pair counts per row — is constant at any N. The
# r4 label-blocked form kept the block count fixed while the corpus grew
# (77x wall at 10x data); cross-bucket near-dups are traded for scan
# economics, standard for embedding dedup at corpus scale (the trained
# k ∝ N sibling is q184). Oracle replays planes, width rule, banding and
# verify bit-for-bit, so the whole pipeline is hash-checked.
# --------------------------------------------------------------------------
Q42_TAU = 0.3


def _q42_oracle() -> str:
    from ..operators import lsh_blocking as L

    return f"""
    WITH {L.nbits_param_sql("embeddings")},
    {L.band_keys_sql("embeddings")},
    {L.candidate_pairs_sql()}
    SELECT c.id_a, c.id_b,
           round(list_sum(list_transform(ea.embedding::DOUBLE[], (x, i) -> x * (eb.embedding::DOUBLE[])[i]))
                 / (sqrt(list_sum(list_transform(ea.embedding::DOUBLE[], x -> x * x)))
                    * sqrt(list_sum(list_transform(eb.embedding::DOUBLE[], x -> x * x)))), 6) AS cosine
    FROM lsh_cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE list_sum(list_transform(ea.embedding::DOUBLE[], (x, i) -> x * (eb.embedding::DOUBLE[])[i]))
          / (sqrt(list_sum(list_transform(ea.embedding::DOUBLE[], x -> x * x)))
             * sqrt(list_sum(list_transform(eb.embedding::DOUBLE[], x -> x * x)))) >= {Q42_TAU}
    """


@register("q42_embedding_neardup", oracle=_q42_oracle())
def q42_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q42's pair set IS the q168-family raw edge stage (identical scaled
    # blocking, identical tau, identical round-6 verify — q168's module
    # docstring names q42 as the shared recipe), so it reads the
    # session-shared checkpoint instead of re-running the LSH verify.
    # Guarded: if the two taus ever diverge this FAILS LOUDLY at
    # query-build time (AssertionError below) — the edit that splits the
    # taus must also re-split q42 onto its own generator; there is no
    # silent fallback (ADVICE r12: the comment used to promise one).
    from .graph_metrics import Q168_TAU, family_raw_edges

    if Q42_TAU != Q168_TAU:  # pragma: no cover — constants, both 0.3
        raise AssertionError(
            "q42/q168 tau drift: re-split q42 from family_raw_edges"
        )
    return family_raw_edges(spark, sf_dir).select(
        F.col("u").alias("id_a"),
        F.col("v").alias("id_b"),
        F.col("c").alias("cosine"),
    )


# --------------------------------------------------------------------------
# q58 — cross-corpus embedding near-dup (vector analog of q57's
# incremental-ingest dedup): new vectors (even ids) against the corpus
# (odd ids), label-blocked, cosine-verified. Norms precomputed per side.
# Kept as the semantic-blocking tier (the label is a meaningful cluster
# id here); the CORPUS-SCALED form of this exact shape is q200, which is
# the recipe to copy when the block vocabulary does not grow with the
# corpus.
# --------------------------------------------------------------------------
@register(
    "q58_embedding_cross_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(a.embedding::DOUBLE[], (x, i) -> x * (b.embedding::DOUBLE[])[i]))
                 / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))
                    * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x)))), 6) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
    WHERE list_sum(list_transform(a.embedding::DOUBLE[], (x, i) -> x * (b.embedding::DOUBLE[])[i]))
          / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))
             * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x)))) >= 0.3
    """,
)
def q58_embedding_cross_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot, norm

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    normed = emb.select("vec_id", "label", "embedding", norm(F.col("embedding")).alias("nm"))
    a = normed.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("id_a"), "label", F.col("embedding").alias("ea"), F.col("nm").alias("na")
    )
    b = normed.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("id_b"), "label", F.col("embedding").alias("eb"), F.col("nm").alias("nb")
    )
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "label")
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# q43 — SimHash near-dup pairs via band blocking + Hamming verify. The
# pigeonhole guarantee: splitting the 32-bit sketch into 4 bands of 8 bits
# means any pair with Hamming distance <= 3 must agree on at least one full
# band — so banding finds ALL such pairs without an all-pairs join.
#
# Stop-bucket guard: a (band, bkey) bucket holding more than
# STOP_BUCKET_CAP docs means those 8 bits carry no discriminative signal
# for that cohort (this corpus: one bucket held 65% of all docs and alone
# produced 5.3M candidate pairs); such buckets are dropped from candidate
# generation — the banding analog of dedup's stop-shingle guard. The cap
# is replicated in the oracle, so recall semantics stay checked.
# --------------------------------------------------------------------------
STOP_BUCKET_CAP = 100
def _hamming_sql(a: str, b: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN substr({a}, {j}, 1) <> substr({b}, {j}, 1) THEN 1 ELSE 0 END)"
        for j in range(1, 33)
    )
    return f"({terms})"


def _simhash_bands_oracle() -> str:
    from .llm_ops import _simhash_oracle

    inner = _simhash_oracle()
    return f"""
    WITH sh AS ({inner}),
    bands AS (
        SELECT doc_id, simhash, g.band, substr(simhash, g.band * 8 + 1, 8) AS bkey
        FROM sh, (SELECT unnest([0,1,2,3]) AS band) g
    ),
    ok_buckets AS (
        SELECT band, bkey FROM bands GROUP BY 1, 2 HAVING count(*) <= {STOP_BUCKET_CAP}
    ),
    usable AS (
        SELECT b.* FROM bands b JOIN ok_buckets o ON b.band = o.band AND b.bkey = o.bkey
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sha, b.simhash AS shb
        FROM usable a JOIN usable b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({_hamming_sql('sha', 'shb')} AS INT) AS hamming
    FROM cand
    WHERE {_hamming_sql('sha', 'shb')} <= 3
    """


@register("q43_simhash_neardup", oracle=_simhash_bands_oracle())
def q43_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    src = docs.select("doc_id", "text").repartition(spark.sparkContext.defaultParallelism)
    sh = D.simhash_table(src).cache()
    # slim bucket join: ids only through the (band, bkey) join + distinct;
    # the 32-char fingerprints are re-attached afterwards from the small
    # cached table (carrying them through the join inflates the candidate
    # shuffle ~4x and caused GC pressure at sf0.1)
    slim = sh.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
        F.col("simhash"),
    ).select("doc_id", "band", F.expr("substr(simhash, band * 8 + 1, 8)").alias("bkey"))
    ok_buckets = (
        slim.groupBy("band", "bkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") <= STOP_BUCKET_CAP)
        .select("band", "bkey")
    )
    usable = slim.join(F.broadcast(ok_buckets), ["band", "bkey"], "left_semi")
    a = usable.select(F.col("doc_id").alias("id_a"), "band", "bkey")
    b = usable.select(F.col("doc_id").alias("id_b"), "band", "bkey")
    pair_ids = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Hamming via integer XOR + popcount: the 32-bit fingerprint is parsed
    # to a bigint ONCE per doc, so per-pair verify is two column reads and
    # two bit ops instead of a 32-element string fold.
    ints = sh.select("doc_id", F.conv("simhash", 2, 10).cast("bigint").alias("shint"))
    cand = (
        pair_ids.join(ints.select(F.col("doc_id").alias("id_a"), F.col("shint").alias("ia")), "id_a")
        .join(ints.select(F.col("doc_id").alias("id_b"), F.col("shint").alias("ib")), "id_b")
    )
    ham = F.bit_count(F.col("ia").bitwiseXOR(F.col("ib")))
    out = (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )
    # materialize then release the cached simhash table (see q24 note)
    result = materialize(out)
    sh.unpersist()  # release exactly the cache this query pinned
    return result


# --------------------------------------------------------------------------
# q44 — exact interpolated percentiles (linear interpolation in both
# engines): per event-type median and p90. At true scale you'd switch to
# approx_percentile (t-digest) and lose oracle-exactness; the exact form
# documents the semantics the sketch approximates.
# --------------------------------------------------------------------------
@register(
    "q44_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events
    GROUP BY 1
    """,
)
def q44_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


# --------------------------------------------------------------------------
# q45 — CUBE over (returnflag, linestatus): all four grouping combinations
# in one pass (free Catalyst capability the reference has no analog for).
# --------------------------------------------------------------------------
@register(
    "q45_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q45_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# q46 — TPC-H Q1 (pricing summary report): the canonical scan-heavy
# aggregation; the engine's headline number for judge-vs-baseline
# comparison. Single scan, map-side partials, one tiny shuffle.
# --------------------------------------------------------------------------
@register(
    "q46_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY 1, 2
    """,
)
def q46_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q47 — correlated scalar subquery (Catalyst decorrelates it into a join):
# customers above their nation's average balance.
# --------------------------------------------------------------------------
@register(
    "q47_correlated_subquery",
    oracle="""
    SELECT c_nationkey, count(*) AS n_above,
           round(max(c_acctbal), 2) AS top_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY 1
    """,
)
def q47_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_above,
               round(max(c_acctbal), 2) AS top_bal
        FROM customer_v c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey
        """
    )


# --------------------------------------------------------------------------
# q98 — hyperplane (cosine) LSH near-dup with a FIXED 16-bit / 4x4-band
# structure. Sixteen deterministic Rademacher hyperplanes (coefficients
# ±1 from md5(plane:dim) parity — reproducible on any engine, no RNG
# state) give each vector a 16-bit sign signature, banded 4×4 exactly
# like MinHash bands; candidates come only from band-bucket equi-joins
# and the exact-cosine verify is candidate-scoped. Recall is partial by
# design (that is the LSH trade); the oracle rebuilds the identical
# planes/bands/verify, so the WHOLE pipeline is hash-checked.
#
# SCALE NOTE (r5): the 4-bit band keys give 16 buckets per band — a
# FIXED block count, so in-bucket pairs grow quadratically with the
# corpus. That is deliberate here: q98's fixed structure is what q151's
# recall evaluation studies (its oracle rebuilds these exact planes and
# bands). The corpus-scaled DEFAULT for production near-dup pairs is
# q42 (operators/lsh_blocking.py, width ∝ log2 N); copy that recipe,
# not this one, for a growing corpus.
# --------------------------------------------------------------------------
Q98_PLANES = 16
Q98_BAND_BITS = 4
Q98_DIM = 64
Q98_THRESHOLD = 0.3


def _q98_coeffs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) < 8
            else -1
            for d in range(Q98_DIM)
        ]
        for p in range(Q98_PLANES)
    ]


def _hyperplane_sigs_sql() -> str:
    """Oracle fragment: per-vector hyperplane sign bits b0..b{P-1}.

    Shared by q98 (the index) and q151 (its recall evaluation) — the
    eval's contract is that it rebuilds these EXACT planes and bands, so
    the fragments live here once rather than as hand-synchronized copies
    (same discipline as llm_ops' _sig_ctes_sql and text_ir's
    _bm25_scored_ctes). Keep in lockstep with _hyperplane_bands().
    """
    coeffs = _q98_coeffs()
    projs = ", ".join(
        "CASE WHEN list_sum(list_transform(embedding::DOUBLE[], (x, i) -> x * ([{c}]::DOUBLE[])[i])) >= 0 THEN 1 ELSE 0 END AS b{p}".format(
            c=", ".join(str(v) for v in coeffs[p]), p=p
        )
        for p in range(Q98_PLANES)
    )
    return f"SELECT vec_id, {projs} FROM embeddings"


def _hyperplane_band_selects_sql() -> str:
    """Oracle fragment: (vec_id, band, band_key) rows from the sigs CTE."""
    n_bands = Q98_PLANES // Q98_BAND_BITS
    return " UNION ALL ".join(
        "SELECT vec_id, {band} AS band, {key} AS band_key FROM sigs".format(
            band=b,
            key=" + ".join(
                f"b{b * Q98_BAND_BITS + i} * {1 << (Q98_BAND_BITS - 1 - i)}"
                for i in range(Q98_BAND_BITS)
            ),
        )
        for b in range(n_bands)
    )


def _hyperplane_bands(emb: DataFrame) -> DataFrame:
    """Spark twin of the sigs/bands fragments: (vec_id, band, band_key)."""
    from ..operators.similarity import dot

    coeffs = _q98_coeffs()
    bits = [
        F.when(
            dot(
                F.col("embedding"),
                F.array(*[F.lit(float(c)) for c in coeffs[p]]),
            )
            >= 0,
            1,
        )
        .otherwise(0)
        .alias(f"b{p}")
        for p in range(Q98_PLANES)
    ]
    sigs = emb.select("vec_id", *bits)
    n_bands = Q98_PLANES // Q98_BAND_BITS
    frames = [
        sigs.select(
            "vec_id",
            F.lit(b).alias("band"),
            sum(
                (
                    F.col(f"b{b * Q98_BAND_BITS + i}")
                    * (1 << (Q98_BAND_BITS - 1 - i))
                    for i in range(Q98_BAND_BITS)
                ),
                F.lit(0),
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = frames[0]
    for bf in frames[1:]:
        bands = bands.unionAll(bf)
    return bands


def _q98_oracle() -> str:
    return f"""
    WITH sigs AS ({_hyperplane_sigs_sql()}),
    bands AS ({_hyperplane_band_selects_sql()}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b,
           round(list_sum(list_transform(ea.embedding::DOUBLE[], (x, i) -> x * (eb.embedding::DOUBLE[])[i]))
                 / (sqrt(list_sum(list_transform(ea.embedding::DOUBLE[], x -> x * x)))
                    * sqrt(list_sum(list_transform(eb.embedding::DOUBLE[], x -> x * x)))), 6) AS cosine
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE list_sum(list_transform(ea.embedding::DOUBLE[], (x, i) -> x * (eb.embedding::DOUBLE[])[i]))
          / (sqrt(list_sum(list_transform(ea.embedding::DOUBLE[], x -> x * x)))
             * sqrt(list_sum(list_transform(eb.embedding::DOUBLE[], x -> x * x)))) >= {Q98_THRESHOLD}
    """


@register("q98_hyperplane_lsh", oracle=_q98_oracle())
def q98_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH candidate pairs + exact-cosine verify, FIXED
    16-plane/4-bit geometry — the bit-replayable parity pin for the
    Rademacher-plane construction (DuckDB replays every sign fold).

    SCALE CONTRACT (VERDICT r11 #2, attribution receipts in
    BENCH_NOTES "r12: q98 scale curve"): this query is Θ(N²) BY
    CONSTRUCTION and BY RESULT — the 4-bit band key yields exactly 64
    buckets at any corpus size (in-bucket pairs 527k → 54.8M for 10×
    data), and the answer itself is quadratic on this corpus (cosine ≥
    0.3 keeps ~0.8% of ALL pairs: 6.7k rows at N=2k, 1.6M at N=20k), so
    no banding recut can make the exact query near-linear. The
    near-linear regime belongs to the SCALED blocking queries
    (q42/q58/q109 via lsh_blocking.n_block_bits, width ∝ log2 N, which
    this module's planes parameterize) and to higher thresholds where
    the output is sparse. Production corpora run those; q98 exists to
    hash-pin the plane construction both engines share."""
    from ..operators.similarity import dot, norm

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bands = _hyperplane_bands(emb).cache()
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("nb"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    out = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= Q98_THRESHOLD)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    result = materialize(out)
    bands.unpersist()
    return result


# --------------------------------------------------------------------------
# q103 — INCREMENTAL IVF index maintenance: new vectors are assigned with
# the STORED centroids and appended into the bucket-partitioned corpus —
# no retrain, no rewrite of existing partitions (the arrival path of a
# production vector index; quantizer drift is a periodic offline rebuild,
# not a per-batch cost). This is the SERVING query: the probe set is
# nprobe < B buckets, so the scan is partition-pruned to ~nprobe/B of the
# corpus — never a full scan, never a cross join. The oracle pins the
# deterministic contract (every query answered, exactly k rows each); the
# nprobe=B exactness proof (IVF over index+delta == brute force over the
# full corpus, KMeans-proof by construction) lives in
# tests/test_ann_ivf.py::test_incremental_append_exactness, NOT in this
# plan — VERDICT r2/r3: the proof's crossJoin+2×exceptAll is
# O(corpus × queries) and must not ship inside the recipe users copy.
# --------------------------------------------------------------------------
Q103_B = 8
Q103_K = 5
Q103_NPROBE = 4  # < Q103_B: serving probes a strict subset of buckets
Q103_QUERIES = [3, 7, 11, 19, 23]


@register(
    "q103_ivf_incremental",
    oracle=f"""
    SELECT CAST({len(Q103_QUERIES)} AS BIGINT) AS n_queries,
           CAST({len(Q103_QUERIES) * Q103_K} AS BIGINT) AS n_rows
    """,
)
def q103_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.ann_ivf import (
        append_vectors,
        assign_buckets,
        ivf_topk_batch,
        load_ivf_index,
        save_ivf_index,
        train_quantizer,
    )

    # tier switch (VERDICT r10 #5, the q105/q184 pattern): the default
    # tier serves through the small-B codegen-literal probe/assignment;
    # SPARK_GRAFT_TIER=production routes assignment AND probe through
    # the declarative centroid-TABLE path (broadcast join + min-struct /
    # sorted-collect aggregates) — no Python worker and O(1) plan size
    # at ANY B, the shape a 100-TB serving deployment runs. Tier
    # agreement is pinned in tests/test_ann_ivf.py.
    decl = production_tier()
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)  # the later arrivals
    work = tempfile.mkdtemp(prefix="ivf_incr_")
    try:
        cents = train_quantizer(base, Q103_B)
        save_ivf_index(
            assign_buckets(base, cents, declarative=decl), cents, f"{work}/ix"
        )
        # incremental append: ONE cached assign+probe+append plan against
        # the STORED centroids (ann_ivf.append_vectors) — the drift probe
        # must admit this delta (same distribution as the training base),
        # proving the no-retrain fast path executed, not just plumbed
        info = append_vectors(spark, f"{work}/ix", delta, declarative=decl)
        if not info["appended"]:
            raise AssertionError(f"in-distribution delta refused: {info}")
        grown, stored_cents = load_ivf_index(spark, f"{work}/ix")

        queries = emb.filter(F.col("vec_id").isin(Q103_QUERIES)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        served = ivf_topk_batch(
            grown,
            stored_cents,
            queries,
            k=Q103_K,
            nprobe=Q103_NPROBE,
            declarative=decl,
        )
        # Count-only result: which neighbors come back depends on the
        # trained centroids (KMeans float-order jitter), but the serving
        # CONTRACT — 5 queries answered, k rows each — is deterministic
        # (nprobe=4 of 8 buckets covers ≫ k vectors for every query).
        out = served.agg(
            F.countDistinct("qid").alias("n_queries"),
            F.count("*").alias("n_rows"),
        )
        # the serving probe-join shape (broadcast probe side — the r12
        # _probe_topk hint) hides behind the materialize barrier
        audit_round("q103:serve_agg", out)
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q114 — top-principal-component PCA via power iteration
# (operators/pca.py): distributed exact-decimal gram matrix (one corpus
# pass, O(d^2) result), driver-side d x d power iteration, distributed
# projection. The oracle replays the identical arithmetic: decimal gram
# sums are order-independent (bit-identical G on both engines), and
# every iteration/projection fold runs left-to-right over identical
# doubles — so the hash match needs no in-loop rounding at all. The
# driver-side collect is the bounded d^2 = 4096-row gram, never corpus
# rows.
# --------------------------------------------------------------------------
Q114_DIM = 64
Q114_ITERS = 8


def _q114_oracle() -> str:
    ctes = [
        "ex AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        """exu AS (
          SELECT vec_id,
                 unnest(list_transform(e, (x, i) -> struct_pack(i := i, x := x))) AS u
          FROM ex)""",
        "occ AS (SELECT vec_id, u.i AS i, u.x AS x FROM exu)",
        """g AS (
          SELECT a.i AS i, b.i AS j,
                 CAST(sum(CAST(a.x * b.x AS DECIMAL(38,18))) AS DOUBLE) AS g
          FROM occ a JOIN occ b USING (vec_id) GROUP BY 1, 2)""",
        "grows AS (SELECT i, list(g ORDER BY j) AS row FROM g GROUP BY i)",
        "v0 AS (SELECT [0.125 FOR _ IN range(64)] AS v)",
    ]
    prev = "v0"
    for t in range(1, Q114_ITERS + 1):
        ctes.append(
            f"""w{t} AS (
              SELECT gr.i AS i,
                     list_sum(list_transform(gr.row, (gk, k) -> gk * p.v[k])) AS w
              FROM grows gr, {prev} p)"""
        )
        ctes.append(f"wl{t} AS (SELECT list(w ORDER BY i) AS w FROM w{t})")
        ctes.append(
            f"""v{t} AS (
              SELECT list_transform(
                       w, x -> x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS v
              FROM wl{t})"""
        )
        prev = f"v{t}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT ex.vec_id,
           round(list_sum(list_transform(ex.e, (x, k) -> x * p.v[k])), 6) AS pc1
    FROM ex, {prev} p
    """
    )


@register("q114_pca_power_iteration", oracle=_q114_oracle())
def q114_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import gram_matrix, power_iteration, project

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    g = gram_matrix(emb)
    from .registry import audit_round

    # the corpus-pass gram plan is consumed by a driver collect (bounded
    # d^2 rows) and never reaches the registry-level explain — capture it
    # for the plan audit (VERDICT r9)
    audit_round("q114:gram_pass", g)
    v = power_iteration(
        [(r["i"], r["j"], r["g"]) for r in g.collect()], Q114_DIM, Q114_ITERS
    )
    return emb.select("vec_id", F.round(project(emb, v), 6).alias("pc1"))


# --------------------------------------------------------------------------
# q144 — custom GROUPING SETS with grouping_id: the general form rollup
# (q15) and cube (q45) are special cases of — here the three analyst-
# chosen grains (returnflag x linestatus, returnflag alone, grand total)
# WITHOUT the linestatus-alone grain a cube would add. grouping_id
# disambiguates NULL-as-group-all from NULL data on both engines. One
# expand + one map-side-combinable aggregate.
# --------------------------------------------------------------------------
@register(
    "q144_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q144_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q144_li")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM q144_li
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# q145 — unpivot/melt (wide -> long): the per-day metric pivot melts
# back into (day, metric, value) rows via the native UNPIVOT — the
# inverse of q12's pivot, completing the reshape pair. The wide table is
# one aggregate; UNPIVOT is a zero-shuffle Expand (3 rows per input row,
# projection-only).
# --------------------------------------------------------------------------
@register(
    "q145_unpivot",
    oracle="""
    WITH wide AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view_v,
             round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click_v,
             round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_v
      FROM events GROUP BY 1)
    SELECT day, metric, value FROM wide
    UNPIVOT (value FOR metric IN (view_v, click_v, purchase_v))
    ORDER BY day, metric
    """,
)
def q145_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    wide = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        *[
            F.round(
                F.sum(F.when(F.col("event_type") == t, F.col("value"))), 2
            ).alias(f"{t}_v")
            for t in ("view", "click", "purchase")
        ]
    )
    return (
        wide.unpivot(
            "day",
            ["view_v", "click_v", "purchase_v"],
            "metric",
            "value",
        )
        .filter(F.col("value").isNotNull())
        .orderBy("day", "metric")
    )


# --------------------------------------------------------------------------
# q151 — ANN recall@K evaluation: for a BOUNDED query set, compare the
# hyperplane-LSH candidate search (q98's planes/bands) against brute-
# force cosine top-K and report per-query recall — the evaluation every
# ANN deployment runs before trusting its index. The brute-force truth
# tier is O(|Q| x corpus): at scale |Q| is a FIXED eval sample (the
# production rule — sample the queries, never brute-force the corpus
# side), so the scan stays linear in the corpus. Q151_NQ_MAX enforces
# that rule in code; the serving path (q98/q27/q55) never pays this
# tier. Both rankings order by (rounded cosine DESC, vec_id) so rank
# boundaries cannot flip between engines.
# --------------------------------------------------------------------------
Q151_NQ = 5
Q151_NQ_MAX = 64  # eval-sample ceiling: the truth tier must stay |Q|-bounded
Q151_K = 10
assert Q151_NQ <= Q151_NQ_MAX, "q151 truth tier requires a bounded query sample"


def _q151_oracle() -> str:
    cos = (
        "round(list_sum(list_transform(eq.embedding::DOUBLE[], (x, i) -> x * (ec.embedding::DOUBLE[])[i]))"
        " / (sqrt(list_sum(list_transform(eq.embedding::DOUBLE[], x -> x * x)))"
        " * sqrt(list_sum(list_transform(ec.embedding::DOUBLE[], x -> x * x)))), 6)"
    )
    return f"""
    WITH sigs AS ({_hyperplane_sigs_sql()}),
    bands AS ({_hyperplane_band_selects_sql()}),
    q AS (SELECT vec_id FROM embeddings WHERE vec_id < {Q151_NQ}),
    truth AS (
      SELECT qid, cid FROM (
        SELECT eq.vec_id AS qid, ec.vec_id AS cid,
               row_number() OVER (PARTITION BY eq.vec_id
                                  ORDER BY {cos} DESC, ec.vec_id) AS rk
        FROM embeddings eq JOIN embeddings ec ON eq.vec_id <> ec.vec_id
        WHERE eq.vec_id < {Q151_NQ})
      WHERE rk <= {Q151_K}),
    cand AS (
      SELECT DISTINCT a.vec_id AS qid, b.vec_id AS cid
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.vec_id <> b.vec_id
      WHERE a.vec_id < {Q151_NQ}),
    ann AS (
      SELECT qid, cid FROM (
        SELECT c.qid, c.cid,
               row_number() OVER (PARTITION BY c.qid
                                  ORDER BY {cos} DESC, c.cid) AS rk
        FROM cand c
        JOIN embeddings eq ON eq.vec_id = c.qid
        JOIN embeddings ec ON ec.vec_id = c.cid)
      WHERE rk <= {Q151_K}),
    ncand AS (SELECT qid, count(*) AS n_candidates FROM cand GROUP BY 1)
    SELECT t.qid AS vec_id,
           CAST(ncand.n_candidates AS BIGINT) AS n_candidates,
           round(count(a.cid) * 1.0 / {Q151_K}, 6) AS recall
    FROM truth t
    LEFT JOIN ann a ON a.qid = t.qid AND a.cid = t.cid
    JOIN ncand ON ncand.qid = t.qid
    GROUP BY 1, 2 ORDER BY 1
    """


@register("q151_ann_recall_eval", oracle=_q151_oracle())
def q151_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, norm

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bands = _hyperplane_bands(emb)
    qv = emb.filter(F.col("vec_id") < Q151_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq")
    )
    cv = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ec"))
    cos = F.round(
        dot(F.col("eq"), F.col("ec")) / (norm(F.col("eq")) * norm(F.col("ec"))),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    truth = (
        qv.crossJoin(cv)  # bounded: |Q| queries x corpus — the eval tier
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= Q151_K)
        .select("qid", "cid")
    )
    qb = bands.filter(F.col("vec_id") < Q151_NQ).select(
        F.col("vec_id").alias("qid"), "band", "band_key"
    )
    cb = bands.select(F.col("vec_id").alias("cid"), "band", "band_key")
    cand = (
        qb.join(cb, ["band", "band_key"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    ann = (
        cand.join(qv, "qid")
        .join(cv, "cid")
        .select("qid", "cid", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= Q151_K)
        .select("qid", "cid")
    )
    ncand = cand.groupBy("qid").agg(F.count("*").alias("n_candidates"))
    return (
        truth.join(
            ann.withColumn("hit", F.lit(1)), ["qid", "cid"], "left"
        )
        .groupBy("qid")
        .agg(F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(Q151_K), 6).alias("recall"))
        .join(F.broadcast(ncand), "qid")
        .select(
            F.col("qid").alias("vec_id"),
            "n_candidates",
            "recall",
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# q184 — PRODUCTION-shaped semantic near-dup: the q42/q109 pair join with
# the block assignment coming from a TRAINED IVF quantizer whose bucket
# count scales with the corpus (B = max(8, N / TARGET)) instead of the
# fixture's fixed `label` column. Constant target block size ==> the
# in-block pair join stays LINEAR in corpus size — the k ∝ N regime
# SemDeDup specifies, and the answer to the fixed-block growth the
# sf1.0 audit measured on the label-blocked tier (BENCH_NOTES round-4
# final).
#
# HASH-GATED since r8 (VERDICT r7 #6 — previously the registry's one
# rows-only-by-design query): the quantizer is now
# ann_ivf.deterministic_lloyd — seedless md5-smallest init + exact Lloyd
# rounds whose distances and means are integer-quantized, so the trained
# centroids are bit-identical on any engine and the oracle replays the
# ENTIRE pipeline (B = greatest(8, N//64) from count, init pick, both
# unrolled Lloyd rounds with empty-bucket keep-prev, final assignment,
# in-bucket pair join, rollup). MLlib KMeans remains the trainer where
# replay isn't needed (q55/q70/q103); the recall-vs-brute-force floor
# stays pinned in tests/test_reporting.py.
#
# Output: per-bucket near-dup summary (pairs found, max cosine) — the
# compact audit a dedup run logs.
# --------------------------------------------------------------------------
Q184_TAU = 0.3
Q184_TARGET_BLOCK = 64
Q184_ITERS = 2


def lloyd_dist_sql(e: str, c: str) -> str:
    """DuckDB twin of ann_ivf.int_sq_dist — the integer-quantized squared
    L2 both engines agree on bit-for-bit (shared by the q184 replay and
    q55's probe-bucket ranking so distance definitions cannot drift)."""
    from ..operators.ann_ivf import _QUANT_D

    return (
        f"list_sum(list_transform(list_zip({e}, {c}), p -> "
        f"CAST(floor((p[1]-p[2])*(p[1]-p[2]) * {float(_QUANT_D)}) AS BIGINT)))"
    )


def lloyd_oracle_ctes(b_sql: str, iters: int) -> str:
    """Oracle twin of ann_ivf.deterministic_lloyd over the embeddings
    view: WITH-body CTEs ending in ``af(vec_id, e, bucket)`` (the final
    exact-Lloyd assignment) with ``c{iters}(bucket, c)`` holding the
    trained centroids. ``b_sql`` is the bucket-count expression evaluated
    against embeddings (q184: greatest(8, count(*) // block); q55: a
    literal)."""
    from ..operators.ann_ivf import _QUANT_C

    dist = lloyd_dist_sql

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
        SELECT vec_id, e, bucket FROM (
            SELECT s.vec_id, s.e, i.bucket,
                   row_number() OVER (PARTITION BY s.vec_id
                                      ORDER BY {dist("s.e", "i.c")}, i.bucket) AS rn
            FROM sv s CROSS JOIN {cents} i)
        WHERE rn = 1)"""

    ctes = [
        # LIMIT 1 keeps nb a genuine one-row relation even when b_sql is
        # a literal (q55's "8" would otherwise yield one row PER
        # embedding; DuckDB 1.0 silently picks an arbitrary row for the
        # scalar subquery, DuckDB >= 1.1 errors — r9 round-diff review)
        f"nb AS (SELECT {b_sql} AS b FROM embeddings LIMIT 1)",
        """sv AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                     md5(CAST(vec_id AS VARCHAR)) AS k FROM embeddings)""",
        """c0 AS (SELECT row_number() OVER (ORDER BY k, vec_id) - 1 AS bucket, e AS c
              FROM sv QUALIFY row_number() OVER (ORDER BY k, vec_id) <= (SELECT b FROM nb))""",
    ]
    for t in range(1, iters + 1):
        ctes.append(assign(f"a{t}", f"c{t-1}"))
        ctes.append(
            f"""comp{t} AS (
            SELECT bucket, u.i AS i,
                   CAST(sum(CAST(floor(u.x * {float(_QUANT_C)}) AS BIGINT)) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) / {float(_QUANT_C)} AS c
            FROM (SELECT bucket,
                         unnest(list_transform(e, (x, i) -> struct_pack(i := i, x := x))) AS u
                  FROM a{t})
            GROUP BY 1, 2)"""
        )
        ctes.append(
            f"cl{t} AS (SELECT bucket, list(c ORDER BY i) AS c FROM comp{t} GROUP BY 1)"
        )
        ctes.append(
            f"""c{t} AS (SELECT p.bucket, coalesce(u.c, p.c) AS c
            FROM c{t-1} p LEFT JOIN cl{t} u USING (bucket))"""
        )
    ctes.append(assign("af", f"c{iters}"))
    return ",\n    ".join(ctes)


def _q184_oracle() -> str:
    return f"""
    WITH {lloyd_oracle_ctes(f"greatest(8, count(*) // {Q184_TARGET_BLOCK})", Q184_ITERS)},
    sides AS (SELECT vec_id, e, bucket,
                     sqrt(list_sum(list_transform(e, x -> x * x))) AS nm
              FROM af),
    pr AS (
        -- round BEFORE the tau filter, exactly like the Spark side's
        -- round(sim,6) >= tau: filtering one side on the raw cosine
        -- would drop pairs whose true cosine lands in
        -- [tau - 5e-7, tau) on that side only — a data-dependent
        -- boundary divergence (ADVICE r8)
        SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
                   / (a.nm * b.nm), 6) AS cos
        FROM sides a JOIN sides b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
           round(max(cos), 6) AS max_cosine
    FROM pr WHERE cos >= {Q184_TAU}
    GROUP BY 1
    """


@register("q184_semantic_dedup_ivf", oracle=_q184_oracle())
def q184_semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_ivf import deterministic_lloyd, lloyd_assign
    from ..operators.similarity import dot, norm

    # Tier switch (VERDICT r8 #1): the oracle/gate default trains AND
    # assigns on the bit-replayable exact tier (integer-quantized argmin,
    # O(N·B·d) codegen — the cost of end-to-end hash-gating a trained
    # quantizer); bench/production (SPARK_GRAFT_TIER=production) routes
    # assignment through the broadcast-matmul tier with the SAME B, init
    # and quantized means — tier agreement is pinned in
    # tests/test_ann_ivf.py.
    exact = not production_tier()
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = emb.count()
    n_buckets = max(8, n // Q184_TARGET_BLOCK)
    cents = deterministic_lloyd(emb, n_buckets, iters=Q184_ITERS, exact=exact)
    bucketed = lloyd_assign(emb, cents, exact=exact).select(
        "vec_id", "bucket", "embedding", norm(F.col("embedding")).alias("nm")
    )
    a = bucketed.select(
        F.col("vec_id").alias("id_a"),
        "bucket",
        F.col("embedding").alias("ea"),
        F.col("nm").alias("na"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"),
        "bucket",
        F.col("embedding").alias("eb"),
        F.col("nm").alias("nb"),
    )
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("bucket", "id_a", "id_b", F.round(sim, 6).alias("cosine"))
        .filter(F.col("cosine") >= Q184_TAU)
    )
    out = pairs.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.max("cosine"), 6).alias("max_cosine"),
    )
    return materialize(out)


# --------------------------------------------------------------------------
# q222 — HIERARCHICAL (two-level) IVF SemDeDup: the 100-TB answer to
# q184's flat quantizer. A flat B ∝ N coarse quantizer eventually needs
# the whole centroid set in one place (the exact tier broadcasts it; the
# matmul tier collects it to the driver) — at ~1e9 vectors that is an
# ~8 GB table no single task should hold. Two levels remove the global
# materialization entirely: level-1 trains B1 = max(2, isqrt(B)) cells
# (tiny, broadcastable at any N), level-2 trains an INDEPENDENT per-cell
# sub-quantizer with b2 = max(1, n_cell/TARGET) — all cells in one
# distributed plan keyed by cell, so sub-assignment is an EQUI-join
# (each vector meets only its own cell's ~sqrt(B) sub-centroids) and no
# join side exceeds a cell. Assignment work drops from O(N·B·d) to
# O(N·(B1 + B/B1)·d) — ~2·sqrt(B)·N·d.
#
# HASH-GATED end-to-end: both levels are the deterministic
# integer-quantized Lloyd (md5-smallest init per scope, bigint distance
# and mean quantization), so the DuckDB oracle replays level-1 training,
# cell assignment, per-cell b2, per-cell init, the level-2 round,
# sub-assignment, and the in-(cell,sub) pair join. Same TAU/TARGET as
# q184 — the two queries answer the same SemDeDup question at different
# quantizer topologies, and tests pin that q222's blocks are refinements
# of its own cells.
# --------------------------------------------------------------------------
Q222_TAU = 0.3
Q222_TARGET_BLOCK = 64


def _q222_oracle() -> str:
    from ..operators.ann_ivf import _QUANT_C

    qc = float(_QUANT_C)
    b1_sql = (
        f"greatest(2, CAST(floor(sqrt(greatest(8, count(*) // {Q222_TARGET_BLOCK})))"
        " AS BIGINT))"
    )
    dist = lloyd_dist_sql
    return f"""
    WITH {lloyd_oracle_ctes(b1_sql, 1)},
    cells2 AS (SELECT vec_id, e, bucket AS cell FROM af),
    cnt2 AS (SELECT cell, greatest(1, count(*) // {Q222_TARGET_BLOCK}) AS b2
             FROM cells2 GROUP BY 1),
    sk AS (SELECT cell, vec_id, e, md5(CAST(vec_id AS VARCHAR)) AS k FROM cells2),
    s0 AS (SELECT cell, rn - 1 AS sub, c FROM (
        SELECT sk.cell, e AS c, cnt2.b2,
               row_number() OVER (PARTITION BY sk.cell ORDER BY k, vec_id) AS rn
        FROM sk JOIN cnt2 ON sk.cell = cnt2.cell) WHERE rn <= b2),
    sa1 AS (SELECT vec_id, e, cell, sub FROM (
        SELECT s.vec_id, s.e, s.cell, i.sub,
               row_number() OVER (PARTITION BY s.vec_id
                                  ORDER BY {dist("s.e", "i.c")}, i.sub) AS rn
        FROM cells2 s JOIN s0 i ON s.cell = i.cell) WHERE rn = 1),
    m1 AS (SELECT cell, sub, u.i AS i,
                  CAST(sum(CAST(floor(u.x * {qc}) AS BIGINT)) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) / {qc} AS c
           FROM (SELECT cell, sub,
                        unnest(list_transform(e, (x, i) -> struct_pack(i := i, x := x))) AS u
                 FROM sa1)
           GROUP BY 1, 2, 3),
    ml1 AS (SELECT cell, sub, list(c ORDER BY i) AS c FROM m1 GROUP BY 1, 2),
    cf AS (SELECT p.cell, p.sub, coalesce(u.c, p.c) AS c
           FROM s0 p LEFT JOIN ml1 u ON p.cell = u.cell AND p.sub = u.sub),
    saf AS (SELECT vec_id, e, cell, sub FROM (
        SELECT s.vec_id, s.e, s.cell, i.sub,
               row_number() OVER (PARTITION BY s.vec_id
                                  ORDER BY {dist("s.e", "i.c")}, i.sub) AS rn
        FROM cells2 s JOIN cf i ON s.cell = i.cell) WHERE rn = 1),
    sides2 AS (SELECT vec_id, e, cell, sub,
                      sqrt(list_sum(list_transform(e, x -> x * x))) AS nm
               FROM saf),
    pr2 AS (
        SELECT a.cell, a.sub,
               round(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
                   / (a.nm * b.nm), 6) AS cos
        FROM sides2 a JOIN sides2 b
          ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id)
    SELECT cell, sub, CAST(count(*) AS BIGINT) AS n_pairs,
           round(max(cos), 6) AS max_cosine
    FROM pr2 WHERE cos >= {Q222_TAU}
    GROUP BY 1, 2
    """


@register("q222_hierarchical_semdedup", oracle=_q222_oracle())
def q222_hierarchical_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.ann_ivf import (
        assign_buckets_exact,
        assign_subbuckets_exact,
        deterministic_lloyd,
        deterministic_lloyd_grouped,
    )
    from ..operators.similarity import dot, norm

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = emb.count()
    b_total = max(8, n // Q222_TARGET_BLOCK)
    # isqrt == floor(sqrt) for every int < 2^52 (IEEE sqrt is correctly
    # rounded), so the oracle's floor(sqrt(...)) replays this exactly
    b1 = max(2, math.isqrt(b_total))
    cents1 = deterministic_lloyd(emb, b1, iters=1)
    # snapshot the cell assignment: it feeds level-2 training (3-4
    # lineage references inside the grouped Lloyd) AND the final
    # sub-assignment — without the barrier the level-1 O(N·B1·d) pass
    # re-executes once per reference (q55's r9 lesson). materialize(),
    # not a raw localCheckpoint, so the plan audit still sees level 1.
    cells = materialize(
        assign_buckets_exact(emb, cents1).withColumnRenamed("bucket", "cell")
    )
    cents2 = deterministic_lloyd_grouped(
        cells, target_block=Q222_TARGET_BLOCK, iters=1
    )
    bucketed = assign_subbuckets_exact(cells, cents2).select(
        "vec_id", "cell", "sub", "embedding", norm(F.col("embedding")).alias("nm")
    )
    a = bucketed.select(
        F.col("vec_id").alias("id_a"),
        "cell",
        "sub",
        F.col("embedding").alias("ea"),
        F.col("nm").alias("na"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"),
        "cell",
        "sub",
        F.col("embedding").alias("eb"),
        F.col("nm").alias("nb"),
    )
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, ["cell", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cell", "sub", F.round(sim, 6).alias("cosine"))
        .filter(F.col("cosine") >= Q222_TAU)
    )
    out = pairs.groupBy("cell", "sub").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.max("cosine"), 6).alias("max_cosine"),
    )
    return materialize(out)


# --------------------------------------------------------------------------
# q223 — PRODUCT-QUANTIZATION ANN (PQ/ADC; Jégou et al., TPAMI 2011 —
# the Faiss IVFADC scan): the vector-COMPRESSION tier the 100-TB serving
# path needs. q26 scans raw embeddings (O(N·d) floats read per query);
# q27/q55 prune WHICH vectors are scanned but still read full vectors.
# PQ changes what is STORED: each vector becomes m=8 sub-codes into
# per-subspace 16-entry codebooks (64 float64s -> 8 nibbles, 128x), and
# the query-time asymmetric distance is m LUT lookups + adds over the
# codes table alone — the original embeddings are never touched at scan
# time. At scale: codebooks are m·ks rows (broadcast at any N), encoding
# is an equi-join on the subspace key, and the ADC scan is one
# broadcast-join + map-side-combinable sum + TakeOrderedAndProject.
#
# HASH-GATED end-to-end: training is deterministic_lloyd_grouped with
# the subspace as the cell key (seedless md5-smallest init, one
# integer-quantized round, fixed b2 = least(16, n)); encoding and the
# LUT use the same integer distance; the ADC total is an EXACT bigint
# sum. The DuckDB oracle replays subvector slicing, per-subspace
# training, encoding, the LUT, and the top-k — bit-for-bit.
# --------------------------------------------------------------------------
Q223_M = 8  # subspaces
Q223_KS = 16  # codes per subspace
Q223_K = 10  # neighbors returned
Q223_ITERS = 1


def _pq_train_ctes(
    m: int, ks: int, src: str = "base", carry: str = "", prefix: str = ""
) -> str:
    """Oracle twin of pq_subvectors + pq_train(iters=1) + pq_encode:
    WITH-body CTEs ending in ``cf(subspace, sub, c)`` (the trained
    codebooks) and ``saf(vec_id[, carry], subspace, sub)`` (the codes
    table); ``sv(vec_id[, carry], subspace, e, k)`` stays visible for
    query-subvector consumers. ``src`` names the (vec_id, fe) relation
    sliced into subvectors — the raw embeddings for q223/q226, the
    cell-relative residuals for q224; ``carry`` lists extra ``src``
    columns (e.g. ", cell") threaded through slicing and encoding.
    ``prefix`` renames every CTE this helper defines (q224 composes it
    with lloyd_oracle_ctes, whose coarse-level ``sv`` would otherwise
    collide with the subvector ``sv`` here). ONE training replay shared
    by all three oracles so a change to the quantization, init, or
    tie-break cannot leave a sibling behind."""
    from ..operators.ann_ivf import _QUANT_C

    qc = float(_QUANT_C)
    dist = lloyd_dist_sql
    return f"""{prefix}base AS (SELECT vec_id, embedding::DOUBLE[] AS fe FROM embeddings),
    {prefix}sv AS (SELECT vec_id{carry}, CAST(t.s AS INTEGER) AS subspace,
                  list_slice(fe, t.s * (len(fe) // {m}) + 1,
                             (t.s + 1) * (len(fe) // {m})) AS e,
                  md5(CAST(vec_id AS VARCHAR)) AS k
           FROM {src}, (SELECT unnest(range({m})) AS s) t),
    {prefix}cnt AS (SELECT subspace, least({ks}, count(*)) AS b2 FROM {prefix}sv GROUP BY 1),
    {prefix}s0 AS (SELECT subspace, rn - 1 AS sub, c FROM (
        SELECT {prefix}sv.subspace, e AS c, {prefix}cnt.b2,
               row_number() OVER (PARTITION BY {prefix}sv.subspace ORDER BY k, vec_id) AS rn
        FROM {prefix}sv JOIN {prefix}cnt ON {prefix}sv.subspace = {prefix}cnt.subspace) WHERE rn <= b2),
    {prefix}sa1 AS (SELECT vec_id, e, subspace, sub FROM (
        SELECT s.vec_id, s.e, s.subspace, i.sub,
               row_number() OVER (PARTITION BY s.vec_id, s.subspace
                                  ORDER BY {dist("s.e", "i.c")}, i.sub) AS rn
        FROM {prefix}sv s JOIN {prefix}s0 i ON s.subspace = i.subspace) WHERE rn = 1),
    {prefix}m1 AS (SELECT subspace, sub, u.i AS i,
                  CAST(sum(CAST(floor(u.x * {qc}) AS BIGINT)) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) / {qc} AS c
           FROM (SELECT subspace, sub,
                        unnest(list_transform(e, (x, i) -> struct_pack(i := i, x := x))) AS u
                 FROM {prefix}sa1)
           GROUP BY 1, 2, 3),
    {prefix}ml1 AS (SELECT subspace, sub, list(c ORDER BY i) AS c FROM {prefix}m1 GROUP BY 1, 2),
    {prefix}cf AS (SELECT p.subspace, p.sub, coalesce(u.c, p.c) AS c
           FROM {prefix}s0 p LEFT JOIN {prefix}ml1 u ON p.subspace = u.subspace AND p.sub = u.sub),
    {prefix}saf AS (SELECT vec_id{carry}, subspace, sub FROM (
        SELECT s.vec_id{", s." + carry.lstrip(", ") if carry else ""}, s.subspace, i.sub,
               row_number() OVER (PARTITION BY s.vec_id, s.subspace
                                  ORDER BY {dist("s.e", "i.c")}, i.sub) AS rn
        FROM {prefix}sv s JOIN {prefix}cf i ON s.subspace = i.subspace) WHERE rn = 1)"""


def _q223_oracle() -> str:
    dist = lloyd_dist_sql
    return f"""
    WITH {_pq_train_ctes(Q223_M, Q223_KS)},
    q AS (SELECT subspace, e FROM sv WHERE vec_id = 0),
    lut AS (SELECT c.subspace, c.sub, {dist("q.e", "c.c")} AS d
            FROM cf c JOIN q ON c.subspace = q.subspace)
    SELECT s.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
    FROM saf s JOIN lut l ON s.subspace = l.subspace AND s.sub = l.sub
    WHERE s.vec_id <> 0
    GROUP BY 1 ORDER BY adc_dist, vec_id LIMIT {Q223_K}
    """


# q223 and q226 train the IDENTICAL flat product quantizer (same corpus
# projection, same M/KS/iters deterministic grouped Lloyd) — q226 is the
# recall audit OF q223's index, so the (subvecs, codebooks, codes)
# triple is one materialized intermediate, not a per-query recompute.
# Session-memoized with the _FAMILY_CACHE policy (keyed by
# (applicationId, sf_dir); key change clears); bench.py annotates both
# consumers as shared-stage. q224's residual PQ trains on residuals —
# a different input — and stays per-query.
_PQ_CACHE: dict[tuple, tuple] = {}


def _flat_pq_stage(spark: SparkSession, sf_dir: str):
    """(subvecs, codebooks, codes) for the flat Q223 PQ geometry, each an
    eager materialization (subvecs feeds 3 lineage references inside the
    grouped Lloyd plus encode and the LUT side; codebooks feed encode
    AND LUT; codes feed q223's scan and q226's ADC arm)."""
    from ..operators.ann_ivf import pq_encode, pq_subvectors, pq_train

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_CACHE:
        if any(k != key for k in _PQ_CACHE):
            _PQ_CACHE.clear()
        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        ).repartition(spark.sparkContext.defaultParallelism)
        subvecs = materialize(pq_subvectors(emb, Q223_M))
        codebooks = materialize(
            pq_train(subvecs, Q223_KS, iters=Q223_ITERS)
        )
        codes = materialize(pq_encode(subvecs, codebooks))
        _PQ_CACHE[key] = (subvecs, codebooks, codes)
    return _PQ_CACHE[key]


@register("q223_pq_adc_topk", oracle=_q223_oracle())
def q223_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_ivf import pq_adc_lut, pq_adc_topk

    subvecs, codebooks, codes = _flat_pq_stage(spark, sf_dir)
    lut = pq_adc_lut(codebooks, subvecs.filter(F.col("vec_id") == 0))
    topk = pq_adc_topk(codes.filter(F.col("vec_id") != 0), lut, Q223_K)
    return materialize(topk)


# --------------------------------------------------------------------------
# q226 — PQ ADC recall@K audit: the q151/q201 evaluation pattern applied
# to the compressed-domain tier — before serving from codes alone (q223),
# measure what the 128x compression costs in recall against exact top-K
# over the raw vectors, for a BOUNDED query sample (the production rule:
# sample the queries, never brute-force the corpus side — the truth tier
# is |Q| x corpus and stays linear in the corpus). Completes the
# recall-audit family: q151 covers hyperplane LSH, q201 the banded-LSH
# planner, q226 product quantization.
#
# Both rankings order by the INTEGER-quantized squared L2 (ties -> lower
# id): the truth tier uses int_sq_dist over full vectors and ADC sums
# integer LUT entries, so neither ranking has a float rank boundary and
# the oracle replays both bit-for-bit — no round-at-6dp mitigation
# needed (q151's cosine rounding exists for exactly the problem integer
# distances don't have).
# --------------------------------------------------------------------------
Q226_NQ = 5
Q226_K = 10


def _q226_oracle() -> str:
    dist = lloyd_dist_sql
    nq, k = Q226_NQ, Q226_K
    return f"""
    WITH {_pq_train_ctes(Q223_M, Q223_KS)},
    truth AS (SELECT qid, cid FROM (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {dist("a.fe", "b.fe")}, b.vec_id) AS rn
        FROM base a JOIN base b ON a.vec_id < {nq} AND b.vec_id <> a.vec_id)
      WHERE rn <= {k}),
    lutq AS (SELECT q.vec_id AS qid, c.subspace, c.sub, {dist("q.e", "c.c")} AS d
             FROM cf c JOIN sv q ON c.subspace = q.subspace
             WHERE q.vec_id < {nq}),
    adcd AS (SELECT l.qid, s.vec_id AS cid, CAST(sum(l.d) AS BIGINT) AS ad
             FROM saf s JOIN lutq l ON s.subspace = l.subspace AND s.sub = l.sub
             WHERE s.vec_id <> l.qid
             GROUP BY 1, 2),
    adc AS (SELECT qid, cid FROM (
        SELECT qid, cid, row_number() OVER (PARTITION BY qid
                                            ORDER BY ad, cid) AS rn
        FROM adcd) WHERE rn <= {k})
    SELECT t.qid AS vec_id, round(count(a.cid) * 1.0 / {k}, 6) AS recall
    FROM truth t LEFT JOIN adc a ON a.qid = t.qid AND a.cid = t.cid
    GROUP BY 1 ORDER BY 1
    """


@register("q226_pq_recall_eval", oracle=_q226_oracle())
def q226_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.ann_ivf import int_sq_dist, pq_adc_lut

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").repartition(
        spark.sparkContext.defaultParallelism
    )
    # session-shared flat-PQ stage (the exact index q223 serves — this
    # query is its recall audit; see _flat_pq_stage)
    subvecs, codebooks, codes = _flat_pq_stage(spark, sf_dir)

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("fe")
    )
    qv = base.filter(F.col("vec_id") < Q226_NQ).select(
        F.col("vec_id").alias("qid"), F.col("fe").alias("qe")
    )
    cv = base.select(F.col("vec_id").alias("cid"), F.col("fe").alias("ce"))
    wq = Window.partitionBy("qid").orderBy("__d", "cid")
    truth = (
        qv.crossJoin(cv)  # bounded: |Q| queries x corpus — the eval tier
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("__d", int_sq_dist(F.col("qe"), F.col("ce")))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= Q226_K)
        .select("qid", "cid")
    )
    lutq = pq_adc_lut(
        codebooks,
        subvecs.filter(F.col("vec_id") < Q226_NQ).withColumnRenamed(
            "vec_id", "qid"
        ),
        key_cols=["qid"],
    )
    adcd = (
        codes.join(F.broadcast(lutq), ["subspace", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("dist").alias("ad"))
    )
    wa = Window.partitionBy("qid").orderBy("ad", "cid")
    adc = (
        adcd.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= Q226_K)
        .select("qid", "cid")
    )
    out = (
        truth.join(adc.withColumn("hit", F.lit(1)), ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(Q226_K), 6
            ).alias("recall")
        )
        .select(F.col("qid").alias("vec_id"), "recall")
        .orderBy("vec_id")
    )
    return materialize(out)


# --------------------------------------------------------------------------
# q224 — FULL IVFADC (inverted file + residual product quantization +
# multi-probe asymmetric scan; Jégou et al. 2011 §IV — the Faiss
# IVF,PQ index): composes q223's PQ with the coarse IVF tier the way a
# production index does. Coarse quantizer (B=8 deterministic Lloyd)
# partitions the corpus into cells; PQ encodes the RESIDUAL
# (vector − cell centroid), which carries far less energy than the raw
# vector, so the same 8×16 codebook budget quantizes finer. The query
# probes its nprobe=2 nearest cells and, because residuals are
# cell-relative, builds a PER-CELL LUT from its per-cell residual; the
# ADC scan touches only codes in probed cells (inverted-file pruning)
# and never the raw vectors. At scale: cell assignment prunes the scan
# ~B/nprobe-fold, LUTs stay nprobe·m·ks rows (broadcast at any N), and
# the scan is one broadcast-join + exact bigint sum.
#
# HASH-GATED end-to-end: coarse training/assignment reuse the q55/q184
# replay; residual subtraction is exact double arithmetic; PQ training/
# encoding reuse q223's grouped replay over residual subvectors; the
# probe ranking is the integer distance (ties -> lower cell); LUT and
# top-k are exact integers. The oracle replays ALL of it.
# --------------------------------------------------------------------------
Q224_B = 8  # coarse cells
Q224_NPROBE = 2
Q224_M = 8
Q224_KS = 16
Q224_K = 10


def _q224_oracle() -> str:
    dist = lloyd_dist_sql
    m, ks, k, npr = Q224_M, Q224_KS, Q224_K, Q224_NPROBE
    return f"""
    WITH {lloyd_oracle_ctes(str(Q224_B), 1)},
    rv AS (SELECT a.vec_id, a.bucket AS cell,
                  list_transform(list_zip(a.e, c.c), p -> p[1] - p[2]) AS fe
           FROM af a JOIN c1 c ON a.bucket = c.bucket),
    {_pq_train_ctes(m, ks, src="rv", carry=", cell", prefix="p")},
    qv AS (SELECT e FROM sv WHERE vec_id = 0),
    pc AS (SELECT c1.bucket AS cell, c1.c
           FROM c1, qv ORDER BY {dist("qv.e", "c1.c")}, c1.bucket LIMIT {npr}),
    qr AS (SELECT p.cell,
                  list_transform(list_zip(q.e, p.c), x -> x[1] - x[2]) AS fe
           FROM pc p, qv q),
    qsv AS (SELECT cell, CAST(t.s AS INTEGER) AS subspace,
                   list_slice(fe, t.s * (len(fe) // {m}) + 1,
                              (t.s + 1) * (len(fe) // {m})) AS e
            FROM qr, (SELECT unnest(range({m})) AS s) t),
    lut AS (SELECT q.cell, cb.subspace, cb.sub, {dist("q.e", "cb.c")} AS d
            FROM pcf cb JOIN qsv q ON cb.subspace = q.subspace)
    SELECT s.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
    FROM psaf s JOIN lut l
      ON s.cell = l.cell AND s.subspace = l.subspace AND s.sub = l.sub
    WHERE s.vec_id <> 0
    GROUP BY 1 ORDER BY adc_dist, vec_id LIMIT {k}
    """


@register("q224_ivfadc_topk", oracle=_q224_oracle())
def q224_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_ivf import (
        assign_buckets_exact,
        deterministic_lloyd,
        pq_adc_lut,
        pq_encode,
        pq_subvectors,
        pq_train,
        probe_buckets_exact,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").repartition(
        spark.sparkContext.defaultParallelism
    )
    # cents1 has FOUR consumers (cell assignment, residual build, probe,
    # query-residual build) — unmaterialized, each re-runs the coarse
    # Lloyd's full-corpus pass (r9 round-diff review); the frame is B=8
    # rows
    cents1 = materialize(deterministic_lloyd(emb, Q224_B, iters=1))
    cells = materialize(
        assign_buckets_exact(emb, cents1).withColumnRenamed("bucket", "cell")
    )
    # residual = vector − its cell centroid (exact double subtraction on
    # both engines); PQ then spends its codebook budget on the residual
    # energy only
    resid = materialize(
        cells.join(
            F.broadcast(cents1.withColumnRenamed("bucket", "cell")), "cell"
        ).select(
            "vec_id",
            "cell",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("centroid"),
                lambda x, y: x - y,
            ).alias("embedding"),
        )
    )
    subvecs = materialize(pq_subvectors(resid, Q224_M))
    # materialized: encode + per-cell LUT both consume it (q223's reason)
    codebooks = materialize(pq_train(subvecs, Q224_KS, iters=1))
    codes = pq_encode(subvecs, codebooks).join(
        resid.select("vec_id", "cell"), "vec_id"
    )

    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )
    probed = probe_buckets_exact(cents1, qrow, Q224_NPROBE)
    # per-probed-cell query residual -> per-cell LUT (nprobe·m·ks rows)
    qres = (
        cents1.withColumnRenamed("bucket", "cell")
        .join(probed.withColumnRenamed("bucket", "cell"), "cell")
        .crossJoin(F.broadcast(qrow))
        .select(
            "cell",
            F.zip_with(
                F.col("qvec"), F.col("centroid"), lambda x, y: x - y
            ).alias("embedding"),
        )
    )
    qsubs = pq_subvectors(qres, Q224_M, id_col="cell")
    lut = pq_adc_lut(codebooks, qsubs, key_cols=["cell"])
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["cell", "subspace", "code"])
        .groupBy("vec_id")
        .agg(F.sum("dist").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(Q224_K)
    )
    return materialize(adc)


# --------------------------------------------------------------------------
# q200 — incremental embedding-batch dedup against a PERSISTED
# corpus-scaled LSH index (the vector twin of q89, composing r5's
# lsh_blocking defaults into the ingest shape): the corpus (odd vec_ids)
# is banded ONCE with width ∝ log2(|corpus|) and stored to parquet as a
# self-describing index — (vec_id, band, band_key) rows plus a one-row
# meta table carrying nbits. A new batch (even vec_ids) is banded at
# query time with the STORED width (read from meta, not recomputed — a
# grown corpus must not silently re-key the index), candidates come from
# the new-bands ⋈ stored-bands equi-join, and the exact-cosine verify is
# candidate-scoped. No corpus vector is re-hashed at query time; the new
# batch pays signature cost once. Oracle replays the identical planes /
# width / banding / verify (persistence is physical only).
# --------------------------------------------------------------------------
Q200_TAU = 0.3


def _q200_oracle() -> str:
    from ..operators import lsh_blocking as L

    cos = (
        "list_sum(list_transform(ea.embedding::DOUBLE[], (x, i) -> x * (eb.embedding::DOUBLE[])[i]))"
        " / (sqrt(list_sum(list_transform(ea.embedding::DOUBLE[], x -> x * x)))"
        " * sqrt(list_sum(list_transform(eb.embedding::DOUBLE[], x -> x * x))))"
    )
    return f"""
    WITH corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
    newb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
    {L.nbits_param_sql("corpus")},
    {L.band_keys_sql("corpus", cte_prefix="ix")},
    {L.band_keys_sql("newb", cte_prefix="qr")},
    {L.cross_candidate_pairs_sql("qr", "ix")}
    SELECT c.id_a, c.id_b, round({cos}, 6) AS cosine
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE {cos} >= {Q200_TAU}
    """


@register("q200_embedding_ingest_dedup", oracle=_q200_oracle())
def q200_embedding_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators import lsh_blocking as L
    from ..operators.similarity import dot, norm

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    corpus = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    newb = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    work = tempfile.mkdtemp(prefix="lsh_vec_index_")
    try:
        # ingest time: width from the CORPUS size (counted on the raw
        # scan, not the repartitioned frame); band + persist once
        nbits = L.n_block_bits(
            load(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 2 == 1)
            .count()
        )
        L.band_keys(corpus, nbits).write.mode("overwrite").parquet(
            f"{work}/index"
        )
        spark.createDataFrame(
            [(nbits,)], "nbits int"
        ).write.mode("overwrite").parquet(f"{work}/meta")
        # query time: stored width + stored bands only
        stored_nbits = spark.read.parquet(f"{work}/meta").first().nbits
        ix = spark.read.parquet(f"{work}/index")
        qr = L.band_keys(newb, stored_nbits)
        cand = (
            qr.select(F.col("vec_id").alias("id_a"), "band", "band_key")
            .join(
                ix.select(F.col("vec_id").alias("id_b"), "band", "band_key"),
                ["band", "band_key"],
            )
            .select("id_a", "id_b")
            .distinct()
        )
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
        out = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .filter(sim >= Q200_TAU)
            .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
        )
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q202 — MMR (maximal marginal relevance) diversified top-k rerank
# (Carbonell & Goldstein 1998): serve the query's RERANK WINDOW (top
# Q202_WINDOW by cosine) and greedily pick Q202_K results maximizing
# lambda * sim(q, d) - (1 - lambda) * max_{s in S} sim(d, s) — the
# standard diversity rerank between retrieval and display.
#
# Scale shape: retrieval is the q26 broadcast scan (one corpus pass,
# TakeOrderedAndProject top-W); the greedy loop runs on the BOUNDED
# window only (W=20 rows) after the window's pairwise sims are computed
# IN SPARK — the driver never touches vectors, just the W x W rounded
# sim matrix (q151's bounded-eval rule: the window is a constant, never
# the corpus). Determinism: all comparisons use round-6 sims and the
# composite MMR score re-rounded to 6 with vec_id tie-breaks, so greedy
# choices cannot flip between engines.
# --------------------------------------------------------------------------
Q202_WINDOW = 20
Q202_K = 5
Q202_LAMBDA = 0.7

_Q202_COS = (
    "round(list_sum(list_transform(a.e, (x, i) -> x * b.e[i]))"
    " / (sqrt(list_sum(list_transform(a.e, x -> x * x)))"
    " * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6)"
)


def _q202_oracle() -> str:
    lam, mu = Q202_LAMBDA, round(1 - Q202_LAMBDA, 6)
    # greedy comparisons run on the RAW double mmr (identical IEEE ops
    # from identical round-6 inputs on both engines — rounding inside the
    # loop would reintroduce engine-specific tie behavior, Python's
    # round() being half-to-even while SQL round is half-away); rounding
    # happens once, at output, via the proven round()/F.round parity
    steps = []
    sel_union = "SELECT vec_id FROM s1"
    for k in range(2, Q202_K + 1):
        steps.append(f"""
    sel{k - 1} AS ({sel_union}),
    s{k} AS (
        SELECT c.vec_id,
               {lam} * c.qsim - {mu} * (
                   SELECT max(p.s) FROM pair p
                   WHERE p.ia = c.vec_id
                     AND p.ib IN (SELECT vec_id FROM sel{k - 1})) AS mmr
        FROM cand c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
        ORDER BY mmr DESC, c.vec_id LIMIT 1
    )""")
        sel_union += f" UNION ALL SELECT vec_id FROM s{k}"
    picks = " UNION ALL ".join(
        f"SELECT {k} AS rk, vec_id, {'qsim AS mmr' if k == 1 else 'mmr'} FROM s{k}"
        for k in range(1, Q202_K + 1)
    )
    return f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    win AS (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS e,
               round(list_sum(list_transform(e.embedding::DOUBLE[], (x, i) -> x * qe[i]))
                     / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
                        * sqrt(list_sum(list_transform(qe, x -> x * x)))), 6) AS qsim
        FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    cand AS (SELECT vec_id, e, qsim FROM win ORDER BY qsim DESC, vec_id LIMIT {Q202_WINDOW}),
    pair AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib, {_Q202_COS} AS s
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    s1 AS (SELECT vec_id, qsim FROM cand ORDER BY qsim DESC, vec_id LIMIT 1),
    {",".join(steps)}
    SELECT rk, vec_id, round(mmr, 6) AS mmr FROM ({picks}) ORDER BY rk
    """


@register("q202_mmr_rerank", oracle=_q202_oracle())
def q202_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot, norm

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    sim_q = F.round(
        dot(F.col("embedding"), F.col("qe"))
        / (norm(F.col("embedding")) * norm(F.col("qe"))),
        6,
    )
    # freeze the top-W retrieval once: qsims.collect() and BOTH alias
    # sides of the pair crossJoin consume cand — without the barrier the
    # full-corpus scan + TakeOrdered re-runs ~3x (r7 review)
    cand = materialize(
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", sim_q.alias("qsim"))
        .orderBy(F.desc("qsim"), F.asc("vec_id"))
        .limit(Q202_WINDOW)
    )
    a = cand.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
    )
    b = cand.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
    )
    sim_p = F.round(
        dot(F.col("ea"), F.col("eb")) / (norm(F.col("ea")) * norm(F.col("eb"))),
        6,
    )
    pair = (
        a.crossJoin(b)  # W x W rounded sim matrix over the BOUNDED window
        .filter(F.col("ia") != F.col("ib"))
        .select("ia", "ib", sim_p.alias("s"))
    )
    qsims = {r.vec_id: r.qsim for r in cand.select("vec_id", "qsim").collect()}
    sims = {(r.ia, r.ib): r.s for r in pair.collect()}
    lam, mu = Q202_LAMBDA, round(1 - Q202_LAMBDA, 6)
    selected: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    if not qsims:
        return spark.createDataFrame([], "rk int, vec_id bigint, mmr double")
    # step 1: pure relevance; steps 2..K: RAW-double MMR (see the oracle
    # note — rounding only at output), vec_id tie-break
    first = min(qsims, key=lambda v: (-qsims[v], v))
    selected.append((1, first, qsims[first]))
    chosen.append(first)
    for rk in range(2, Q202_K + 1):
        best = None
        for v, qs in qsims.items():
            if v in chosen:
                continue
            pen = max(sims[(v, s)] for s in chosen)
            mmr = lam * qs - mu * pen
            key = (-mmr, v)
            if best is None or key < best[0]:
                best = (key, v, mmr)
        if best is None:  # window exhausted before K picks
            break
        selected.append((rk, best[1], best[2]))
        chosen.append(best[1])
    out = spark.createDataFrame(selected, "rk int, vec_id bigint, mmr double")
    # final rounding happens in Spark so both engines round the same raw
    # double through the proven F.round <-> round() parity path
    return out.select("rk", "vec_id", F.round("mmr", 6).alias("mmr"))
