"""Mergeable-sketch operators (q115-q116): Count-Min frequency sketch and
a Bloom-filter runtime join filter.

With KMV distinct counting (q90) these complete the classic mergeable-
sketch trio every 100 TB engine carries. Both sketches here are built
with DETERMINISTIC md5-derived hashes, which makes them exactly
reproducible — the DuckDB oracles rebuild the identical sketch and the
value hash pins estimate-level equality, not just "roughly right".

Mergeability is the scale story: a CMS cell count and a Bloom word are
both plain integer aggregates (sum / bit_or), so Spark's map-side partial
aggregation IS the sketch merge — executors build partial sketches over
their partitions and the shuffle combines them associatively. Sketch
size is O(w*d) / O(words), independent of corpus size, and the same
merge works across streaming micro-batches or per-day sketch tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# --------------------------------------------------------------------------
# q115 — Count-Min Sketch over the document token stream: d=4 rows of
# w=256 counters; point queries for a fixed probe-term set come back as
# the min over rows, reported against the exact count. CMS guarantees
# est >= exact (collisions only ADD); the probe table shows the
# overestimate directly, including for a term absent from the corpus.
#
# Scale shape: the (row, col) cell stream explodes 4 rows per token but
# collapses map-side to at most w*d = 1024 partials per partition before
# the shuffle; the probe join broadcasts the 1024-row sketch.
# --------------------------------------------------------------------------
Q115_D = 4
Q115_W = 256
Q115_PROBES = ("table", "hash", "join", "scan", "window", "zzz_absent")


def _cms_col(term: Column, row: int) -> Column:
    """Deterministic CMS column index for (row, term)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}|"), term)), 1, 15), 16, 10
        ).cast("bigint")
        % Q115_W
    )


def _q115_oracle() -> str:
    probes = ", ".join(f"('{t}')" for t in Q115_PROBES)
    rows = ", ".join(f"({r})" for r in range(Q115_D))
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    rws(r) AS (VALUES {rows}),
    cells AS (
      SELECT r,
             CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || t), 1, 15)
                  AS BIGINT) % {Q115_W} AS c,
             count(*) AS cnt
      FROM toks, rws GROUP BY 1, 2
    ),
    probes(term) AS (VALUES {probes}),
    ph AS (
      SELECT term, r,
             CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || term), 1, 15)
                  AS BIGINT) % {Q115_W} AS c
      FROM probes, rws
    ),
    est AS (
      SELECT term, min(coalesce(cnt, 0)) AS est
      FROM ph LEFT JOIN cells USING (r, c) GROUP BY 1
    ),
    exact AS (
      SELECT p.term, count(t.t) AS exact
      FROM probes p LEFT JOIN toks t ON t.t = p.term GROUP BY 1
    )
    SELECT term, CAST(est AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact,
           CAST(est - exact AS BIGINT) AS overestimate
    FROM est JOIN exact USING (term)
    """


@register("q115_count_min_sketch", oracle=_q115_oracle())
def q115_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    # 4 (row, col) cells per token; map-side combine collapses to <= w*d
    # partials per partition before any shuffle
    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"), _cms_col(F.col("t"), r).alias("c")
                        )
                        for r in range(Q115_D)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.r", "cell.c")
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    probes = spark.createDataFrame([(t,) for t in Q115_PROBES], "term string")
    ph = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), _cms_col(F.col("term"), r).alias("c"))
                    for r in range(Q115_D)
                ]
            )
        ).alias("cell"),
    ).select("term", "cell.r", "cell.c")
    est = (
        ph.join(F.broadcast(cells), ["r", "c"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    exact = (
        probes.join(toks, probes.term == toks.t, "left")
        .groupBy("term")
        .agg(F.count("t").alias("exact"))
    )
    return est.join(exact, "term").select(
        "term",
        F.col("est").cast("bigint").alias("est"),
        F.col("exact").cast("bigint").alias("exact"),
        (F.col("est") - F.col("exact")).cast("bigint").alias("overestimate"),
    )


# --------------------------------------------------------------------------
# q116 — Bloom-filter runtime join filter (the "runtime filter" /
# dynamic-partition-pruning primitive): build a Bloom filter (256 x
# 32-bit words = 8192 bits, k=3 hashes) over the DISTINCT order
# custkeys, then probe a half-ghost key set — every EVEN customer key
# as-is (all present in orders in this data) and every ODD key shifted
# into an absent range — and report per-nation how many probes pass the
# filter vs truly match vs are false positives. The filter is sized
# small on purpose so the false-positive rate is nonzero and OBSERVABLE
# (~8% of absent probes at this fill factor); the oracle pins the exact
# FP set, not just the rate.
#
# At 100 TB this is how a big probe side avoids shuffling rows that
# cannot match: the word table is a bounded broadcast (word count is
# fixed regardless of build-side size), and bit_or is associative so
# the build is one map-side-combined aggregate over the build side.
# --------------------------------------------------------------------------
Q116_WORDS = 256  # 32 bits each -> 8192 bits
Q116_GHOST = 10_000_000  # offset that maps odd probe keys outside the domain
Q116_K = 3


def _bloom_bit(key: Column, i: int) -> Column:
    """Deterministic bit index i of Q116_K for a bigint key."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"b{i}|"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % (Q116_WORDS * 32)
    )


def _q116_oracle() -> str:
    idx = ", ".join(f"({i})" for i in range(Q116_K))
    return f"""
    WITH ks(i) AS (VALUES {idx}),
    bkeys AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bbits AS (
      SELECT CAST('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '|'
                     || CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
             % {Q116_WORDS * 32} AS b
      FROM bkeys, ks
    ),
    words AS (
      SELECT b // 32 AS w, bit_or(1 << (b % 32)) AS bits
      FROM bbits GROUP BY 1
    ),
    probes AS (
      SELECT c_nationkey,
             CASE WHEN c_custkey % 2 = 0 THEN c_custkey
                  ELSE c_custkey + {Q116_GHOST} END AS pk
      FROM customer
    ),
    pbits AS (
      SELECT p.pk, p.c_nationkey,
             CAST('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '|'
                     || CAST(p.pk AS VARCHAR)), 1, 15) AS BIGINT)
             % {Q116_WORDS * 32} AS b
      FROM probes p, ks
    ),
    hit AS (
      SELECT pk, c_nationkey,
             sum(CASE WHEN coalesce(bits, 0) & (1 << (b % 32)) <> 0
                      THEN 1 ELSE 0 END) AS nset
      FROM pbits LEFT JOIN words ON b // 32 = w
      GROUP BY 1, 2
    ),
    truth AS (SELECT DISTINCT o_custkey AS k FROM orders)
    SELECT c_nationkey,
           count(*) AS n_probes,
           CAST(sum(CASE WHEN nset = {Q116_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(sum(CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(sum(CASE WHEN nset = {Q116_K} AND t.k IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM hit LEFT JOIN truth t ON hit.pk = t.k
    GROUP BY 1
    """


@register("q116_bloom_join_filter", oracle=_q116_oracle())
def q116_bloom_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    bkeys = orders.select(F.col("o_custkey").alias("k")).distinct()
    bbits = bkeys.select(
        F.explode(
            F.array(*[_bloom_bit(F.col("k"), i) for i in range(Q116_K)])
        ).alias("b")
    )
    # shiftleft's numBits arg must be a literal in the Python API; the
    # column-operand form is the SQL expression
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))")
    words = (
        bbits.select((F.col("b") / 32).cast("bigint").alias("w"), mask.alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    probes = cust.select(
        "c_nationkey",
        F.when(F.col("c_custkey") % 2 == 0, F.col("c_custkey"))
        .otherwise(F.col("c_custkey") + Q116_GHOST)
        .alias("pk"),
    )
    pbits = probes.select(
        "pk",
        "c_nationkey",
        F.explode(
            F.array(*[_bloom_bit(F.col("pk"), i) for i in range(Q116_K)])
        ).alias("b"),
    )
    hit = (
        pbits.withColumn("w", (F.col("b") / 32).cast("bigint"))
        .join(F.broadcast(words), "w", "left")
        .withColumn(
            "set1",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))")
                )
                != 0,
                1,
            ).otherwise(0),
        )
        .groupBy("pk", "c_nationkey")
        .agg(F.sum("set1").alias("nset"))
    )
    truth = orders.select(F.col("o_custkey").alias("k")).distinct()
    joined = hit.join(truth, hit.pk == truth.k, "left")
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("nset") == Q116_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
        F.sum(
            F.when((F.col("nset") == Q116_K) & F.col("k").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_pos"),
    )


# --------------------------------------------------------------------------
# q126 — mergeable histogram quantile sketch: fixed-width value bins over
# l_extendedprice, quantiles read off the cumulative bin counts with
# linear interpolation inside the containing bin. The fourth classic
# mergeable summary next to CMS (q115), Bloom (q116), and KMV (q90):
# bin counts are plain integer sums, so map-side partial aggregation IS
# the sketch merge, size is O(value_range / W) regardless of row count,
# and the same merge combines per-day or per-stream sketch tables.
#
# Unlike percentile_approx, the fixed-bin read-off is fully deterministic
# (integer counts + one double interpolation from identical operands), so
# the oracle pins estimate-level equality. Error is bounded by the bin
# width W; that bound against the EXACT percentile is asserted in
# tests/test_sketches.py — not recomputed inside the serving plan (the
# q103 lesson: exactness proofs live in tests, serving plans serve).
#
# The cumulative window runs over the BOUNDED histogram (|bins| rows,
# O(range/W) — ~100 here), never over data rows.
# --------------------------------------------------------------------------
Q126_W = 1000.0
Q126_PS = (0.25, 0.5, 0.9, 0.99)

_Q126_PS_SQL = ", ".join(f"({p})" for p in Q126_PS)


def _histogram_cdf_ctes() -> str:
    """Oracle fragment: hist/cum/tot CTEs of the fixed-width price
    histogram. Shared by q126 (quantile probes) and q139 (equi-depth
    boundaries, which its own header says 'come from q126's histogram')
    so a bin-width or boundary-condition change cannot diverge them.
    Keep in lockstep with _quantile_estimates().
    """
    return f"""hist AS (
      SELECT CAST(floor(l_extendedprice / {Q126_W}) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) - cnt AS c_prev
      FROM hist),
    tot AS (SELECT count(*) AS n FROM lineitem)"""


def _quantile_estimates(li: DataFrame, ps) -> DataFrame:
    """Spark twin: (p, est) interpolated quantile estimates from the
    histogram CDF, one row per probe in ``ps`` (est unrounded — callers
    round at output)."""
    from pyspark.sql import Window

    hist = li.groupBy(
        F.floor(F.col("l_extendedprice") / Q126_W).cast("bigint").alias("bin")
    ).agg(F.count("*").alias("cnt"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("c"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("c_prev"),
    )
    tot = li.agg(F.count("*").alias("n"))
    probes = F.broadcast(
        li.sparkSession.createDataFrame([(p,) for p in ps], "p double")
    )
    t = F.col("p") * F.col("n")
    return (
        probes.crossJoin(F.broadcast(tot))
        .join(cum, (F.col("c") >= t) & (F.col("c_prev") < t))
        .select(
            "p",
            (
                F.col("bin") * Q126_W
                + (t - F.col("c_prev")) / F.col("cnt") * Q126_W
            ).alias("est"),
        )
    )


@register(
    "q126_histogram_quantiles",
    oracle=f"""
    WITH {_histogram_cdf_ctes()},
    probes AS (SELECT CAST(p AS DOUBLE) AS p
               FROM (VALUES {_Q126_PS_SQL}) AS t(p))
    SELECT p,
           round(bin * {Q126_W}
                 + (p * tot.n - c_prev) / cnt * {Q126_W}, 6) AS est
    FROM probes CROSS JOIN tot JOIN cum
      ON cum.c >= p * tot.n AND cum.c_prev < p * tot.n
    ORDER BY p
    """,
)
def q126_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        _quantile_estimates(li, Q126_PS)
        .select("p", F.round("est", 6).alias("est"))
        .orderBy("p")
    )


# --------------------------------------------------------------------------
# q139 — equi-depth binning from the histogram sketch: boundaries at
# p = 1/B .. (B-1)/B come from q126's mergeable fixed-bin histogram
# (one aggregate + a bounded cumulative window), collapse into ONE
# broadcast array row, and every fact row gets its bucket from a pure
# array expression — no sort, no ntile, no per-row join. The feature-
# engineering staple (quantile bucketing) in the shape that scales: the
# data is touched twice by scans and never globally ordered; bucket
# depths are then audited by a map-side-combinable groupBy.
# --------------------------------------------------------------------------
Q139_B = 8


def _q139_oracle() -> str:
    ps = ", ".join(f"({i / Q139_B})" for i in range(1, Q139_B))
    return f"""
    WITH {_histogram_cdf_ctes()},
    probes AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES {ps}) AS t(p)),
    bounds AS (
      SELECT p, bin * {Q126_W} + (p * tot.n - c_prev) / cnt * {Q126_W} AS est
      FROM probes CROSS JOIN tot JOIN cum
        ON cum.c >= p * tot.n AND cum.c_prev < p * tot.n),
    barr AS (SELECT list(est ORDER BY est) AS bs FROM bounds),
    assigned AS (
      SELECT CAST(len(list_filter(barr.bs, b -> b <= l_extendedprice))
                  AS BIGINT) AS bucket,
             l_extendedprice AS v
      FROM lineitem CROSS JOIN barr)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           round(min(v), 2) AS lo, round(max(v), 2) AS hi
    FROM assigned GROUP BY 1 ORDER BY 1
    """


@register("q139_equidepth_binning", oracle=_q139_oracle())
def q139_equidepth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bounds = _quantile_estimates(
        li, [i / Q139_B for i in range(1, Q139_B)]
    ).select("est")
    barr = bounds.agg(F.array_sort(F.collect_list("est")).alias("bs"))
    assigned = li.crossJoin(F.broadcast(barr)).select(
        F.size(
            F.filter("bs", lambda b: b <= F.col("l_extendedprice"))
        ).cast("bigint").alias("bucket"),
        F.col("l_extendedprice").alias("v"),
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# q158 — HyperLogLog distinct-user sketch per event_type (Flajolet et al.
# 2007): m=64 registers, md5-derived (bucket, rho). The register table IS
# the mergeable sketch: groupBy(event_type, bucket).max(rho) makes Spark's
# map-side partial aggregation the sketch merge — executors build partial
# register arrays over their partitions and the shuffle combines them with
# max(), exactly how per-day HLL sketches would roll up (cf. q147's KMV
# daily merge). Sketch size is O(m) per group, independent of corpus size.
#
# Determinism (why this can be value-hash oracled): the hash is md5; the
# harmonic sum's terms 2^-rho are exact powers of two spanning < 2^53, so
# every partial sum is exact in IEEE double REGARDLESS of Spark's
# aggregation order — the one floating-point hazard of HLL is absent.
# Small-range (linear counting) correction applies when E <= 2.5m and
# empty registers remain, matching the published algorithm.
# --------------------------------------------------------------------------
Q158_M = 64          # registers (p = 6 bucket bits)
Q158_ALPHA = 0.709   # alpha_64 from the HLL paper
Q158_WBITS = 48      # rho field: 12 md5 hex chars -> exact in double


def _hll_parts_cols() -> list:
    """(bucket, w) register-address columns from the md5 ``hx`` column.

    Shared by q158 (the sketch) and q174 (its set-ops consumer): the two
    queries' registers are only mergeable because they hash identically,
    so the address derivation lives here once. Keep in lockstep with the
    oracle ``parts`` CTEs.
    """
    return [
        (F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint") % Q158_M).alias(
            "bucket"
        ),
        F.conv(F.substring("hx", 3, 12), 16, 10).cast("bigint").alias("w"),
    ]


def _hll_rho():
    """rho = (leading-zero count of the 48-bit w) + 1, as WBITS - floor(log2 w).

    floor(log2) is computed INTEGER-EXACTLY as the bit length of w: the
    float form floor(F.log2(w)) rides a libm boundary — Spark's Log2 is
    StrictMath.log(x)/log(2) (can land a hair BELOW the exact value at
    powers of two, e.g. log2(8) -> 2.9999999999999996 -> floor 2) while
    DuckDB's log2 is exact there — a 1-off register that flips the
    harmonic sum and fails the hash gate (the q152/q177 float-group-key
    discipline). Keep in lockstep with _HLL_RHO_SQL.
    """
    return F.when(F.col("w") == 0, F.lit(Q158_WBITS + 1)).otherwise(
        F.lit(Q158_WBITS) - (F.length(F.bin("w")) - 1).cast("bigint")
    )


# DuckDB twin of _hll_rho() — length(bin(w)) - 1 is the same integer-exact
# bit length (bin() of BIGINT has no leading zeros)
_HLL_RHO_SQL = (
    f"CASE WHEN w = 0 THEN {Q158_WBITS + 1} "
    f"ELSE {Q158_WBITS} - (length(bin(w)) - 1) END"
)


@register(
    "q158_hll_sketch",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    parts AS (
      SELECT event_type,
             CAST('0x' || substr(hx, 1, 2) AS BIGINT) % {Q158_M} AS bucket,
             CAST('0x' || substr(hx, 3, 12) AS BIGINT) AS w
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket,
             max({_HLL_RHO_SQL}) AS rho
      FROM parts GROUP BY 1, 2
    ),
    sketch AS (
      SELECT event_type,
             sum(power(2.0, -rho)) + ({Q158_M} - count(*)) AS s,
             {Q158_M} - count(*) AS v
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT event_type,
             {Q158_ALPHA} * {Q158_M} * {Q158_M} / s AS e_raw, v
      FROM sketch
    ),
    corrected AS (
      SELECT event_type,
             CASE WHEN e_raw <= 2.5 * {Q158_M} AND v > 0
                  THEN {Q158_M} * ln({Q158_M} * 1.0 / v)
                  ELSE e_raw END AS e
      FROM est
    ),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
      GROUP BY 1
    )
    SELECT c.event_type,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           round(c.e, 4) AS hll_estimate,
           round(abs(c.e - x.n_exact) / x.n_exact, 4) AS rel_err
    FROM corrected c JOIN exact x ON c.event_type = x.event_type
    """,
)
def q158_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    h = ev.select("event_type", hx.alias("hx")).distinct()
    parts = h.select("event_type", *_hll_parts_cols())
    regs = parts.groupBy("event_type", "bucket").agg(
        F.max(_hll_rho()).alias("rho")
    )
    sketch = regs.groupBy("event_type").agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("rho")))
            + (Q158_M - F.count("*"))
        ).alias("s"),
        (Q158_M - F.count("*")).alias("v"),
    )
    e_raw = F.lit(Q158_ALPHA * Q158_M * Q158_M) / F.col("s")
    e = F.when(
        (e_raw <= 2.5 * Q158_M) & (F.col("v") > 0),
        Q158_M * F.log(Q158_M * 1.0 / F.col("v")),
    ).otherwise(e_raw)
    est = sketch.select("event_type", e.alias("e"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        F.round("e", 4).alias("hll_estimate"),
        F.round(F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


# --------------------------------------------------------------------------
# q174 — sketch-space set operations: audience overlap between event
# types from HLL registers ALONE. Union = element-wise register max (the
# same merge that makes HLL distributable, q158); intersection by
# inclusion-exclusion |A∩B| ~ |A|+|B|-|A∪B|. The exact intersection rides
# along to show the sketch error — at 100 TB the exact pass is the
# expensive one (distinct users across two event streams) and the sketch
# answer costs O(m) per pair, which is the whole point of storing
# register tables per segment.
# --------------------------------------------------------------------------
Q174_PAIRS = (("click", "purchase"), ("view", "signup"), ("click", "view"))

_PAIR_SQL = ", ".join(f"('{a}', '{b}')" for a, b in Q174_PAIRS)


def _hll_est_sql(s: str, v: str) -> str:
    """Small-range-corrected HLL estimate from (harmonic sum, zero count)."""
    return f"""CASE WHEN {Q158_ALPHA} * {Q158_M} * {Q158_M} / {s}
                         <= 2.5 * {Q158_M} AND {v} > 0
                    THEN {Q158_M} * ln({Q158_M} * 1.0 / {v})
                    ELSE {Q158_ALPHA} * {Q158_M} * {Q158_M} / {s} END"""


@register(
    "q174_hll_setops",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, user_id,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    parts AS (
      SELECT event_type, user_id,
             CAST('0x' || substr(hx, 1, 2) AS BIGINT) % {Q158_M} AS bucket,
             CAST('0x' || substr(hx, 3, 12) AS BIGINT) AS w
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket,
             max({_HLL_RHO_SQL}) AS rho
      FROM parts GROUP BY 1, 2
    ),
    pairs AS (SELECT * FROM (VALUES {_PAIR_SQL}) AS t(ta, tb)),
    -- per-pair register table: tag each side's registers, group by bucket
    -- (a bucket empty on one side contributes rho 0 there); union = max
    tagged AS (
      SELECT p.ta, p.tb, r.bucket, r.rho AS rho_a, 0 AS rho_b
      FROM pairs p JOIN regs r ON r.event_type = p.ta
      UNION ALL
      SELECT p.ta, p.tb, r.bucket, 0, r.rho
      FROM pairs p JOIN regs r ON r.event_type = p.tb
    ),
    u AS (
      SELECT ta, tb, bucket,
             max(rho_a) AS rho_a, max(rho_b) AS rho_b,
             greatest(max(rho_a), max(rho_b)) AS rho_u
      FROM tagged GROUP BY 1, 2, 3
    ),
    sums AS (
      SELECT ta, tb,
             sum(power(2.0, -rho_a)) + ({Q158_M} - count(*)) AS sa,
             sum(CASE WHEN rho_a = 0 THEN 1 ELSE 0 END)
                 + ({Q158_M} - count(*)) AS va,
             sum(power(2.0, -rho_b)) + ({Q158_M} - count(*)) AS sb,
             sum(CASE WHEN rho_b = 0 THEN 1 ELSE 0 END)
                 + ({Q158_M} - count(*)) AS vb,
             sum(power(2.0, -rho_u)) + ({Q158_M} - count(*)) AS su,
             sum(CASE WHEN rho_u = 0 THEN 1 ELSE 0 END)
                 + ({Q158_M} - count(*)) AS vu
      FROM u GROUP BY 1, 2
    ),
    est AS (
      SELECT ta, tb,
             {_hll_est_sql('sa', 'va')} AS ea,
             {_hll_est_sql('sb', 'vb')} AS eb,
             {_hll_est_sql('su', 'vu')} AS eu
      FROM sums
    ),
    exact AS (
      SELECT p.ta, p.tb, count(*) AS n_exact_inter
      FROM pairs p
      JOIN (SELECT a.user_id, a.event_type AS ta, b.event_type AS tb
            FROM (SELECT DISTINCT event_type, user_id FROM events) a
            JOIN (SELECT DISTINCT event_type, user_id FROM events) b
              USING (user_id)) x
        ON x.ta = p.ta AND x.tb = p.tb
      GROUP BY 1, 2
    )
    SELECT est.ta AS type_a, est.tb AS type_b,
           round(est.ea, 4) AS est_a,
           round(est.eb, 4) AS est_b,
           round(est.eu, 4) AS est_union,
           round(est.ea + est.eb - est.eu, 4) AS est_intersection,
           CAST(exact.n_exact_inter AS BIGINT) AS n_exact_inter
    FROM est JOIN exact ON est.ta = exact.ta AND est.tb = exact.tb
    """,
)
def q174_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    h = ev.select("event_type", "user_id").distinct().select(
        "event_type", "user_id", hx.alias("hx")
    )
    parts = h.select("event_type", "user_id", *_hll_parts_cols())
    regs = parts.groupBy("event_type", "bucket").agg(
        F.max(_hll_rho()).alias("rho")
    )
    pairs = spark.createDataFrame(list(Q174_PAIRS), ["ta", "tb"])

    tagged = (
        F.broadcast(pairs)
        .join(regs, F.col("event_type") == F.col("ta"))
        .select("ta", "tb", "bucket", F.col("rho").alias("rho_a"),
                F.lit(0).alias("rho_b"))
        .unionAll(
            F.broadcast(pairs)
            .join(regs, F.col("event_type") == F.col("tb"))
            .select("ta", "tb", "bucket", F.lit(0).alias("rho_a"),
                    F.col("rho").alias("rho_b"))
        )
    )
    u = tagged.groupBy("ta", "tb", "bucket").agg(
        F.max("rho_a").alias("rho_a"),
        F.max("rho_b").alias("rho_b"),
        F.greatest(F.max("rho_a"), F.max("rho_b")).alias("rho_u"),
    )

    def _sums(col: str, prefix: str):
        return [
            (
                F.sum(F.pow(F.lit(2.0), -F.col(col)))
                + (Q158_M - F.count("*"))
            ).alias(f"s{prefix}"),
            (
                F.sum(F.when(F.col(col) == 0, 1).otherwise(0))
                + (Q158_M - F.count("*"))
            ).alias(f"v{prefix}"),
        ]

    sums = u.groupBy("ta", "tb").agg(
        *_sums("rho_a", "a"), *_sums("rho_b", "b"), *_sums("rho_u", "u")
    )

    def _est(s: str, v: str):
        e_raw = F.lit(Q158_ALPHA * Q158_M * Q158_M) / F.col(s)
        return F.when(
            (e_raw <= 2.5 * Q158_M) & (F.col(v) > 0),
            Q158_M * F.log(Q158_M * 1.0 / F.col(v)),
        ).otherwise(e_raw)

    est = sums.select(
        "ta",
        "tb",
        _est("sa", "va").alias("ea"),
        _est("sb", "vb").alias("eb"),
        _est("su", "vu").alias("eu"),
    )
    du = ev.select("event_type", "user_id").distinct()
    ua = du.select(F.col("event_type").alias("ta"), "user_id")
    ub = du.select(F.col("event_type").alias("tb"), "user_id")
    exact = (
        F.broadcast(pairs)
        .join(ua, "ta")
        .join(ub, ["tb", "user_id"])
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("bigint").alias("n_exact_inter"))
    )
    return est.join(exact, ["ta", "tb"]).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.round("ea", 4).alias("est_a"),
        F.round("eb", 4).alias("est_b"),
        F.round("eu", 4).alias("est_union"),
        F.round(F.col("ea") + F.col("eb") - F.col("eu"), 4).alias(
            "est_intersection"
        ),
        "n_exact_inter",
    )
