"""In-engine statistical modeling (q185-q191, q194): exactly-
reproducible model fitting, experiment analysis, and offline policy
evaluation as DataFrame plans.

- q185 multivariate OLS through the normal equations with EXACT
  decimal(38,0) moment sums (the q114 PCA trick): quantities, discounts
  and prices are scaled to integers, every X'X / X'y entry is an exact
  integer aggregate (order-independent, engine-independent), and the
  3x3 Cramer solve happens on those exact moments — so the fitted
  coefficients value-hash across engines (within the decimal(38,0)
  product budget — see the q185 header for the overflow bound and the
  at-scale mitigations). This is "train the curation model in the
  engine" without the float-summation nondeterminism that forces most
  ML fits to rows-only checks.
- q186 Kaplan-Meier survival over user lifetimes (signup -> first
  error, censored otherwise): the estimator is a cumulative product
  over ORDERED event times — both engines multiply in the same order,
  so S(t) is deterministic.
- q187 two-sample A/B z-test with md5-hash assignment — the
  deterministic-bucketing experiment readout.

Scale notes: each query is one or two map-side-combinable aggregates
over the fact table plus O(groups)-sized arithmetic; the OLS solve
touches a 3x3 matrix on the driver-free rollup row. Nothing grows with
data except the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import materialize, register


def _arm():
    """Deterministic experiment-arm assignment from the user_id md5.

    This hash IS the experiment contract: q187's readout, q190's CUPED
    adjustment and q191's quantile effects are only cross-comparable
    because all three split users identically — which is why the
    expression lives here once (a one-sided edit of an inlined copy
    would silently break comparability while each query still passed
    its own oracle). Keep in lockstep with ``_ARM_SQL``.
    """
    return F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")


# DuckDB twin of _arm() — interpolated into the q187/q190/q191 oracles
_ARM_SQL = """CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END"""


# --------------------------------------------------------------------------
# q185 — OLS: price_cents ~ b0 + b1*quantity + b2*discount_bp over
# lineitem, via exact-decimal normal equations + Cramer's rule.
#
# Exactness budget: the Cramer products are three-factor moments, so the
# largest term is ~n * sqp * sdd. decimal(38,0) holds ~1e38 — exact up
# to roughly sf700 lineitem (~4e9 rows); DuckDB's HUGEINT (~1.7e38)
# errors LOUDLY on overflow while Spark's non-ANSI decimal returns NULL
# silently. Past that scale, run with spark.sql.ansi.enabled=true (loud
# parity with the oracle) or center the regressors first — the moments
# about the mean are ~n*var-sized, shrinking the products by ~(mean/sd)^2.
# --------------------------------------------------------------------------
_DEC = "decimal(38,0)"


@register(
    "q185_multivar_ols",
    oracle="""
    WITH x AS (
      SELECT CAST(round(l_quantity) AS HUGEINT) AS q,
             CAST(round(l_discount * 100) AS HUGEINT) AS d,
             CAST(round(l_extendedprice * 100) AS HUGEINT) AS p
      FROM lineitem
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(q) AS sq, sum(d) AS sd, sum(p) AS sp,
             sum(q * q) AS sqq, sum(q * d) AS sqd, sum(d * d) AS sdd,
             sum(q * p) AS sqp, sum(d * p) AS sdp
      FROM x
    ),
    det AS (
      SELECT n, sq, sd, sp, sqq, sqd, sdd, sqp, sdp,
             n * (sqq * sdd - sqd * sqd)
             - sq * (sq * sdd - sqd * sd)
             + sd * (sq * sqd - sqq * sd) AS dd
      FROM m
    ),
    sol AS (
      SELECT
        (sp * (sqq * sdd - sqd * sqd)
         - sq * (sqp * sdd - sqd * sdp)
         + sd * (sqp * sqd - sqq * sdp)) AS d0,
        (n * (sqp * sdd - sdp * sqd)
         - sp * (sq * sdd - sqd * sd)
         + sd * (sq * sdp - sqp * sd)) AS d1,
        (n * (sqq * sdp - sqd * sqp)
         - sq * (sq * sdp - sqp * sd)
         + sp * (sq * sqd - sqq * sd)) AS d2,
        dd, n
      FROM det
    )
    SELECT round(CAST(d0 AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS b0_cents,
           round(CAST(d1 AS DOUBLE) / CAST(dd AS DOUBLE), 6)
               AS b1_per_unit_cents,
           round(CAST(d2 AS DOUBLE) / CAST(dd AS DOUBLE), 6)
               AS b2_per_bp_cents,
           CAST(n AS BIGINT) AS n_rows
    FROM sol
    """,
)
def q185_multivar_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = li.select(
        F.round("l_quantity").cast(_DEC).alias("q"),
        F.round(F.col("l_discount") * 100).cast(_DEC).alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast(_DEC).alias("p"),
    )
    m = x.agg(
        F.count("*").cast(_DEC).alias("n"),
        F.sum("q").cast(_DEC).alias("sq"),
        F.sum("d").cast(_DEC).alias("sd"),
        F.sum("p").cast(_DEC).alias("sp"),
        F.sum(F.col("q") * F.col("q")).cast(_DEC).alias("sqq"),
        F.sum(F.col("q") * F.col("d")).cast(_DEC).alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast(_DEC).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).cast(_DEC).alias("sqp"),
        F.sum(F.col("d") * F.col("p")).cast(_DEC).alias("sdp"),
    )
    n, sq, sd, sp = F.col("n"), F.col("sq"), F.col("sd"), F.col("sp")
    sqq, sqd, sdd = F.col("sqq"), F.col("sqd"), F.col("sdd")
    sqp, sdp = F.col("sqp"), F.col("sdp")
    dd = (
        n * (sqq * sdd - sqd * sqd)
        - sq * (sq * sdd - sqd * sd)
        + sd * (sq * sqd - sqq * sd)
    )
    d0 = (
        sp * (sqq * sdd - sqd * sqd)
        - sq * (sqp * sdd - sqd * sdp)
        + sd * (sqp * sqd - sqq * sdp)
    )
    d1 = (
        n * (sqp * sdd - sdp * sqd)
        - sp * (sq * sdd - sqd * sd)
        + sd * (sq * sdp - sqp * sd)
    )
    d2 = (
        n * (sqq * sdp - sqd * sqp)
        - sq * (sq * sdp - sqp * sd)
        + sp * (sq * sqd - sqq * sd)
    )
    return m.select(
        F.round(d0.cast("double") / dd.cast("double"), 6).alias("b0_cents"),
        F.round(d1.cast("double") / dd.cast("double"), 6).alias(
            "b1_per_unit_cents"
        ),
        F.round(d2.cast("double") / dd.cast("double"), 6).alias(
            "b2_per_bp_cents"
        ),
        F.col("n").cast("bigint").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# q186 — Kaplan-Meier user survival: lifetime = signup -> first error
# (event) else -> last observed activity (censored). S(t) is the
# cumulative product of (1 - d_i/n_i) over ordered distinct event days;
# both engines multiply in day order, so the curve value-hashes. Windows
# are over the (tiny) per-day death/censor rollup, not the event stream.
# --------------------------------------------------------------------------
@register(
    "q186_kaplan_meier",
    oracle="""
    WITH lt AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'error' THEN ts END) AS t_err,
             max(ts) AS t_last
      FROM events GROUP BY 1
    ),
    life AS (
      SELECT user_id,
             CAST(epoch_us(coalesce(t_err, t_last) - t0) // 86400000000
                  AS BIGINT) AS days,
             CAST(t_err IS NOT NULL AS INT) AS died
      FROM lt WHERE t0 IS NOT NULL
                AND coalesce(t_err, t_last) >= t0
    ),
    tot AS (SELECT count(*) AS n0 FROM life),
    byday AS (
      SELECT days, sum(died) AS d, count(*) AS leaving
      FROM life GROUP BY 1
    ),
    risk AS (
      SELECT days, d,
             n0 - coalesce(sum(leaving) OVER (ORDER BY days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_at_risk
      FROM byday CROSS JOIN tot
    ),
    km AS (
      -- a day where every at-risk user dies drives S to exactly 0: guard
      -- the log argument (DuckDB errors on ln(0), Spark nulls) and zero
      -- the curve from that absorbing day on
      SELECT days, d, n_at_risk,
             CASE WHEN max(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY days ROWS UNBOUNDED PRECEDING) = 1
                  THEN 0.0
                  ELSE exp(sum(CASE WHEN d < n_at_risk
                                    THEN ln(1 - d * 1.0 / n_at_risk)
                                    ELSE 0.0 END)
                           OVER (ORDER BY days ROWS UNBOUNDED PRECEDING))
             END AS s
      FROM risk WHERE d > 0
    )
    SELECT CAST(days AS BIGINT) AS day,
           CAST(d AS BIGINT) AS n_deaths,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           round(s, 6) AS survival
    FROM km
    """,
)
def q186_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    lt = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t0"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias(
            "t_err"
        ),
        F.max("ts").alias("t_last"),
    )
    end = F.coalesce("t_err", "t_last")
    # microsecond-exact day key (q196's discipline): unix_timestamp
    # truncates to whole seconds while the oracle's interval epoch is
    # exact, so a sub-second-straddling lifetime could land in different
    # day buckets per engine. diff >= 0 (filter), so div == floor.
    life = lt.filter(F.col("t0").isNotNull() & (end >= F.col("t0"))).select(
        F.expr(
            "(unix_micros(coalesce(t_err, t_last)) - unix_micros(t0))"
            " div 86400000000"
        )
        .cast("bigint")
        .alias("days"),
        F.col("t_err").isNotNull().cast("int").alias("died"),
    )
    tot = life.agg(F.count("*").alias("n0"))
    byday = life.groupBy("days").agg(
        F.sum("died").alias("d"), F.count("*").alias("leaving")
    )
    wprev = Window.orderBy("days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byday.crossJoin(F.broadcast(tot)).select(
        "days",
        "d",
        (
            F.col("n0")
            - F.coalesce(F.sum("leaving").over(wprev), F.lit(0))
        ).alias("n_at_risk"),
    )
    wcum = Window.orderBy("days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # absorbing-zero guard: a day with d == n_at_risk drives S to exactly
    # 0 (the log term is kept out of the sum on both engines)
    term = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.log(1 - F.col("d") * F.lit(1.0) / F.col("n_at_risk")),
    ).otherwise(F.lit(0.0))
    absorbed = F.max(
        (F.col("d") >= F.col("n_at_risk")).cast("int")
    ).over(wcum)
    km = risk.filter(F.col("d") > 0).select(
        "days",
        "d",
        "n_at_risk",
        F.when(absorbed == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum(term).over(wcum)))
        .alias("s"),
    )
    return km.select(
        F.col("days").cast("bigint").alias("day"),
        F.col("d").cast("bigint").alias("n_deaths"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.round("s", 6).alias("survival"),
    )


# --------------------------------------------------------------------------
# q187 — A/B experiment readout: deterministic md5 bucket split of users
# into control/treatment, compare mean purchase value with Welch's
# z-statistic. The assignment hash makes the experiment replayable; all
# aggregates are map-side-combined scans.
# --------------------------------------------------------------------------
@register(
    "q187_ab_test",
    oracle=f"""
    WITH assigned AS (
      SELECT {_ARM_SQL} AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    stats AS (
      SELECT arm, count(*) AS n, avg(value) AS mean,
             sum(value * value) / count(*) - avg(value) * avg(value) AS v
      FROM assigned GROUP BY 1
    ),
    wide AS (
      SELECT
        max(CASE WHEN arm = 'control' THEN n END) AS nc,
        max(CASE WHEN arm = 'control' THEN mean END) AS mc,
        max(CASE WHEN arm = 'control' THEN v END) AS vc,
        max(CASE WHEN arm = 'treatment' THEN n END) AS nt,
        max(CASE WHEN arm = 'treatment' THEN mean END) AS mt,
        max(CASE WHEN arm = 'treatment' THEN v END) AS vt
      FROM stats
    )
    SELECT CAST(nc AS BIGINT) AS n_control,
           CAST(nt AS BIGINT) AS n_treatment,
           round(mc, 4) AS mean_control,
           round(mt, 4) AS mean_treatment,
           round(mt - mc, 4) AS lift,
           round((mt - mc) / sqrt(vc / nc + vt / nt), 4) AS z_stat
    FROM wide
    """,
)
def q187_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    assigned = ev.filter(F.col("event_type") == "purchase").select(
        _arm().alias("arm"), "value"
    )
    stats = assigned.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        (
            F.sum(F.col("value") * F.col("value")) / F.count("*")
            - F.avg("value") * F.avg("value")
        ).alias("v"),
    )
    wide = stats.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("arm") == "control", F.col("mean"))).alias("mc"),
        F.max(F.when(F.col("arm") == "control", F.col("v"))).alias("vc"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("arm") == "treatment", F.col("mean"))).alias("mt"),
        F.max(F.when(F.col("arm") == "treatment", F.col("v"))).alias("vt"),
    )
    return wide.select(
        F.col("nc").cast("bigint").alias("n_control"),
        F.col("nt").cast("bigint").alias("n_treatment"),
        F.round("mc", 4).alias("mean_control"),
        F.round("mt", 4).alias("mean_treatment"),
        F.round(F.col("mt") - F.col("mc"), 4).alias("lift"),
        F.round(
            (F.col("mt") - F.col("mc"))
            / F.sqrt(F.col("vc") / F.col("nc") + F.col("vt") / F.col("nt")),
            4,
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# q188 — split conformal prediction: calibrate a distribution-free
# prediction interval for event values. Model = per-type mean fit on a
# PROPER-TRAINING sub-half; nonconformity = |value - mean| scored on a
# DISJOINT calibration sub-half (the disjointness is what makes the
# finite-sample coverage guarantee of split conformal hold — ADVICE r4);
# qhat = the ceil((n+1)(1-alpha)) smallest calibration score; report the
# guaranteed-coverage check on the held-out half. Both split levels are
# md5 hash bits (replayable); the quantile picks an EXACT calibration
# element — via operators/selection.py's bounded-histogram k-th-smallest
# (the calibration set is ~25% of the fact table, so a global rank
# window would be a one-task sort at scale) — so the interval
# value-hashes against the oracle's rank-window form.
# --------------------------------------------------------------------------
Q188_ALPHA = 0.1


@register(
    "q188_conformal_interval",
    oracle=f"""
    WITH split AS (
      SELECT event_type, value, event_id,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 2 AS half,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 16, 1)
                  AS BIGINT) % 2 AS sub
      FROM events
    ),
    model AS (
      SELECT event_type, avg(value) AS mu
      FROM split WHERE half = 0 AND sub = 0 GROUP BY 1
    ),
    cal AS (
      SELECT s.event_type, abs(s.value - m.mu) AS score
      FROM split s JOIN model m USING (event_type)
      WHERE s.half = 0 AND s.sub = 1
    ),
    ncal AS (SELECT count(*) AS n FROM cal),
    qhat AS (
      SELECT score FROM (
        SELECT score, row_number() OVER (ORDER BY score, score) AS rk
        FROM cal)
      CROSS JOIN ncal
      WHERE rk = CAST(ceil((ncal.n + 1) * (1 - {Q188_ALPHA})) AS BIGINT)
    ),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN abs(s.value - m.mu) <= q.score
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM split s JOIN model m USING (event_type) CROSS JOIN qhat q
      WHERE s.half = 1
    )
    SELECT round(q.score, 6) AS qhat,
           t.n_test, t.n_covered,
           round(t.n_covered * 1.0 / t.n_test, 6) AS coverage
    FROM qhat q CROSS JOIN test t
    """,
)
def q188_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load(spark, sf_dir, "events")
    half = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2
    )
    # second hash bit sub-splits half 0 into disjoint fit / calibration
    # sets (proper split conformal)
    sub = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 16, 1), 16, 10)
        .cast("bigint")
        % 2
    )
    split = ev.select("event_type", "value", half.alias("half"), sub.alias("sub"))
    model = (
        split.filter((F.col("half") == 0) & (F.col("sub") == 0))
        .groupBy("event_type")
        .agg(F.avg("value").alias("mu"))
    )
    cal = (
        split.filter((F.col("half") == 0) & (F.col("sub") == 1))
        .join(F.broadcast(model), "event_type")
        .select(F.abs(F.col("value") - F.col("mu")).alias("score"))
    )
    from ..operators.selection import exact_kth_smallest

    # freeze the calibration scores once — count(), the selection's stats/
    # histogram passes and the bucket sort all consume them; without the
    # barrier each action would recompute the split+broadcast-join lineage
    cal = materialize(cal)
    n_cal = cal.count()
    rank = math.ceil((n_cal + 1) * (1 - Q188_ALPHA))
    qhat = exact_kth_smallest(cal, "score", rank)
    test = (
        split.filter(F.col("half") == 1)
        .join(F.broadcast(model), "event_type")
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                (F.abs(F.col("value") - F.col("mu")) <= F.col("score")).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return (
        qhat.crossJoin(test)
        .select(
            F.round("score", 6).alias("qhat"),
            "n_test",
            "n_covered",
            F.round(F.col("n_covered") * F.lit(1.0) / F.col("n_test"), 6).alias(
                "coverage"
            ),
        )
    )


# --------------------------------------------------------------------------
# q189 — Poisson bootstrap confidence interval (the distributed
# bootstrap: per-row replicate weights ~ Poisson(1), drawn from the
# md5-seeded inverse CDF, so no replicate ever needs a global resample
# pass and the whole thing is one linear scan x B). CI bounds are order
# statistics of the B replicate means. Fully replayable — no RNG
# service, the "seeded release" property of q167 applied to inference.
# --------------------------------------------------------------------------
Q189_B = 32
_POISSON_CDF = [
    0.36787944117144233,  # k = 0
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]
_TWO48_B = 281_474_976_710_656


def _poisson_k_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    return f"CASE {cases} ELSE 7 END"


@register(
    "q189_poisson_bootstrap",
    oracle=f"""
    WITH purch AS (
      SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ),
    reps AS (SELECT unnest(range({Q189_B})) AS b),
    weighted AS (
      SELECT r.b, p.value,
             {_poisson_k_sql(
                 "CAST('0x' || substr(md5(CAST(p.event_id AS VARCHAR) || '|' "
                 "|| CAST(r.b AS VARCHAR)), 1, 12) AS BIGINT) * 1.0 / "
                 + str(_TWO48_B)
             )} AS k
      FROM purch p CROSS JOIN reps r
    ),
    means AS (
      SELECT b, round(sum(k * value) / sum(k), 4) AS m
      FROM weighted GROUP BY b HAVING sum(k) > 0
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rk,
             count(*) OVER () AS nb
      FROM means
    ),
    base AS (SELECT round(avg(value), 4) AS point FROM purch)
    SELECT base.point,
           (SELECT m FROM ranked
            WHERE rk = CAST(ceil(nb * 0.025) AS BIGINT)) AS ci_lo,
           (SELECT m FROM ranked
            WHERE rk = CAST(ceil(nb * 0.975) AS BIGINT)) AS ci_hi,
           CAST({Q189_B} AS BIGINT) AS n_replicates
    FROM base
    """,
)
def q189_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    reps = spark.range(Q189_B).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        * F.lit(1.0)
        / _TWO48_B
    )
    k = F.lit(7)
    for kk in range(len(_POISSON_CDF) - 1, -1, -1):
        k = F.when(u < _POISSON_CDF[kk], F.lit(kk)).otherwise(k)
    weighted = purch.crossJoin(F.broadcast(reps)).select(
        "b", "value", k.alias("k")
    )
    means = (
        weighted.groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("k") * F.col("value")) / F.sum("k"), 4
            ).alias("m"),
            F.sum("k").alias("nk"),
        )
        .filter(F.col("nk") > 0)
        .select("b", "m")
    )
    wr = Window.orderBy("m", "b")
    # nb = SURVIVING replicate count (after the sum(k) > 0 guard), exactly
    # as the oracle's count(*) OVER () — deriving it from Q189_B would pick
    # different order statistics if a replicate ever drew all-zero Poisson
    # weights (ADVICE r4). The global window is over <= B rows — free.
    wall = Window.partitionBy()
    ranked = means.select(
        "m",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wall).alias("nb"),
    )
    lo = ranked.filter(
        F.col("rk") == F.ceil(F.col("nb") * 0.025).cast("bigint")
    ).select(F.col("m").alias("ci_lo"))
    hi = ranked.filter(
        F.col("rk") == F.ceil(F.col("nb") * 0.975).cast("bigint")
    ).select(F.col("m").alias("ci_hi"))
    base = purch.agg(F.round(F.avg("value"), 4).alias("point"))
    # left joins, not crossJoins: if no replicate survives the sum(k) > 0
    # guard (degenerate all-zero draw), lo/hi are EMPTY and a cross join
    # would return 0 rows — the oracle's scalar subqueries return one row
    # with NULL CIs instead (r7 review)
    return (
        base.join(F.broadcast(lo), F.lit(True), "left")
        .join(F.broadcast(hi), F.lit(True), "left")
        .select(
            "point",
            "ci_lo",
            "ci_hi",
            F.lit(Q189_B).cast("bigint").alias("n_replicates"),
        )
    )


# --------------------------------------------------------------------------
# q190 — CUPED variance reduction (Deng et al. 2013): adjust the
# experiment metric (second-half purchase value per user) by the
# pre-period covariate (first-half value), theta = cov(pre, post) /
# var(pre) fitted on the POOLED data, and report per-arm means plus the
# variance-reduction percentage — the standard lever that makes A/B
# tests (q187) converge faster. Per-user rollups are one groupBy;
# moments are scan aggregates.
# --------------------------------------------------------------------------
Q190_SPLIT = "2024-01-16"


@register(
    "q190_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {_ARM_SQL} AS arm,
             sum(CASE WHEN ts < TIMESTAMP '{Q190_SPLIT}'
                      AND event_type = 'purchase' THEN value ELSE 0 END)
                 AS pre,
             sum(CASE WHEN ts >= TIMESTAMP '{Q190_SPLIT}'
                      AND event_type = 'purchase' THEN value ELSE 0 END)
                 AS post
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT avg(pre) AS mp, avg(post) AS mq,
             avg(pre * post) - avg(pre) * avg(post) AS cov,
             avg(pre * pre) - avg(pre) * avg(pre) AS varp
      FROM per_user
    ),
    adj AS (
      SELECT u.arm, u.post,
             u.post - (m.cov / m.varp) * (u.pre - m.mp) AS cuped
      FROM per_user u CROSS JOIN mom m
    )
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(post), 4) AS mean_post,
           round(avg(cuped), 4) AS mean_cuped,
           round(100 * (1 - (avg(cuped * cuped) - avg(cuped) * avg(cuped))
                 / (avg(post * post) - avg(post) * avg(post))), 2)
               AS var_reduction_pct
    FROM adj GROUP BY arm
    """,
)
def q190_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    arm = _arm()
    is_purch = F.col("event_type") == "purchase"
    pre_cut = F.col("ts") < F.lit(Q190_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.sum(F.when(is_purch & pre_cut, F.col("value")).otherwise(0.0)).alias(
            "pre"
        ),
        F.sum(
            F.when(is_purch & ~pre_cut, F.col("value")).otherwise(0.0)
        ).alias("post"),
    )
    mom = per_user.agg(
        F.avg("pre").alias("mp"),
        (F.avg(F.col("pre") * F.col("post")) - F.avg("pre") * F.avg("post")).alias(
            "cov"
        ),
        (F.avg(F.col("pre") * F.col("pre")) - F.avg("pre") * F.avg("pre")).alias(
            "varp"
        ),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).select(
        "arm",
        "post",
        (
            F.col("post")
            - (F.col("cov") / F.col("varp")) * (F.col("pre") - F.col("mp"))
        ).alias("cuped"),
    )
    return adj.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg("post"), 4).alias("mean_post"),
        F.round(F.avg("cuped"), 4).alias("mean_cuped"),
        F.round(
            100
            * (
                1
                - (
                    F.avg(F.col("cuped") * F.col("cuped"))
                    - F.avg("cuped") * F.avg("cuped")
                )
                / (
                    F.avg(F.col("post") * F.col("post"))
                    - F.avg("post") * F.avg("post")
                )
            ),
            2,
        ).alias("var_reduction_pct"),
    )


# --------------------------------------------------------------------------
# q191 — quantile treatment effects: the A/B readout q187 compares
# means; QTE compares the full distributions — per-arm EXACT deciles
# (rank = ceil(q*n), the q44 discipline: no interpolation, both engines
# pick the identical element) and their differences. Detects effects
# that concentrate in the tails and never move the mean.
# --------------------------------------------------------------------------
Q191_QUANTILES = (0.1, 0.25, 0.5, 0.75, 0.9)

_Q191_QS = ", ".join(f"({q})" for q in Q191_QUANTILES)


@register(
    "q191_quantile_effects",
    oracle=f"""
    WITH assigned AS (
      SELECT {_ARM_SQL} AS arm,
             value, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT arm, value,
             row_number() OVER (PARTITION BY arm
                                ORDER BY value, event_id) AS rk,
             count(*) OVER (PARTITION BY arm) AS n
      FROM assigned
    ),
    qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {_Q191_QS}) AS t(q)),
    picked AS (
      SELECT qs.q, r.arm, r.value
      FROM qs JOIN ranked r
        ON r.rk = CAST(ceil(qs.q * r.n) AS BIGINT)
    )
    SELECT q AS quantile,
           round(max(CASE WHEN arm = 'control' THEN value END), 2)
               AS control_v,
           round(max(CASE WHEN arm = 'treatment' THEN value END), 2)
               AS treatment_v,
           round(max(CASE WHEN arm = 'treatment' THEN value END)
                 - max(CASE WHEN arm = 'control' THEN value END), 2) AS qte
    FROM picked GROUP BY q
    """,
)
def q191_quantile_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    assigned = ev.filter(F.col("event_type") == "purchase").select(
        _arm().alias("arm"), "value", "event_id"
    )
    wr = Window.partitionBy("arm").orderBy("value", "event_id")
    wn = Window.partitionBy("arm")
    ranked = assigned.select(
        "arm",
        "value",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    qs = spark.createDataFrame([(q,) for q in Q191_QUANTILES], ["q"])
    picked = F.broadcast(qs).join(
        ranked, F.col("rk") == F.ceil(F.col("q") * F.col("n")).cast("bigint")
    )
    return picked.groupBy(F.col("q").alias("quantile")).agg(
        F.round(
            F.max(F.when(F.col("arm") == "control", F.col("value"))), 2
        ).alias("control_v"),
        F.round(
            F.max(F.when(F.col("arm") == "treatment", F.col("value"))), 2
        ).alias("treatment_v"),
        F.round(
            F.max(F.when(F.col("arm") == "treatment", F.col("value")))
            - F.max(F.when(F.col("arm") == "control", F.col("value"))),
            2,
        ).alias("qte"),
    )


# --------------------------------------------------------------------------
# q194 — offline UCB bandit replay: treat the five event types as arms,
# replay the stream day by day, and pick each day's arm by UCB1
# (prior-day mean + sqrt(2 ln N / n)) computed ONLY from strictly-prior
# days — then score the choice against the arm's realized mean that day.
# The standard offline policy-evaluation harness, expressed as
# cumulative windows over the (day, arm) rollup — ~150 rows of state,
# never the raw stream, and no sequential driver loop: the per-day
# "prior" is an exclusive cumulative window.
# --------------------------------------------------------------------------
@register(
    "q194_ucb_replay",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type AS arm,
             count(*) AS n, sum(value) AS s, avg(value) AS realized
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT day, arm, realized,
             sum(n) OVER (PARTITION BY arm ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS n_prior,
             sum(s) OVER (PARTITION BY arm ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS s_prior
      FROM daily
    ),
    tot AS (
      SELECT day, arm, realized, n_prior, s_prior,
             sum(n_prior) OVER (PARTITION BY day) AS big_n
      FROM cum WHERE n_prior IS NOT NULL AND n_prior > 0
    ),
    scored AS (
      SELECT day, arm, realized,
             s_prior / n_prior + sqrt(2 * ln(big_n) / n_prior) AS ucb
      FROM tot
    ),
    chosen AS (
      SELECT day, arm, realized, ucb,
             row_number() OVER (PARTITION BY day
                                ORDER BY round(ucb, 6) DESC, arm) AS rk
      FROM scored
    )
    SELECT day, arm AS chosen_arm,
           round(ucb, 4) AS ucb_score,
           round(realized, 4) AS realized_mean
    FROM chosen WHERE rk = 1
    """,
)
def q194_ucb_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.col("event_type").alias("arm"),
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.avg("value").alias("realized"),
    )
    wprior = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = daily.select(
        "day",
        "arm",
        "realized",
        F.sum("n").over(wprior).alias("n_prior"),
        F.sum("s").over(wprior).alias("s_prior"),
    ).filter(F.col("n_prior").isNotNull() & (F.col("n_prior") > 0))
    wday = Window.partitionBy("day")
    tot = cum.select(
        "day",
        "arm",
        "realized",
        "n_prior",
        "s_prior",
        F.sum("n_prior").over(wday).alias("big_n"),
    )
    ucb = F.col("s_prior") / F.col("n_prior") + F.sqrt(
        2 * F.log("big_n") / F.col("n_prior")
    )
    wrk = Window.partitionBy("day").orderBy(
        F.desc(F.round(ucb, 6)), F.asc("arm")
    )
    chosen = tot.select(
        "day", "arm", "realized", ucb.alias("ucb"),
        F.row_number().over(wrk).alias("rk"),
    )
    return chosen.filter(F.col("rk") == 1).select(
        "day",
        F.col("arm").alias("chosen_arm"),
        F.round("ucb", 4).alias("ucb_score"),
        F.round("realized", 4).alias("realized_mean"),
    )


# --------------------------------------------------------------------------
# q232 — Benjamini-Hochberg FDR control over a metric family (the
# multiple-testing correction an experimentation platform applies when
# one A/B test is read across many segments): per (event_type, day-of-
# week) segment, a Welch-style z statistic between the md5-assigned arms
# (q187's assignment, so the two queries describe the SAME experiment),
# then the BH step-up rule at ALPHA: sort p ascending, k* = max k with
# p_(k) <= k*ALPHA/m, declare ranks <= k* discoveries.
#
# Determinism: z is rounded to 4 dp (q187's precedent for float
# moments); the p-value surrogate p = exp(-|z_rounded|) is a documented
# MONOTONE FIXTURE standing in for 2*(1-Phi(|z|)) — neither engine has a
# portable normal CDF, and BH only consumes the ORDER of the p-values
# plus a threshold compare, both of which the surrogate preserves
# (the mechanism is real, the tail shape is a fixture — q110's
# fixture-weight precedent). p is frozen to BIGINT MICROS before
# ranking, and the step-up compare runs entirely in integers
# (p_micros * m <= rn * ALPHA_MICROS): DuckDB evaluates rn*0.1/m in
# decimal-exact arithmetic while Spark does two double roundings, so a
# float-form threshold can flip a boundary segment between engines
# (round-9 review). Zero-variance segments (all-identical values in an
# arm) are excluded by an exact integer count-distinct >= 2 per arm —
# their z would be a division by zero whose NULL sorts first on Spark
# but last on DuckDB, shifting every BH rank.
#
# Scale shape: one groupBy over (segment, arm) — map-side combinable —
# then the m-row segment table ranks in one window and joins the
# one-row k* aggregate by broadcast. m is the segment-family size
# (bounded by design), never the event count.
# --------------------------------------------------------------------------
Q232_ALPHA = 0.10
Q232_ALPHA_MICROS = 100_000  # ALPHA in the integer step-up compare
Q232_MIN_N = 2


def _q232_oracle() -> str:
    return f"""
    WITH seg AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 7 AS dow,
             {_ARM_SQL} AS arm,
             value
      FROM events
    ),
    stats AS (
      SELECT event_type, dow, arm, count(*) AS n,
             count(DISTINCT value) AS nd, avg(value) AS mean,
             var_pop(value) AS v
      FROM seg GROUP BY 1, 2, 3
    ),
    wide AS (
      SELECT event_type, dow,
             max(CASE WHEN arm = 'control' THEN n END) AS nc,
             max(CASE WHEN arm = 'control' THEN mean END) AS mc,
             max(CASE WHEN arm = 'control' THEN v END) AS vc,
             max(CASE WHEN arm = 'treatment' THEN n END) AS nt,
             max(CASE WHEN arm = 'treatment' THEN mean END) AS mt,
             max(CASE WHEN arm = 'treatment' THEN v END) AS vt
      FROM stats GROUP BY 1, 2
      HAVING min(n) >= {Q232_MIN_N} AND count(*) = 2 AND min(nd) >= 2
    ),
    zt AS (
      SELECT event_type, dow,
             CAST(nc AS BIGINT) AS n_control,
             CAST(nt AS BIGINT) AS n_treatment,
             round((mt - mc) / sqrt(vc / nc + vt / nt), 4) AS z_stat
      FROM wide
      WHERE vc > 0 AND vt > 0
    ),
    pt AS (
      SELECT *, CAST(round(exp(-abs(z_stat)) * 1000000, 0) AS BIGINT)
                AS p_micros
      FROM zt
    ),
    rk AS (
      SELECT *,
             row_number() OVER (ORDER BY p_micros, event_type, dow) AS rn,
             count(*) OVER () AS m
      FROM pt
    ),
    kstar AS (
      SELECT coalesce(max(rn), 0) AS k FROM rk
      WHERE p_micros * m <= rn * {Q232_ALPHA_MICROS}
    )
    SELECT rk.event_type, rk.dow, rk.n_control, rk.n_treatment,
           rk.z_stat, round(rk.p_micros / 1000000.0, 6) AS p_value,
           rk.rn, rk.rn <= kstar.k AS discovery
    FROM rk CROSS JOIN kstar
    """


@register("q232_fdr_bh", oracle=_q232_oracle())
def q232_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seg = ev.select(
        "event_type",
        ((F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint") % 7)
        .alias("dow"),
        _arm().alias("arm"),
        "value",
    )
    stats = seg.groupBy("event_type", "dow", "arm").agg(
        F.count("*").alias("n"),
        F.countDistinct("value").alias("nd"),
        F.avg("value").alias("mean"),
        # var_pop, NOT sum(v*v)/n - mean^2 (round-10 ADVICE): the moment
        # difference cancels catastrophically near zero variance, and
        # its partition-order-dependent sign could gate ROW PRESENCE
        # differently across engines at the vc>0/vt>0 filter below. Both
        # Spark and DuckDB implement var_pop as a merged central-moment
        # (Welford-style) aggregate whose update/merge increments are
        # all non-negative, so v >= 0 by construction on BOTH engines,
        # and v > 0 whenever nd >= 2 (some value differs from the
        # running mean, contributing a strictly positive square) — the
        # presence gate can no longer diverge on a cancelled sign.
        F.var_pop("value").alias("v"),
    )

    def pick(col: str, arm: str):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = (
        stats.groupBy("event_type", "dow")
        .agg(
            pick("n", "control").alias("nc"),
            pick("mean", "control").alias("mc"),
            pick("v", "control").alias("vc"),
            pick("n", "treatment").alias("nt"),
            pick("mean", "treatment").alias("mt"),
            pick("v", "treatment").alias("vt"),
            F.min("n").alias("minn"),
            F.min("nd").alias("minnd"),
            F.count("*").alias("narm"),
        )
        .filter(
            (F.col("minn") >= Q232_MIN_N)
            & (F.col("narm") == 2)
            & (F.col("minnd") >= 2)
        )
    )
    # var_pop is >= 0 by construction and > 0 given the minnd >= 2 gate
    # above (see the stats comment); vc>0/vt>0 is kept as a belt that is
    # satisfied identically on both engines, no clamp needed
    zt = (
        wide.filter((F.col("vc") > 0) & (F.col("vt") > 0))
        .select(
            "event_type",
            "dow",
            F.col("nc").cast("bigint").alias("n_control"),
            F.col("nt").cast("bigint").alias("n_treatment"),
            F.round(
                (F.col("mt") - F.col("mc"))
                / F.sqrt(
                    F.col("vc") / F.col("nc") + F.col("vt") / F.col("nt")
                ),
                4,
            ).alias("z_stat"),
        )
    )
    pt = zt.withColumn(
        "p_micros",
        F.round(F.exp(-F.abs(F.col("z_stat"))) * 1000000, 0).cast("bigint"),
    )
    w = Window.orderBy(F.asc("p_micros"), F.asc("event_type"), F.asc("dow"))
    rk = pt.withColumn("rn", F.row_number().over(w)).withColumn(
        "m", F.count("*").over(Window.partitionBy())
    )
    # integer step-up compare — see the determinism note above
    kstar = rk.filter(
        F.col("p_micros") * F.col("m") <= F.col("rn") * Q232_ALPHA_MICROS
    ).agg(F.coalesce(F.max("rn"), F.lit(0)).alias("k"))
    return rk.crossJoin(F.broadcast(kstar)).select(
        "event_type",
        "dow",
        "n_control",
        "n_treatment",
        "z_stat",
        F.round(F.col("p_micros") / 1000000.0, 6).alias("p_value"),
        "rn",
        (F.col("rn") <= F.col("k")).alias("discovery"),
    )
