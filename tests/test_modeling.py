"""Value contracts for the statistical-modeling tier (q185-q187)."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_ols_matches_numpy_lstsq(spark):
    """The decimal-exact Cramer solve must agree with numpy's least
    squares on the identical integerized design matrix — the estimator
    check that is independent of what the synthetic data correlates."""
    import numpy as np

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        q185_multivar_ols,
    )

    fit = q185_multivar_ols(spark, SF_DIR).first()
    rows = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            F.round("l_quantity").alias("q"),
            F.round(F.col("l_discount") * 100).alias("d"),
            F.round(F.col("l_extendedprice") * 100).alias("p"),
        )
        .collect()
    )
    assert fit.n_rows == len(rows)
    X = np.array([[1.0, r.q, r.d] for r in rows])
    y = np.array([r.p for r in rows])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    assert abs(fit.b0_cents - beta[0]) < 1e-2 * max(1, abs(beta[0]))
    assert abs(fit.b1_per_unit_cents - beta[1]) < 1e-2 * max(1, abs(beta[1]))
    assert abs(fit.b2_per_bp_cents - beta[2]) < 1e-2 * max(1, abs(beta[2]))


def test_kaplan_meier_monotone(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        q186_kaplan_meier,
    )

    rows = sorted(q186_kaplan_meier(spark, SF_DIR).collect(), key=lambda r: r.day)
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9
        assert r.n_deaths <= r.n_at_risk
        prev = r.survival


def test_ab_test_reproducible_and_sane(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        q187_ab_test,
    )

    a = q187_ab_test(spark, SF_DIR).first()
    b = q187_ab_test(spark, SF_DIR).first()
    assert a == b  # md5 assignment: fully replayable
    assert a.n_control > 0 and a.n_treatment > 0
    # synthetic data has no real treatment effect: |z| should be small
    assert abs(a.z_stat) < 5


def test_conformal_coverage_guarantee(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        Q188_ALPHA,
        q188_conformal_interval,
    )

    r = q188_conformal_interval(spark, SF_DIR).first()
    assert r.qhat > 0
    # split conformal guarantees >= 1 - alpha coverage in expectation;
    # allow finite-sample slack below the nominal level
    assert r.coverage >= 1 - Q188_ALPHA - 0.07, r.coverage


def test_poisson_bootstrap_brackets_point(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        q189_poisson_bootstrap,
    )

    a = q189_poisson_bootstrap(spark, SF_DIR).first()
    b = q189_poisson_bootstrap(spark, SF_DIR).first()
    assert a == b  # hash-seeded replicates: replayable
    assert a.ci_lo <= a.point <= a.ci_hi
    assert a.ci_lo < a.ci_hi


def test_cuped_reduces_variance(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        q190_cuped,
    )

    rows = q190_cuped(spark, SF_DIR).collect()
    assert {r.arm for r in rows} == {"control", "treatment"}
    for r in rows:
        assert r.n_users > 0
        # theta is the pooled OLS minimizer: adjusted variance can only
        # shrink (up to arm-vs-pooled slack); require it never blows up
        assert r.var_reduction_pct > -5.0


# ---------------------------------------------------------------- q235
def test_ks_identical_windows_zero(spark):
    """Hand fixture: a value distribution that is IDENTICAL in both
    windows gives KS ~ 1/n (the ECDF step offset from unequal counts is
    avoided by equal counts -> exactly 0), and a hard shift gives a
    large KS at the shift boundary."""
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        _DAY_US,
    )

    # two days; day 0 = ref, day 1 = cur (midpoint = 0)
    def mk(rows):
        df = spark.createDataFrame(
            rows, "event_type string, value double, day bigint"
        )
        return df.select(
            "event_type", "value",
            (F.col("day") * _DAY_US).alias("ts_us"), "day",
        )

    same = [("a", float(v), d) for v in (1, 2, 3, 4) for d in (0, 1)]
    shift = [("b", float(v), 0) for v in (1, 2, 3, 4)] + [
        ("b", float(v + 10), 1) for v in (1, 2, 3, 4)
    ]
    ev = mk(same + shift)

    from pyspark.sql import Window

    split = ev.agg(((F.min("day") + F.max("day")) / 2).cast("bigint").alias("mid"))
    cnt = (ev.crossJoin(F.broadcast(split)).groupBy("event_type", "value")
           .agg(F.count(F.when(F.col("day") <= F.col("mid"), 1)).alias("cr"),
                F.count(F.when(F.col("day") > F.col("mid"), 1)).alias("cc")))
    wcum = (Window.partitionBy("event_type").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy("event_type")
    cum = cnt.select("event_type",
                     F.sum("cr").over(wcum).alias("fr"),
                     F.sum("cc").over(wcum).alias("fc"),
                     F.sum("cr").over(wtot).alias("nr"),
                     F.sum("cc").over(wtot).alias("nc"))
    ks = (cum.withColumn("d", F.abs(F.col("fr")*F.col("nc")-F.col("fc")*F.col("nr")))
          .groupBy("event_type")
          .agg((F.max("d")/(F.max("nr")*F.max("nc"))).alias("ks"))
          .collect())
    got = {r.event_type: r.ks for r in ks}
    assert got["a"] == 0.0
    assert got["b"] == 1.0  # disjoint supports -> sup distance 1
