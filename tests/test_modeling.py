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
def test_ks_identical_windows_zero(spark, tmp_path):
    """Hand fixture ROUTED THROUGH q235_ks_drift itself (round-10
    ADVICE: the old inline re-implementation could not catch a
    regression in the registered query): a value distribution that is
    IDENTICAL in both windows gives KS exactly 0, and a hard shift
    gives KS = 1 located at the ref support's maximum (the smallest
    value achieving the sup, per the struct-max tie rule)."""
    import datetime

    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        q235_ks_drift,
    )

    # two days; day 0 = ref, day 1 = cur (midpoint = 0); write the
    # fixture as an events.parquet the registered query can load
    same = [("a", float(v), d) for v in (1, 2, 3, 4) for d in (0, 1)]
    shift = [("b", float(v), 0) for v in (1, 2, 3, 4)] + [
        ("b", float(v + 10), 1) for v in (1, 2, 3, 4)
    ]
    epoch = datetime.datetime(1970, 1, 1)
    rows = [
        (i, epoch + datetime.timedelta(days=d), i % 3, et, v, "{}")
        for i, (et, v, d) in enumerate(same + shift)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    out = {
        r.event_type: r
        for r in q235_ks_drift(spark, str(tmp_path)).collect()
    }
    a, b = out["a"], out["b"]
    assert a.ks == 0.0
    assert (a.n_ref, a.n_cur) == (4, 4)
    # identical windows: every value ties at d_num = 0; the struct-max
    # (d, -value) tie rule reports the SMALLEST value
    assert a.ks_at == 1.0
    assert b.ks == 1.0  # disjoint supports -> sup distance 1
    assert (b.n_ref, b.n_cur) == (4, 4)
    # the sup is first achieved at the ref support's max (value 4);
    # larger values also achieve it, the tie rule keeps the smallest
    assert b.ks_at == 4.0


# ---------------------------------------------------------------- q238
def test_mwu_identical_and_shifted(spark, tmp_path):
    """Hand fixture routed through q238_mwu_drift itself: identical
    windows give U = n_ref*n_cur/2 exactly (auc = 0.5, the no-drift
    fixed point, exact because 2U is an integer); a hard upward shift
    in the current window gives U = 0 (auc = 0 — every ref value ranks
    below every cur value); midranks are exercised by the duplicated
    values (each value appears in BOTH windows, so every rank is a
    tie-group midrank)."""
    import datetime

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        q238_mwu_drift,
    )

    same = [("a", float(v), d) for v in (1, 2, 3, 4) for d in (0, 1)]
    shift = [("b", float(v), 0) for v in (1, 2, 3, 4)] + [
        ("b", float(v + 10), 1) for v in (1, 2, 3, 4)
    ]
    epoch = datetime.datetime(1970, 1, 1)
    rows = [
        (i, epoch + datetime.timedelta(days=d), i % 3, et, v, "{}")
        for i, (et, v, d) in enumerate(same + shift)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r.event_type: r
        for r in q238_mwu_drift(spark, str(tmp_path)).collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n_ref, a.n_cur) == (4, 4)
    # identical distributions: U = 4*4/2 = 8, u2 = 16, auc = 0.5 exactly
    assert a.u2 == 16 and a.auc == 0.5
    # cur shifted above every ref value: ref holds ranks 1..4 -> U = 0
    assert b.u2 == 0 and b.auc == 0.0
