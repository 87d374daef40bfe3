"""As-of and range join operators: semantics on hand-built rows (backward/
forward, tolerance, tie-break, left-outer) and the plans' shuffle shape."""

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.asof import (
    asof_join,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ranges import (
    interval_point_join,
)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("cam_a", 100, 1),
            ("cam_a", 205, 2),
            ("cam_a", 300, 3),  # exact-tie with right at 300
            ("cam_b", 150, 4),
            ("cam_b", 500, 5),  # nearest right is 90 -> outside tolerance
            ("cam_c", 10, 6),   # no right rows at all for cam_c
        ],
        "cam string, ts long, frame_id long",
    )
    right = spark.createDataFrame(
        [
            ("cam_a", 90, 10, 0.9),
            ("cam_a", 200, 11, 0.8),
            ("cam_a", 300, 12, 0.7),
            ("cam_a", 300, 13, 0.6),  # tied ts: higher pred_id must win
            ("cam_b", 90, 14, 0.5),
        ],
        "cam string, ts long, pred_id long, conf double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ts_col="ts", by=["cam"], value_cols=["pred_id", "conf"],
        tolerance=100, direction="backward",
    )
    got = {r.frame_id: (r.r_pred_id, r.r_ts) for r in out.collect()}
    assert got == {
        1: (10, 90),     # 100 -> right@90
        2: (11, 200),    # 205 -> right@200 (not 90: older)
        3: (13, 300),    # exact tie matches; pred_id 13 > 12 wins
        4: (14, 90),     # within tolerance 60
        5: (None, None), # nearest right@90 is 410 away -> tolerance nulls it
        6: (None, None), # no right rows for cam_c (left-outer)
    }
    assert out.count() == left.count()


def test_asof_forward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ts_col="ts", by=["cam"], value_cols=["pred_id", "conf"],
        tolerance=100, direction="forward",
    )
    got = {r.frame_id: (r.r_pred_id, r.r_ts) for r in out.collect()}
    assert got == {
        1: (11, 200),    # 100 -> next right@200
        2: (12, 300),    # 205 -> next right@300; tied ts: LOWEST pred_id forward
        3: (12, 300),    # exact tie matches forward too
        4: (None, None), # no future right row within tolerance for cam_b
        5: (None, None),
        6: (None, None),
    }


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ts_col="ts", by=["cam"], value_cols=["pred_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + one window: exactly one Exchange (hashpartitioning on cam)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_point_join_bins_and_bounds(spark):
    ivl = spark.createDataFrame(
        [
            ("u1", 1, 100, 200),
            ("u1", 2, 150, 250),  # overlapping interval, same key
            ("u2", 3, 100, 200),
        ],
        "user string, ivl_id long, start long, stop long",
    )
    pts = spark.createDataFrame(
        [
            ("u1", 10, 100),  # on start: excluded (include_start=False)
            ("u1", 11, 200),  # on end of ivl 1, inside ivl 2
            ("u1", 12, 249),  # inside ivl 2 only (bin differs from its start bin)
            ("u2", 13, 150),
            ("u2", 14, 300),  # outside
        ],
        "user string, pt_id long, ts long",
    )
    out = interval_point_join(
        ivl, pts, keys=["user"], start_col="start", end_col="stop", pt_col="ts",
        bin_size=100, include_start=False, include_end=True,
    )
    pairs = {(r.pt_id, r.ivl_id) for r in out.collect()}
    assert pairs == {(11, 1), (11, 2), (12, 2), (13, 3)}
    # no duplicate pair despite intervals spanning multiple bins
    assert out.count() == len(pairs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
