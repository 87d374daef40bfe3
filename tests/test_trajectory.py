"""Douglas-Peucker trajectory simplification (operators/trajectory.py)."""

import numpy as np

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.trajectory import (
    dp_keep_mask,
    simplify_trajectories,
)


def _dist_to_polyline(p, poly):
    best = np.inf
    for a, b in zip(poly, poly[1:]):
        seg = b - a
        L2 = float(seg @ seg)
        t = 0.0 if L2 == 0 else np.clip((p - a) @ seg / L2, 0.0, 1.0)
        best = min(best, float(np.hypot(*(p - (a + t * seg)))))
    return best


def test_endpoints_always_kept_and_spike_survives():
    xy = np.array([[float(i), 4.0 if i == 5 else 0.0] for i in range(11)])
    m = dp_keep_mask(xy, eps=1.0)
    assert m[0] and m[-1] and m[5]
    assert m.sum() < len(xy)


def test_straight_line_collapses_to_endpoints():
    xy = np.array([[float(i), 2.0 * i] for i in range(50)])
    m = dp_keep_mask(xy, eps=0.5)
    assert m.sum() == 2 and m[0] and m[-1]


def test_dropped_points_within_eps_of_simplified_polyline():
    rng = np.random.default_rng(7)
    xy = np.cumsum(rng.normal(size=(200, 2)), axis=0)
    eps = 1.5
    m = dp_keep_mask(xy, eps)
    poly = xy[m]
    for p in xy[~m]:
        assert _dist_to_polyline(p, poly) <= eps + 1e-9


def test_degenerate_tracks():
    assert dp_keep_mask(np.empty((0, 2)), 1.0).sum() == 0
    assert dp_keep_mask(np.array([[1.0, 1.0]]), 1.0).sum() == 1
    # coincident endpoints: chord length 0 falls back to point distance
    xy = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 0.0]])
    m = dp_keep_mask(xy, eps=1.0)
    assert m[1]


def test_spark_groups_match_numpy(spark):
    rng = np.random.default_rng(11)
    rows = []
    tracks = {}
    for tid in range(4):
        xy = np.cumsum(rng.normal(size=(60, 2)), axis=0)
        tracks[tid] = xy
        rows += [(tid, i, float(x), float(y)) for i, (x, y) in enumerate(xy)]
    df = spark.createDataFrame(
        rows, "track_id bigint, seq bigint, x double, y double"
    ).coalesce(2)
    kept = simplify_trajectories(df, eps=1.0).collect()
    got = {}
    for r in kept:
        got.setdefault(r.track_id, []).append(r.seq)
    for tid, xy in tracks.items():
        expect = list(np.where(dp_keep_mask(xy, 1.0))[0])
        assert sorted(got[tid]) == expect
