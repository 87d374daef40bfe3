"""Trajectory simplification (Douglas-Peucker) over grouped point tracks.

The autonomous-driving data lake's GPS/odometry traces (the reference
pipeline's bags carry /gps and /imu topics alongside the camera streams)
are polylines of millions of points per drive; downstream consumers
(map display, route clustering, storage) want the classic
Ramer-Douglas-Peucker reduction: keep a point iff it deviates from the
kept-point polyline by more than ``eps``.

Spark shape: one ``applyInPandas`` per track — RDP is inherently
sequential WITHIN a track (each split depends on the chosen farthest
point) but embarrassingly parallel ACROSS tracks, which is exactly the
grouped-map contract. The shuffle carries (track_id) groups once; no
cross-track data movement. The per-track algorithm is the iterative
stack form (no recursion-depth hazard on million-point drives) over
numpy arrays inside the Arrow batch.

Determinism: the farthest point is the FIRST index attaining the max
perpendicular distance (np.argmax), and the strict ``> eps`` test makes
boundary points drop consistently on every engine/run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def dp_keep_mask(xy: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask of the Ramer-Douglas-Peucker reduction.

    ``xy`` is an (n, 2) float array in path order. Endpoints are always
    kept. A zero-length chord (coincident endpoints) falls back to point
    distance from the chord point.
    """
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = xy[j] - xy[i]
        length = float(np.hypot(seg[0], seg[1]))
        pts = xy[i + 1 : j]
        if length == 0.0:
            d = np.hypot(pts[:, 0] - xy[i, 0], pts[:, 1] - xy[i, 1])
        else:
            # scalar 2-D cross product: np.cross on 2-element vectors is
            # deprecated (NumPy >= 1.25) and removed in 2.x (r8 review)
            d = (
                np.abs(
                    seg[0] * (pts[:, 1] - xy[i, 1]) - seg[1] * (pts[:, 0] - xy[i, 0])
                )
                / length
            )
        k = int(np.argmax(d))
        if d[k] > eps:
            mid = i + 1 + k
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return keep


def simplify_trajectories(
    df: DataFrame,
    eps: float,
    group_col: str = "track_id",
    order_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-track RDP: returns only the kept points (all input columns).

    The path order sorts by (order_col, x_col, y_col): a stable sort on
    ``order_col`` alone is only stable with respect to the SHUFFLE
    ARRIVAL order, so duplicate order values (same-timestamp GPS fixes)
    could swap between runs and change which points RDP keeps (r8
    review). With coordinates in the key, duplicate-order points have a
    deterministic sequence regardless of arrival order; exact duplicate
    rows are interchangeable, so the mask is stable too.
    """
    cols = df.columns

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col, x_col, y_col], kind="mergesort")
        xy = pdf[[x_col, y_col]].to_numpy(dtype=np.float64)
        return pdf[dp_keep_mask(xy, eps)]

    return df.groupBy(group_col).applyInPandas(run, schema=df.select(*cols).schema)
