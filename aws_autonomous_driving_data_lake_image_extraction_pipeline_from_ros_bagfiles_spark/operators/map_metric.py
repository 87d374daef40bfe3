"""VOC07 mAP@IoU-0.5 as DataFrame operators (SURVEY §2 A9).

Mirrors the reference's training-loop evaluation (train_yolov3.py:110 —
``VOC07MApMetric(iou_thresh=0.5)`` — and the epoch loop at 150-180) as a
distributed metric over detection/ground-truth DataFrames instead of a
driver-side accumulator:

1. :func:`voc_greedy_match` — the VOC matching rule. Detections are
   processed in confidence order; each takes its argmax-IoU ground-truth
   box; a detection is TP iff that IoU >= ``iou_thresh`` AND the GT box is
   not already claimed by a higher-confidence detection (no fallback to
   the second-best GT — a claimed GT makes the detection FP, exactly the
   VOC devkit / gluoncv semantics). Matching is independent per
   (image, class), so it runs as a cogrouped ``applyInPandas``: every
   group is one image's boxes for one class — bounded, embarrassingly
   parallel, no global state. At 100 TB the shuffle key (image, class)
   is high-cardinality and unskewed (images have tens of boxes, not
   millions).
2. :func:`voc07_average_precision` — per-class AP with the VOC2007
   11-point interpolation: rank matched detections per class by
   (confidence DESC, det_id ASC), cumulative TP gives precision/recall
   per detection, and AP = mean over r in {0.0,0.1,...,1.0} of
   max{precision at recall >= r} (0 when unreachable). The per-class
   rank window is the one sequential step — it parallelizes class-wide;
   for corpora where a single class has billions of detections, the
   at-scale rewrite is to pre-aggregate (class, conf) tie-groups first,
   which bounds the window input by the number of distinct confidence
   values (exact only when ties within a group are not split, so this
   module keeps the exact per-detection form).

Schemas (all coordinates are corner boxes, as produced by
functions/bbox.py:bbox_corners):
  detections: image_id bigint, class_id int, det_id bigint, conf double,
              x1..y2 double
  ground truth: image_id bigint, class_id int, gt_id bigint, x1..y2 double
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MATCH_SCHEMA = (
    "image_id bigint, class_id int, det_id bigint, conf double, tp int"
)


def _greedy_match_pdf(
    dets: pd.DataFrame, gts: pd.DataFrame, thresh: float
) -> pd.DataFrame:
    """The VOC rule for ONE (image, class) group, vectorized in numpy:
    sort dets by (-conf, det_id), IoU matrix against the group's GT
    boxes, greedy claim."""
    if dets.empty:
        return pd.DataFrame(
            {
                "image_id": pd.Series(dtype="int64"),
                "class_id": pd.Series(dtype="int32"),
                "det_id": pd.Series(dtype="int64"),
                "conf": pd.Series(dtype="float64"),
                "tp": pd.Series(dtype="int32"),
            }
        )
    dets = dets.sort_values(
        ["conf", "det_id"], ascending=[False, True]
    ).reset_index(drop=True)
    tp = np.zeros(len(dets), dtype=np.int32)
    if not gts.empty:
        db = dets[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        gb = gts[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        g_area = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
        claimed = np.zeros(len(gts), dtype=bool)
        # IoU rows are computed in det BLOCKS, not as one n_det x n_gt
        # matrix: at sf1.0 the fixture packs ~10k dets x 3.3k GT into 60
        # groups, and the full matrix is ~1.3 GB per task x 32 tasks —
        # the memory spike (not the FLOPs) was what made q105's sf1.0
        # wall time swing 24 -> 556 s with host state (r10 control run).
        # Semantics are identical: the greedy claim still walks dets in
        # (conf DESC, det_id ASC) order row by row.
        block = 1024
        for s in range(0, len(db), block):
            dblk = db[s:s + block]
            iw = np.clip(
                np.minimum(dblk[:, None, 2], gb[None, :, 2])
                - np.maximum(dblk[:, None, 0], gb[None, :, 0]),
                0.0, None,
            )
            ih = np.clip(
                np.minimum(dblk[:, None, 3], gb[None, :, 3])
                - np.maximum(dblk[:, None, 1], gb[None, :, 1]),
                0.0, None,
            )
            inter = iw * ih
            d_area = (dblk[:, 2] - dblk[:, 0]) * (dblk[:, 3] - dblk[:, 1])
            union = d_area[:, None] + g_area[None, :] - inter
            ious = np.where(
                union > 0, inter / np.maximum(union, 1e-300), 0.0
            )
            for bi in range(len(dblk)):
                j = int(np.argmax(ious[bi]))
                if ious[bi, j] >= thresh and not claimed[j]:
                    claimed[j] = True
                    tp[s + bi] = 1
    out = dets[["image_id", "class_id", "det_id", "conf"]].copy()
    out["tp"] = tp
    return out


def voc_greedy_match(
    detections: DataFrame, ground_truth: DataFrame, iou_thresh: float = 0.5
) -> DataFrame:
    """VOC greedy TP/FP assignment, distributed per (image, class).

    Returns every detection row with a ``tp`` flag (1 = matched a GT box
    at IoU >= ``iou_thresh`` before any higher-confidence detection).
    """
    thresh = float(iou_thresh)  # captured by value; workers re-import the
    # module, so state must travel in the closure, not function attributes
    return (
        detections.groupBy("image_id", "class_id")
        .cogroup(ground_truth.groupBy("image_id", "class_id"))
        .applyInPandas(
            lambda d, g: _greedy_match_pdf(d, g, thresh), schema=_MATCH_SCHEMA
        )
    )


def voc07_average_precision(
    matched: DataFrame, ground_truth: DataFrame
) -> DataFrame:
    """Per-class VOC07 11-point AP over the output of
    :func:`voc_greedy_match`.

    Classes are taken from ``ground_truth`` (a class with no GT boxes has
    undefined recall and is excluded, as in the VOC devkit). Returns
    (class_id, n_pos, n_det, ap) with ``ap`` unrounded.
    """
    from pyspark.sql import Window

    npos = ground_truth.groupBy("class_id").agg(
        F.count("*").alias("n_pos")
    )
    w = Window.partitionBy("class_id").orderBy(
        F.desc("conf"), F.asc("det_id")
    )
    cum = Window.partitionBy("class_id").orderBy(
        F.desc("conf"), F.asc("det_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pr = (
        matched.join(F.broadcast(npos), "class_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("ctp", F.sum("tp").over(cum))
        .select(
            "class_id",
            "n_pos",
            (F.col("ctp") / F.col("rn")).alias("prec"),
            (F.col("ctp") / F.col("n_pos")).alias("rec"),
        )
    )
    spark = matched.sparkSession
    grid = spark.range(11).select((F.col("id") / 10.0).alias("r"))
    classes = npos.join(
        matched.groupBy("class_id").agg(F.count("*").alias("n_det")),
        "class_id",
        "left",
    ).withColumn("n_det", F.coalesce("n_det", F.lit(0)))
    # max precision at recall >= r, per class per grid point; a grid point
    # no recall reaches contributes 0 (left join + coalesce)
    points = (
        classes.crossJoin(F.broadcast(grid))
        .join(
            pr.join(F.broadcast(grid), pr.rec >= F.col("r"))
            .groupBy("class_id", "r")
            .agg(F.max("prec").alias("mp")),
            ["class_id", "r"],
            "left",
        )
        .withColumn("mp", F.coalesce("mp", F.lit(0.0)))
    )
    return points.groupBy("class_id", "n_pos", "n_det").agg(
        (F.sum("mp") / 11.0).alias("ap")
    )


def voc07_map(ap_per_class: DataFrame) -> DataFrame:
    """Mean AP over classes (the single scalar train_yolov3.py logs per
    epoch)."""
    return ap_per_class.agg(F.avg("ap").alias("map"))
