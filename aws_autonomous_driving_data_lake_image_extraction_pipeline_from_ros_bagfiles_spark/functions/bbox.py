"""Bounding-box arithmetic (SURVEY §2.8 F12-F15).

Ratio<->pixel conversion mirrors the reference's anonymizer
(select-labelling-imgs.py:76-88) and Ground-Truth prep
(ground_truth/ground_truth_od.py:24-30, Transfer-Learning.ipynb cell 19).
Pure column math — runs in whole-stage codegen over struct columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bbox_denormalize(left: Column, top: Column, width: Column, height: Column,
                     img_w: Column, img_h: Column, margin: int = 0) -> Column:
    """Ratio box -> pixel corner struct ``(x1,y1,x2,y2)`` with +/- margin.

    Margin handling matches select-labelling-imgs.py:84-88 (10 px text /
    5 px faces), clamped to the image.
    """
    x1 = F.greatest(img_w * left - margin, F.lit(0.0))
    y1 = F.greatest(img_h * top - margin, F.lit(0.0))
    x2 = F.least(img_w * left + img_w * width + margin, img_w.cast("double"))
    y2 = F.least(img_h * top + img_h * height + margin, img_h.cast("double"))
    return F.struct(x1.alias("x1"), y1.alias("y1"), x2.alias("x2"), y2.alias("y2"))


def bbox_normalize(left: Column, top: Column, width: Column, height: Column,
                   img_w: Column, img_h: Column) -> Column:
    """Pixel box -> normalized corners (ground_truth_od.py:24-30)."""
    xmin = left / img_w
    ymin = top / img_h
    xmax = (left + width) / img_w
    ymax = (top + height) / img_h
    return F.struct(xmin.alias("xmin"), ymin.alias("ymin"), xmax.alias("xmax"), ymax.alias("ymax"))


def bbox_corners(left: Column, top: Column, width: Column, height: Column) -> Column:
    """``(left,top,w,h)`` -> ``(x1,y1,x2,y2)`` (ipynb cell 20) ."""
    return F.struct(left.alias("x1"), top.alias("y1"),
                    (left + width).alias("x2"), (top + height).alias("y2"))
