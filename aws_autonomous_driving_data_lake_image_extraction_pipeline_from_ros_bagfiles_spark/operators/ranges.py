"""Keyed interval-containment (range) join via bin bucketing.

A naive ``point BETWEEN start AND end`` join is a theta join — Catalyst
executes it as broadcast-nested-loop (or a full sort-merge over the key
only), which explodes at corpus scale. The standard distributed shape is
bin bucketing:

1. every interval explodes to the time bins it covers
   (``start DIV bin .. end DIV bin`` — with ``bin_size`` chosen near the
   typical interval length this is <= 2 rows per interval),
2. every point maps to exactly ONE bin,
3. an EQUI-join on (keys..., bin) finds all candidates — a plain
   shuffle-hash/sort-merge join AQE can manage — and the exact bounds
   predicate then filters them.

No duplicates by construction: a (point, interval) pair meets only in the
point's single bin. Cost is one shuffle on (keys, bin); fan-out is
``interval_len / bin_size + 1`` per interval, so bin_size tunes the
replication-vs-selectivity trade exactly like a range-join bin hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    pt_col: str,
    bin_size: int,
    include_start: bool = True,
    include_end: bool = True,
) -> DataFrame:
    """Inner join of points to the keyed intervals containing them.

    All three bound columns must be integral (cast timestamps to epoch
    units first); ``bin_size`` is in the same units. Bound inclusivity is
    explicit. Output carries every column of both inputs (caller keeps
    the names disjoint), minus the internal bin.
    """
    if bin_size <= 0:
        # DIV by 0 yields NULL -> sequence(NULL, NULL) -> explode drops
        # every interval: the join would return EMPTY with no error (a
        # dynamically-derived bin size rounding to 0 is the realistic way
        # in). Loud guard instead (r7 review).
        raise ValueError(f"bin_size must be positive, got {bin_size}")
    ivl = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {bin_size}"),
                F.expr(f"{end_col} DIV {bin_size}"),
            )
        ),
    )
    pts = points.withColumn("__bin", F.expr(f"{pt_col} DIV {bin_size}"))
    lo = F.col(pt_col) >= F.col(start_col) if include_start else F.col(pt_col) > F.col(start_col)
    hi = F.col(pt_col) <= F.col(end_col) if include_end else F.col(pt_col) < F.col(end_col)
    return pts.join(ivl, [*keys, "__bin"]).filter(lo & hi).drop("__bin")
