"""Skew mitigation: salted two-phase aggregation.

A single hot key (one camera producing most frames, one user producing
most events) turns a groupBy into one straggler task. Salting splits the
hot key across ``salt_n`` sub-keys for a partial aggregate, then a second
tiny aggregate merges the partials — the classic two-phase decomposition,
valid for any algebraic aggregate (max/min/sum/count here).

AQE's skew-join handling covers *joins* automatically; aggregation skew
still needs this manual decomposition when a key's group is too large for
one task. Results are bit-identical to the direct groupBy for the
algebraic aggregates exposed, which is exactly what the q53 oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase groupBy: partial agg on (keys + salt), merge on keys.

    ``aggs`` maps output column -> (function, input column) with function
    in {max, min, sum, count}. ``count`` means SQL ``count(col)`` — non-null
    rows of that column — NOT ``count(*)``; pass a never-null column (or a
    literal via ``withColumn``) when you want row counts.

    ``salt_source`` defaults to crc32 over ALL non-key columns composited.
    Salting from a single value column is a trap: a hot key whose value
    column is constant would collapse into one salt bucket and the
    straggler returns. A composite over every non-key column only
    degenerates if the hot key's rows are fully identical — in which case
    pass an explicit ``salt_source`` (e.g. a row-unique id column, or
    ``F.rand(seed)*salt_n`` cast to int when determinism per-row doesn't
    matter for algebraic aggregates).
    """
    mergers = {"max": F.max, "min": F.min, "sum": F.sum, "count": F.sum}
    partials = {"max": F.max, "min": F.min, "sum": F.sum, "count": F.count}
    for fn, _ in aggs.values():
        if fn not in mergers:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    non_key = [c for c in df.columns if c not in keys]
    salt = (
        salt_source
        if salt_source is not None
        else F.crc32(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in non_key])
        )
        % salt_n
    ).alias("__salt")

    phase1 = df.groupBy(*keys, salt).agg(
        *[partials[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[fn](out).alias(out) for out, (fn, col) in aggs.items()]
    )
