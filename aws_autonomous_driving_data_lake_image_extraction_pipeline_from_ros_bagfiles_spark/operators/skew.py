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
    in {max, min, sum, count}. ``salt_source`` defaults to a deterministic
    spread (crc32 of all non-key columns would do; here monotonically
    varying input rows hash via ``spark_partition_id`` + input order is
    avoided — we use crc32 of the stringified value column so re-runs are
    stable).
    """
    mergers = {"max": F.max, "min": F.min, "sum": F.sum, "count": F.sum}
    partials = {"max": F.max, "min": F.min, "sum": F.sum, "count": F.count}
    for fn, _ in aggs.values():
        if fn not in mergers:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    first_in = next(iter(aggs.values()))[1]
    salt = (
        salt_source
        if salt_source is not None
        else F.crc32(F.col(first_in).cast("string")) % salt_n
    ).alias("__salt")

    phase1 = df.groupBy(*keys, salt).agg(
        *[partials[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[fn](out).alias(out) for out, (fn, col) in aggs.items()]
    )
