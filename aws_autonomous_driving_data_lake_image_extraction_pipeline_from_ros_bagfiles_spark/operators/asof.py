"""As-of (nearest-timestamp) join — one shuffle, no range explosion.

The reference joins camera frames to detector predictions on an EXACT
derived (timestamp, camera) key (SURVEY J2; service reads both sides of
one frame id). The as-of join is that operation's production
generalization for unsynchronized clocks: each left row matches the
nearest right row at-or-before it (backward) or at-or-after it (forward)
within the same key, optionally bounded by a tolerance.

Spark-first plan: NOT a range join (which Catalyst executes as a
broadcast-nested-loop or a theta sort-merge — both explode at scale) but
the union trick:

1. tag both inputs and union them (column-aligned),
2. one window over ``partitionBy(keys).orderBy(ts, tag, payload)`` takes
   ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
   frame — each left row sees exactly the latest right row at-or-before
   it,
3. filter back to left rows, null the match if outside tolerance.

Cost: ONE shuffle on the by-keys (same as any keyed join) + a linear
in-partition scan. 100 TB behavior: identical to a sort-merge join's
shuffle; skewed keys are the same hazard and take the same salting
medicine. Right rows sort before left rows at an equal timestamp (tag 0
< 1), so an exactly-simultaneous right row IS matched (<= semantics),
mirroring the exact-key join it generalizes.

Determinism: among right rows tied on (key, ts) the winner is fixed by
the payload struct order (field order = ts, then *value_cols* in the
order given; callers list a unique column — an id — first): BACKWARD
takes the GREATEST struct (last under asc), FORWARD the SMALLEST (last
under desc). Oracles must mirror the per-direction rule.

Right rows with a NULL ``ts_col`` are dropped before the union: a NULL
timestamp cannot be "at or before" anything, but under asc ordering it
would sort FIRST and become a phantom match for left rows that have no
real predecessor (visible whenever ``tolerance`` is None, since the
tolerance null-out is what masked it otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    value_cols: list[str],
    tolerance: int | float | None = None,
    direction: str = "backward",
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    ``value_cols`` (prefixed) and its timestamp as ``<prefix><ts_col>``.

    ``ts_col`` must be numeric on both sides (cast timestamps to epoch
    units first); ``tolerance`` is in those units. Unmatched left rows
    keep NULL match columns — left-outer semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    right = right.filter(F.col(ts_col).isNotNull())  # see module docstring
    rstruct = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    r2 = right.select(
        *by, F.col(ts_col).alias("__ts"), F.lit(0).alias("__tag"), rstruct.alias("__r")
    )
    rtype = r2.schema["__r"].dataType
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(rtype).alias("__r"),
        lstruct.alias("__l"),
    )
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))

    if direction == "backward":
        order = [F.asc("__ts"), F.asc("__tag"), F.asc("__r")]
    else:
        # scan from the future: right rows at equal ts still precede left
        # (tag asc), and among tied right rows the LAST seen in descending
        # struct order is the smallest — the deterministic forward winner
        order = [F.desc("__ts"), F.asc("__tag"), F.desc("__r")]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__tag") == 1
    )
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__m.__rts")
            if direction == "backward"
            else F.col("__m.__rts") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{prefix}{ts_col}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in value_cols)
    return matched.select(*out_cols)
