"""Data-layout maintenance queries (q165-q166): Z-order clustering and
small-file compaction planning — the lakehouse housekeeping a 100 TB
deployment runs continuously (Delta OPTIMIZE ZORDER / Iceberg rewrite).

The reference's layout story is its S3 prefix scheme (one prefix per
topic/camera, bagstream.py:251-252) — a 1-D partitioning. Z-ordering is
the multi-dimensional generalization: interleaving the bits of two query
dimensions gives every file a small bounding box in BOTH dimensions, so
min/max file statistics prune point and range queries on either column.
q165 measures exactly that: the per-file (min,max) spans under a Z-order
sort vs the naive arrival-order sort.

Scale notes:
- The Z-value is pure integer arithmetic (shifts/masks) in codegen — at
  production scale the write path is `repartitionByRange(zval)` +
  `sortWithinPartitions(zval)` (range exchange only, no global window);
  the ntile() here reproduces the identical file assignment declaratively
  so the oracle can replay it at fixture scale.
- q166's bin-packing is the sorted-cumulative-sum rule (bin = floor of
  exclusive running size / target) — the same grouping rule Spark's own
  file-scan coalescing (`maxPartitionBytes`) applies, expressed as one
  window over the (small) per-file metadata table, never over row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# --------------------------------------------------------------------------
# q165 — Z-order vs naive layout: interleave 8 bits of user_id with 8 bits
# of day-of-year into a 16-bit Morton code; assign rows to 16 "files" by
# ntile over the sort order; report each file's (min,max) span per
# dimension and the span-product (the file's bounding-box area — smaller
# area = better pruning for point/range predicates on either column).
# --------------------------------------------------------------------------
Q165_FILES = 16
Q165_BITS = 8


def _zval_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Q165_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _zval_col(x, y):
    z = F.lit(0)
    for i in range(Q165_BITS):
        z = z + F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(
            F.shiftrightunsigned(y, i).bitwiseAND(1), 2 * i + 1
        )
    return z


@register(
    "q165_zorder_layout",
    oracle=f"""
    WITH base AS (
      SELECT event_id,
             user_id % 256 AS x,
             dayofyear(ts) % 256 AS y,
             ts
      FROM events
    ),
    z AS (
      SELECT event_id, x, y, ts, {_zval_sql('x', 'y')} AS zval
      FROM base
    ),
    assigned AS (
      SELECT 'zorder' AS layout, x, y,
             ntile({Q165_FILES}) OVER (ORDER BY zval, event_id) AS file_id
      FROM z
      UNION ALL
      SELECT 'naive' AS layout, x, y,
             ntile({Q165_FILES}) OVER (ORDER BY ts, event_id) AS file_id
      FROM z
    )
    SELECT layout, CAST(file_id AS INT) AS file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y,
           CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT)
               AS span_product
    FROM assigned
    GROUP BY 1, 2
    """,
)
def q165_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("x"),
        (F.dayofyear("ts") % 256).cast("bigint").alias("y"),
        "ts",
    )
    z = base.select(
        "event_id", "x", "y", "ts", _zval_col(F.col("x"), F.col("y")).alias("zval")
    )
    # ntile() reproduces the file assignment declaratively for the oracle;
    # the production write is repartitionByRange(zval) +
    # sortWithinPartitions (range exchange, no global window) — see module
    # docstring and tests/test_layout.py for the range-partitioned variant.
    wz = Window.orderBy("zval", "event_id")
    wn = Window.orderBy("ts", "event_id")
    assigned = z.select(
        F.lit("zorder").alias("layout"),
        "x",
        "y",
        F.ntile(Q165_FILES).over(wz).alias("file_id"),
    ).unionAll(
        z.select(
            F.lit("naive").alias("layout"),
            "x",
            "y",
            F.ntile(Q165_FILES).over(wn).alias("file_id"),
        )
    )
    return assigned.groupBy("layout", "file_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("x").cast("bigint").alias("min_x"),
        F.max("x").cast("bigint").alias("max_x"),
        F.min("y").cast("bigint").alias("min_y"),
        F.max("y").cast("bigint").alias("max_y"),
        ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1))
        .cast("bigint")
        .alias("span_product"),
    )


# --------------------------------------------------------------------------
# q166 — compaction planning: roll the event stream up to per-(day, type)
# "files" with byte sizes, then bin-pack adjacent files into compaction
# groups targeting Q166_TARGET bytes via the exclusive-running-sum rule.
# The plan output (one row per compaction group) is what a maintenance
# job hands to a rewrite stage; all arithmetic is integer-exact.
# --------------------------------------------------------------------------
Q166_TARGET = 16_384


@register(
    "q166_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(sum(length(props) + 32) AS BIGINT) AS size_bytes
      FROM events
      GROUP BY 1, 2
    ),
    packed AS (
      SELECT day, event_type, size_bytes,
             CAST(floor(coalesce(sum(size_bytes) OVER (
                 ORDER BY day, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / {Q166_TARGET}) AS BIGINT) AS bin_id
      FROM files
    )
    SELECT bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           CAST(min(day) AS VARCHAR) AS first_day,
           CAST(max(day) AS VARCHAR) AS last_day
    FROM packed
    GROUP BY 1
    """,
)
def q166_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    files = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(F.sum(F.length("props") + 32).cast("bigint").alias("size_bytes"))
    w = (
        Window.orderBy("day", "event_type")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = files.select(
        "day",
        "size_bytes",
        F.floor(
            F.coalesce(F.sum("size_bytes").over(w), F.lit(0)) / Q166_TARGET
        ).alias("bin_id"),
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("size_bytes").cast("bigint").alias("total_bytes"),
        F.min("day").cast("string").alias("first_day"),
        F.max("day").cast("string").alias("last_day"),
    )
