"""Stream-stream inner join with watermark-bounded state — the streaming
twin of the keyed range join (plans/temporal.py q67) and the last of the
Structured Streaming join shapes the engine exposes.

Spark's stream-stream inner join buffers BOTH sides in state; the
watermark plus the time-range join condition is what lets it evict: a
buffered view can be dropped once the click-side watermark passes
``view.ts + tolerance``, so state is bounded by (event rate × delay),
never by stream length. Without the range condition the state grows
unboundedly — that is why ``tolerance`` is a required argument here, not
an optional nicety.

Reference analog: the service joins each frame with its prediction by
exact frame id after a blocking wait (service/app/main.py polling);
SURVEY ST4 maps that to a join the engine can now run stream-to-stream
with no wait loop at all.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_stream_click_view_join(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    tolerance: str = "1 hour",
    delay: str = "40 days",
    shuffle_partitions: int | None = None,
) -> None:
    """availableNow drain: join every click with ALL of the same user's
    views in [click.ts - tolerance, click.ts] (both bounds INCLUSIVE —
    the join predicate is >=, matching the q66/q88 batch oracles), append
    matches to
    ``out_dir``. Two independent readStream handles over the same landing
    directory (a supported self-join); both sides carry watermarks so the
    join state is evictable.

    ``shuffle_partitions`` (scoped, restored after — the q65 knob) sizes
    the join's state-store partition count to the bounded micro-batch;
    both sides of a stream-stream join keep state PER partition, so the
    per-batch commit bill is 2x partition count. Same checkpoint-pinning
    caveat as windows.watermarked_window_counts."""
    sp_key = "spark.sql.shuffle.partitions"
    prior_sp = spark.conf.get(sp_key)
    if shuffle_partitions is not None:
        spark.conf.set(sp_key, str(shuffle_partitions))
    try:  # the WHOLE construction: a plan-build error (bad schema /
        # tolerance string) must not leak the reduced width into the
        # session (r8 round-diff review)
        clicks = (
            spark.readStream.schema(schema)
            .parquet(source_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", delay)
        )
        views = (
            spark.readStream.schema(schema)
            .parquet(source_dir)
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", delay)
        )
        joined = clicks.join(
            views,
            F.expr(
                f"c_user = v_user AND v_ts <= c_ts "
                f"AND v_ts >= c_ts - INTERVAL {tolerance}"
            ),
        ).select(
            "click_id",
            "view_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from ..plans.registry import audit_stream

        audit_stream("stream_join:drain", q)
    finally:
        spark.conf.set(sp_key, prior_sp)
