"""Product-analytics operators over the events stream: ordered conversion
funnels, weekly cohort retention, and time-bucket gap-fill with LOCF
interpolation (the hypertable `time_bucket_gapfill`/`locf` shape).

Beyond-reference additions (SURVEY §7 M6 family): the reference pipeline
tracks frame/detection events through SQS + DynamoDB counters
(infrastructure/process-queue-sync); these are the analytical queries a
fleet-scale deployment runs over that same event stream.

Time is compared as epoch MICROSECONDS (bigint) on both engines (see
plans/temporal.py) and bucketed with pure integer arithmetic — epoch days
`ts_us DIV 86_400_000_000`, epoch weeks `day DIV 7` — so no calendar /
timezone function can diverge between Spark and DuckDB.

Scale notes:
- The funnel is stage-chained min-aggregates joined on user_id: every
  stage is a map-side-combinable groupBy; nothing wider than user_id ever
  shuffles, and stage outputs (one row per converting user) shrink
  monotonically.
- Retention shuffles (user, week) pairs — already deduplicated by the
  distinct — then aggregates the tiny (cohort, offset) matrix.
- Gap-fill materializes the scaffold with a per-user `sequence()` explode
  (no driver loop) and fills via the count-of-non-null window-group trick,
  which both engines run as ordinary partitioned windows on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import materialize, register

_DAY_US = 86_400_000_000


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


# --------------------------------------------------------------------------
# q84 — ordered conversion funnel signup → click → purchase: a user counts
# for stage N only with a stage-N event STRICTLY AFTER their stage-(N-1)
# entry time (min-ts semantics, the standard product-analytics funnel).
# Output: one row per stage with the surviving-user count and the mean
# hours from signup for that stage's entry event.
# --------------------------------------------------------------------------
@register(
    "q84_funnel",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (SELECT ev.user_id, min(ev.ts_us) AS t2, min(s1.t1) AS t1
           FROM ev JOIN s1 USING (user_id)
           WHERE ev.event_type = 'click' AND ev.ts_us > s1.t1 GROUP BY 1),
    s3 AS (SELECT ev.user_id, min(ev.ts_us) AS t3, min(s2.t1) AS t1
           FROM ev JOIN s2 USING (user_id)
           WHERE ev.event_type = 'purchase' AND ev.ts_us > s2.t2 GROUP BY 1)
    SELECT '1_signup' AS stage, count(*) AS n_users,
           round(avg(0.0), 6) AS mean_hours_from_signup FROM s1
    UNION ALL
    SELECT '2_click', count(*),
           round(avg((t2 - t1) / 3600000000.0), 6) FROM s2
    UNION ALL
    SELECT '3_purchase', count(*),
           round(avg((t3 - t1) / 3600000000.0), 6) FROM s3
    """,
)
def q84_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"), F.min("t1").alias("t1"))
    )
    hours = lambda a, b: (F.col(a) - F.col(b)) / 3.6e9  # noqa: E731
    return (
        s1.agg(
            F.lit("1_signup").alias("stage"),
            F.count("*").alias("n_users"),
            F.round(F.avg(F.lit(0.0)), 6).alias("mean_hours_from_signup"),
        )
        .unionAll(
            s2.agg(
                F.lit("2_click").alias("stage"),
                F.count("*").alias("n_users"),
                F.round(F.avg(hours("t2", "t1")), 6).alias(
                    "mean_hours_from_signup"
                ),
            )
        )
        .unionAll(
            s3.agg(
                F.lit("3_purchase").alias("stage"),
                F.count("*").alias("n_users"),
                F.round(F.avg(hours("t3", "t1")), 6).alias(
                    "mean_hours_from_signup"
                ),
            )
        )
    )


# --------------------------------------------------------------------------
# q85 — weekly cohort retention: users are cohorted by the epoch-week of
# their first event; a cohort is "retained at offset k" by the distinct
# users with any event in cohort_week + k. Pure integer week arithmetic
# (epoch days DIV 7) — no calendar functions to disagree on.
# --------------------------------------------------------------------------
@register(
    "q85_cohort_retention",
    oracle="""
    WITH ev AS (SELECT user_id,
                       epoch_us(ts) // 86400000000 // 7 AS wk
                FROM events),
    cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
    active AS (SELECT DISTINCT user_id, wk FROM ev)
    SELECT cohort.cohort_wk,
           active.wk - cohort.cohort_wk AS week_offset,
           count(DISTINCT active.user_id) AS n_users
    FROM active JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def q85_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "user_id", F.floor(F.col("ts_us") / _DAY_US / 7).alias("wk")
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# q86 — daily gap-fill + last-observation-carried-forward: every user gets
# a row for every day in the corpus span; days without events inherit the
# user's previous daily mean `value` (NULL before the first observation).
# The TimescaleDB `time_bucket_gapfill` + `locf` shape.
#
# Fill machinery: `grp = count(non-null) over (user order by day)` starts a
# new group at each observation, then `max(daily) over (user, grp)` smears
# the single non-null of the group forward. Two partitioned windows, one
# shuffle on user_id (the scaffold's sequence-explode inherits it).
# --------------------------------------------------------------------------
@register(
    "q86_gapfill_locf",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
                FROM events),
    span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
    daily AS (SELECT user_id, day, avg(value) AS v FROM ev GROUP BY 1, 2),
    scaffold AS (
        SELECT u.user_id, s.day
        FROM (SELECT DISTINCT user_id FROM ev) u
        CROSS JOIN (SELECT unnest(generate_series(d0, d1)) AS day
                    FROM span) s),
    joined AS (
        SELECT scaffold.user_id, scaffold.day, daily.v,
               count(daily.v) OVER (PARTITION BY scaffold.user_id
                                    ORDER BY scaffold.day
                                    ROWS UNBOUNDED PRECEDING) AS grp
        FROM scaffold LEFT JOIN daily USING (user_id, day))
    SELECT user_id, day,
           round(max(v) OVER (PARTITION BY user_id, grp), 6) AS filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM joined
    """,
)
def q86_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "user_id", F.floor(F.col("ts_us") / _DAY_US).alias("day"), "value"
    )
    span = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    daily = ev.groupBy("user_id", "day").agg(F.avg("value").alias("v"))
    scaffold = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = scaffold.join(daily, ["user_id", "day"], "left").withColumn(
        "grp", F.count("v").over(w_run)
    )
    w_grp = Window.partitionBy("user_id", "grp")
    return joined.select(
        "user_id",
        "day",
        F.round(F.max("v").over(w_grp), 6).alias("filled"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_gap"),
    )


# --------------------------------------------------------------------------
# q88 — stream-stream inner join (streaming twin of the q67 keyed range
# join): clicks joined to every same-user view within the preceding hour,
# run as two watermarked readStream handles over one landed copy of the
# events table, drained with availableNow and appended to parquet. The
# oracle is the equivalent BATCH range join — hash-equality proves the
# streaming join emitted exactly the batch result, once. See
# streaming/stream_join.py for the state-eviction contract.
# --------------------------------------------------------------------------
@register(
    "q88_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, v.event_id AS view_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
    FROM events c
    JOIN events v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND v.event_type = 'view'
    """,
)
def q88_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.staging import stage_single_parquet
    from ..streaming.stream_join import stream_stream_click_view_join

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    work = tempfile.mkdtemp(prefix="stream_join_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        stage_single_parquet(events, f"{src}/ev.parquet")
        stream_stream_click_view_join(
            spark,
            src,
            events.schema,
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            # bounded single-file micro-batch: state stores sized to the
            # batch, not the session width (r8 — both join sides keep
            # state per partition, so this halves the commit bill twice)
            shuffle_partitions=max(
                8, spark.sparkContext.defaultParallelism // 4
            ),
        )
        out = spark.read.parquet(f"{work}/out")
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q92 — streaming dedup with watermark-bounded state: the events table is
# landed TWICE (the at-least-once redelivery case) and drained through
# dropDuplicatesWithinWatermark — each event_id must come out exactly
# once. Oracle: the events table itself. Complements the engine's
# idempotent-merge reconciliation (ST2/q35) with the Spark-native
# stateful-dedup form; state is bounded by the watermark, not stream
# length (see streaming/windows.py::dedup_within_watermark).
# --------------------------------------------------------------------------
@register(
    "q92_stream_dedup",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events
    """,
)
def q92_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    from ..streaming.staging import stage_single_parquet
    from ..streaming.windows import dedup_within_watermark

    events = load(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        now = int(time.time())
        first = stage_single_parquet(
            events, f"{src}/delivery0.parquet", mtime=now - 30
        )
        # same payload delivered twice (the at-least-once redelivery case)
        shutil.copy(first, f"{src}/delivery1.parquet")
        os.utime(f"{src}/delivery1.parquet", (now - 20,) * 2)
        dedup_within_watermark(
            spark,
            src,
            events.schema,
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            keys=["event_id"],
            # both deliveries drain as ONE micro-batch and the dedup
            # state stores are sized to it — the q61/q65 treatment;
            # dropDuplicatesWithinWatermark removes within-batch
            # duplicates identically, so the output is unchanged
            max_files_per_trigger=None,
            shuffle_partitions=max(
                8, spark.sparkContext.defaultParallelism // 4
            ),
        )
        out = spark.read.parquet(f"{work}/out").select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
        )
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q93 — daily OHLC (open/high/low/close) per event type: first/last are
# selected with min_by/max_by over a zero-padded (ts_us, event_id)
# composite key, so the result is deterministic even under equal
# timestamps — never "first row Spark happens to see". One map-side-
# combinable groupBy; no window, no sort.
# --------------------------------------------------------------------------
@register(
    "q93_ohlc",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               value,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
               lpad(CAST(event_id AS VARCHAR), 20, '0') AS ord
        FROM events)
    SELECT event_type, day,
           round(arg_min(value, ord), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, ord), 6) AS close,
           count(*) AS n
    FROM ev GROUP BY 1, 2
    """,
)
def q93_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("ts_us") / _DAY_US).alias("day"),
        "value",
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
        ).alias("ord"),
    )
    return ev.groupBy("event_type", "day").agg(
        F.round(F.min_by("value", "ord"), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", "ord"), 6).alias("close"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# q94 — 7-day trailing moving average of daily event value per type,
# via a RANGE frame over the integer day (RANGE, not ROWS: a type with a
# missing day must average over the CALENDAR week, not the last 7
# present rows). Daily rollup first, so the window runs over ~30 rows
# per type, not the raw stream.
# --------------------------------------------------------------------------
@register(
    "q94_moving_avg",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               sum(value) AS total
        FROM events GROUP BY 1, 2)
    SELECT event_type, day,
           round(total, 6) AS total,
           round(avg(total) OVER (
               PARTITION BY event_type ORDER BY day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
    FROM daily
    """,
)
def q94_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _ev(spark, sf_dir)
        .groupBy(
            "event_type", F.floor(F.col("ts_us") / _DAY_US).alias("day")
        )
        .agg(F.sum("value").alias("total"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.round("total", 6).alias("total"),
        F.round(F.avg("total").over(w), 6).alias("ma7"),
    )


# --------------------------------------------------------------------------
# q97 — semi-structured props: the events table's JSON payload column is
# parsed in-plan (get_json_object — codegen, no Python) and aggregated
# per event type. The schema-on-read path every telemetry pipeline needs
# when the payload evolves faster than the table schema.
# --------------------------------------------------------------------------
@register(
    "q97_props_json",
    oracle="""
    SELECT event_type,
           count(json_extract(props, '$.k')) AS n_with_k,
           CAST(min(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS min_k,
           CAST(max(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS max_k,
           round(avg(json_extract(props, '$.k')::BIGINT), 6) AS mean_k
    FROM events GROUP BY 1
    """,
)
def q97_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        load(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("mean_k"),
        )
    )


# --------------------------------------------------------------------------
# q100 — stream-STATIC enrichment join, completing the engine's streaming
# join matrix (stream-stream q88, stateful sessions q48, watermarked aggs
# q61, stateful dedup q92): the events stream is enriched against the
# static customer dimension (broadcast — the stream side never shuffles)
# and rolled up per market segment. The reference's analog is each ECS
# task pulling per-bag config from the static DynamoDB/env tables while
# consuming the queue. Oracle: the equivalent batch join.
# --------------------------------------------------------------------------
@register(
    "q100_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 6) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q100_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.staging import stage_single_parquet

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    work = tempfile.mkdtemp(prefix="stream_static_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        stage_single_parquet(events, f"{src}/ev.parquet")
        enriched = (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .join(F.broadcast(customer), "user_id")  # stream side unshuffled
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(f"{work}/out")
            .groupBy("segment", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
            )
        )
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q101 — exactly-once Python streaming SINK (sources/manifest_sink.py):
# events stream through a custom DataSourceStreamWriter whose commit
# point is one atomic manifest rename per micro-batch; the read side
# lists manifests and reads only committed files, plus an orphaned
# staged file is planted to prove uncommitted data stays invisible.
# Oracle: the events table itself — committed view ≡ source, exactly
# once, with the orphan ignored.
# --------------------------------------------------------------------------
@register(
    "q101_manifest_sink",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
)
def q101_manifest_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..sources.manifest_sink import read_committed, register_manifest_sink
    from ..streaming.staging import stage_sliced_parquet

    register_manifest_sink(spark)
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="manifest_sink_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        # one source file per core, landed in ONE write job: the batch
        # then carries one sink-write task per file, so the Python JSONL
        # serialization runs core-parallel instead of in a single task
        # (guide §2.6/§4 — the r12 single-file staging walled the whole
        # drain behind one worker: 1.5 s of a 2.3 s warm query). Slice
        # count follows defaultParallelism, not a constant, so the
        # driver's low-core bench keeps its own natural width; rows per
        # slice are a partition of the same events projection, so the
        # committed view is unchanged (read_committed is order-free).
        n_slices = max(8, spark.sparkContext.defaultParallelism // 4)
        stage_sliced_parquet(
            events,
            F.col("event_id") % n_slices,
            [(i, f"{src}/ev{i}.parquet", None) for i in range(n_slices)],
        )
        sink = f"{work}/sink"
        q = (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .writeStream.format("manifest_sink")
            .option("path", sink)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # a crashed writer's leftover: staged but never committed — the
        # committed view must not see it
        os.makedirs(f"{sink}/_staging", exist_ok=True)
        with open(f"{sink}/_staging/orphan.jsonl", "w") as f:
            f.write('{"event_id": -1, "user_id": -1, "event_type": "ghost"}\n')
        out = read_committed(
            spark, sink, "event_id long, user_id long, event_type string"
        )
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q102 — robust anomaly detection per event type: median + MAD (median
# absolute deviation), flag rows whose robust z-score |x - med| / MAD
# exceeds 3. The outlier screen that, unlike mean/stddev z-scores
# (grouped.py q51 family), is itself immune to the outliers it hunts.
# Two grouped exact percentiles (one over values, one over deviations) +
# a broadcast of the tiny per-type stats back onto the stream; output is
# the flagged rows only.
# --------------------------------------------------------------------------
@register(
    "q102_mad_anomaly",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1),
    mad AS (
        SELECT e.event_type,
               quantile_cont(abs(e.value - med.med), 0.5) AS mad
        FROM events e JOIN med USING (event_type) GROUP BY 1)
    SELECT e.event_id, e.event_type,
           round(e.value, 6) AS value,
           round(abs(e.value - med.med) / mad.mad, 6) AS robust_z
    FROM events e
    JOIN med USING (event_type)
    JOIN mad USING (event_type)
    WHERE abs(e.value - med.med) / mad.mad > 3
    """,
)
def q102_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    z = F.abs(F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(z > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            z.alias("robust_z"),
        )
        .withColumn("robust_z", F.round("robust_z", 6))
    )


# --------------------------------------------------------------------------
# q120 — per-group OLS trend: for every event_type, the least-squares
# slope/intercept of daily total value against the day index. The trend
# line every monitoring dashboard fits, expressed as pure aggregates:
# slope = covar_pop(x, y) / var_pop(x), intercept = avg(y) - slope*avg(x).
#
# Numerical discipline: x is the day offset from a FIXED origin
# (2023-01-01), not the epoch — centering keeps |x| small (~1e2) so the
# one-pass co-moment accumulation both engines use (Spark covar_pop /
# var_pop, DuckDB regr_slope / regr_intercept) agrees to well inside the
# 6-decimal rounding; raw epoch-day x (~2e4) would put catastrophic
# cancellation at the rounding boundary. The intercept is therefore "fitted
# daily total at 2023-01-01" on both sides.
#
# Scale shape: two map-side-combinable aggregates (day grain, then
# event_type grain) — the second input is |types| x |days| rows, tiny at
# any corpus size. No window, no join.
# --------------------------------------------------------------------------
Q120_ORIGIN = "2023-01-01"


@register(
    "q120_ols_trend",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '{Q120_ORIGIN}', CAST(ts AS DATE)) AS x,
             sum(value) AS y
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(regr_slope(y, x), 6) AS slope,
           round(regr_intercept(y, x), 6) AS intercept
    FROM daily GROUP BY 1
    """,
)
def q120_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(Q120_ORIGIN).cast("date"))
        .cast("double")
        .alias("x"),
    ).agg(F.sum("value").alias("y"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
    )
    slope = F.col("cxy") / F.col("vx")
    return stats.select(
        "event_type",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"),
    )


# --------------------------------------------------------------------------
# q129 — shuffle-key skew report: the pre-flight diagnostic a 100 TB job
# runs BEFORE shuffling on a key. One map-side-combinable count per key,
# then a single-row summary: key cardinality, max/avg/percentile key
# sizes, the skew ratio (max/avg — the straggler factor a plain groupBy
# or join on this key would suffer), and the hottest key itself. The
# mitigation this report triggers is q53's salted_agg / AQE skew join;
# this query is the detector.
#
# The percentile runs over the per-key COUNT table (|keys| rows), never
# the event stream. top_key is tie-broken to the smallest key id via a
# conditional min against the max count — no argmax nondeterminism.
# --------------------------------------------------------------------------
@register(
    "q129_skew_report",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY 1),
    m AS (SELECT max(c) AS mc FROM counts)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS total_rows,
           CAST(max(c) AS BIGINT) AS max_cnt,
           round(avg(c), 6) AS avg_cnt,
           round(quantile_cont(c, 0.5), 6) AS p50_cnt,
           round(quantile_cont(c, 0.99), 6) AS p99_cnt,
           round(max(c) / avg(c), 6) AS skew_ratio,
           CAST(min(CASE WHEN c = m.mc THEN user_id END) AS BIGINT) AS top_key
    FROM counts CROSS JOIN m
    """,
)
def q129_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("c"))
    m = counts.agg(F.max("c").alias("mc"))
    return (
        counts.crossJoin(F.broadcast(m))
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("c").alias("total_rows"),
            F.max("c").alias("max_cnt"),
            F.round(F.avg("c"), 6).alias("avg_cnt"),
            F.round(F.expr("percentile(c, 0.5)"), 6).alias("p50_cnt"),
            F.round(F.expr("percentile(c, 0.99)"), 6).alias("p99_cnt"),
            F.round(F.max("c") / F.avg("c"), 6).alias("skew_ratio"),
            F.min(F.when(F.col("c") == F.col("mc"), F.col("user_id"))).alias(
                "top_key"
            ),
        )
    )


# --------------------------------------------------------------------------
# q132 — time-decayed engagement scoring: per-user exponentially decayed
# value sum, score = sum(value * exp(-LAMBDA * age_days)) with age
# measured in exact microsecond fractions of a day against a FIXED
# reference instant — the standard recency-weighted feature every
# engagement/freshness ranker computes. One map-side-combinable groupBy;
# top-k is a heap. Timestamps enter as epoch micros (bigint) on both
# engines (see plans/temporal.py), so the exp() argument is built from
# identical integer operands and cannot drift.
# --------------------------------------------------------------------------
Q132_LAMBDA = 0.05
Q132_REF_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
Q132_TOPK = 20


@register(
    "q132_decay_engagement",
    oracle=f"""
    WITH sc AS (
      SELECT user_id,
             sum(value * exp(-{Q132_LAMBDA}
                 * (({Q132_REF_US} - epoch_us(ts)) / 86400000000.0))) AS raw,
             count(*) AS n_events
      FROM events GROUP BY 1)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           round(raw, 6) AS score
    FROM sc
    ORDER BY round(raw, 6) DESC, user_id
    LIMIT {Q132_TOPK}
    """,
)
def q132_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    age_days = (
        F.lit(Q132_REF_US) - F.unix_micros(F.col("ts"))
    ) / F.lit(86400000000.0)
    sc = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value") * F.exp(-F.lit(Q132_LAMBDA) * age_days)), 6
        ).alias("score"),
    )
    return (
        sc.select("user_id", "n_events", "score")
        .orderBy(F.desc("score"), F.asc("user_id"))
        .limit(Q132_TOPK)
    )


# --------------------------------------------------------------------------
# q136 — rolling correlation between two metric series: the 7-day RANGE-
# frame Pearson correlation between the daily totals of two event types —
# the co-movement monitor dashboards pair with q94's moving average. The
# daily pivot is one map-side-combinable aggregate; the correlation
# window RANGE-frames over the tiny per-day series (|days| rows), keyed
# to a constant series id — bounded, never over event rows. corr() is
# the same one-pass co-moment form on both engines; rounding at 6
# absorbs last-ulp differences.
# --------------------------------------------------------------------------
Q136_A = "view"
Q136_B = "click"


@register(
    "q136_rolling_corr",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CASE WHEN event_type = '{Q136_A}' THEN value END) AS va,
             sum(CASE WHEN event_type = '{Q136_B}' THEN value END) AS vb
      FROM events WHERE event_type IN ('{Q136_A}', '{Q136_B}')
      GROUP BY 1)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(corr(va, vb) OVER (
             ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                            AND CURRENT ROW), 6) AS corr7
    FROM daily
    ORDER BY day
    """,
)
def q136_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(Q136_A, Q136_B)
    )
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == Q136_A, F.col("value"))).alias("va"),
        F.sum(F.when(F.col("event_type") == Q136_B, F.col("value"))).alias("vb"),
    )
    # RANGE frame needs a numeric order key; day number is exact
    w = (
        Window.orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-6, 0)
    )
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round(F.corr("va", "vb").over(w), 6).alias("corr7"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q138 — seasonal-trend decomposition (STL-shape, moving-average form):
# daily totals of one event type split into trend (centered 7-day moving
# average), day-of-week seasonal means of the detrended series, and
# residual. The decomposition every metrics stack runs before anomaly
# thresholds (q102/q140 operate on residual-like series).
#
# All three passes are windows/aggregates over the BOUNDED daily pivot
# (|days| rows): trend is a ROWS +-3 frame, seasonal is a 7-key groupBy
# joined back, residual is arithmetic. Day-of-week is ISO (Mon=1..Sun=7)
# on both engines: Spark weekday()+1 == DuckDB isodow().
# --------------------------------------------------------------------------
Q138_TYPE = "view"


@register(
    "q138_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, sum(value) AS y
      FROM events WHERE event_type = '{Q138_TYPE}' GROUP BY 1),
    tr AS (
      SELECT d, y,
             avg(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING) AS trend,
             isodow(d) AS dow
      FROM daily),
    seas AS (
      SELECT dow, avg(y - trend) AS seasonal FROM tr GROUP BY 1)
    SELECT strftime(tr.d, '%Y-%m-%d') AS day,
           round(tr.y, 6) AS y,
           round(tr.trend, 6) AS trend,
           round(seas.seasonal, 6) AS seasonal,
           round(tr.y - tr.trend - seas.seasonal, 6) AS residual
    FROM tr JOIN seas USING (dow)
    ORDER BY day
    """,
)
def q138_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").filter(
        F.col("event_type") == Q138_TYPE
    )
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("y")
    )
    w = Window.orderBy(F.unix_date("d")).rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        F.avg("y").over(w).alias("trend"),
        (F.weekday("d") + 1).alias("dow"),
    )
    seas = tr.groupBy("dow").agg(
        F.avg(F.col("y") - F.col("trend")).alias("seasonal")
    )
    return (
        tr.join(F.broadcast(seas), "dow")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("y", 6).alias("y"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(
                F.col("y") - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q140 — level-shift change-point detector: for each day, the difference
# between the mean of the NEXT 7 days and the mean of the PREVIOUS 7
# days of an event type's daily total, standardized by the global std —
# the window-based (non-recursive) change-point test that, unlike CUSUM,
# is expressible as pure frames and therefore runs identically on any
# engine. Flags |shift_z| > THRESH. Windows run over the bounded daily
# pivot; complete 7-day flanks only (edges are NULL-trimmed by the
# row-count guard).
# --------------------------------------------------------------------------
Q140_TYPE = "purchase"
Q140_THRESH = 1.0


@register(
    "q140_level_shift",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, sum(value) AS y
      FROM events WHERE event_type = '{Q140_TYPE}' GROUP BY 1),
    st AS (SELECT stddev_pop(y) AS sd FROM daily),
    fl AS (
      SELECT d, y,
             avg(y) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                          AND 1 PRECEDING) AS pre,
             count(*) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                            AND 1 PRECEDING) AS n_pre,
             avg(y) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING
                          AND 7 FOLLOWING) AS post,
             count(*) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING
                            AND 7 FOLLOWING) AS n_post
      FROM daily)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round((post - pre) / st.sd, 6) AS shift_z,
           abs((post - pre) / st.sd) > {Q140_THRESH} AS flagged
    FROM fl CROSS JOIN st
    WHERE n_pre = 7 AND n_post = 7
    ORDER BY day
    """,
)
def q140_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").filter(
        F.col("event_type") == Q140_TYPE
    )
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("y")
    )
    st = daily.agg(F.stddev_pop("y").alias("sd"))
    ord_w = Window.orderBy(F.unix_date("d"))
    pre_w = ord_w.rowsBetween(-7, -1)
    post_w = ord_w.rowsBetween(1, 7)
    fl = daily.select(
        "d",
        F.avg("y").over(pre_w).alias("pre"),
        F.count("*").over(pre_w).alias("n_pre"),
        F.avg("y").over(post_w).alias("post"),
        F.count("*").over(post_w).alias("n_post"),
    )
    z = (F.col("post") - F.col("pre")) / F.col("sd")
    return (
        fl.filter((F.col("n_pre") == 7) & (F.col("n_post") == 7))
        .crossJoin(F.broadcast(st))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round(z, 6).alias("shift_z"),
            (F.abs(z) > Q140_THRESH).alias("flagged"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q142 — behavior transition matrix: counts of consecutive event-type
# pairs per user ordered by time (the first-order Markov transitions
# product analytics builds journey maps from), with each pair's share of
# all transitions. The lead() window partitions by user_id; the pair
# count is map-side combinable on a |types|^2 key domain; the share
# denominator is a broadcast scalar.
#
# Tie discipline: simultaneous events order by (ts, event_id) — a total
# order, so the transition stream is identical on both engines.
# --------------------------------------------------------------------------
@register(
    "q142_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events),
    pairs AS (SELECT a, b, count(*) AS n FROM seq WHERE b IS NOT NULL
              GROUP BY 1, 2),
    tot AS (SELECT sum(n) AS t FROM pairs)
    SELECT a AS from_type, b AS to_type, CAST(n AS BIGINT) AS n,
           round(n / tot.t, 6) AS share
    FROM pairs CROSS JOIN tot
    ORDER BY from_type, to_type
    """,
)
def q142_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    pairs = seq.groupBy("a", "b").agg(F.count("*").alias("n"))
    tot = pairs.agg(F.sum("n").alias("t"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("to_type"),
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------------------------------
# q146 — incremental materialized-view maintenance: the daily rollup is
# maintained as stored partials + a delta batch merged ALGEBRAICALLY
# (counts and sums add; avg re-derives from them) — the reason a 100 TB
# nightly load never rescans history. This query runs both paths over
# the same data — history partials merged with the delta vs the direct
# full recompute — and the oracle IS the direct form, so the hash match
# proves merge ≡ recompute exactly (same discipline as q87's physical-
# rewrite proof). The merge aggregate runs over partial rows (|days| x
# |types|), never events.
# --------------------------------------------------------------------------
Q146_CUTOVER = "2023-01-20"


@register(
    "q146_incremental_mv",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(sum(value) / count(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def q146_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))

    hist = partials(events.filter(F.to_date("ts") < Q146_CUTOVER))
    delta = partials(events.filter(F.to_date("ts") >= Q146_CUTOVER))
    merged = (
        hist.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        "day",
        "event_type",
        F.col("n").alias("n_events"),
        F.round("s", 2).alias("sum_value"),
        F.round(F.col("s") / F.col("n"), 6).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# q147 — mergeable per-day KMV sketch table -> period distinct estimate:
# the daily-uniques pattern at warehouse scale — each day stores a k-min
# sketch of its user hashes (<= K rows/day), and the month/period
# estimate is computed from the STORED SKETCHES ALONE (union -> global
# k-min -> estimate), never rescanning raw events. This query builds the
# day sketches, merges them, and audits against the exact period
# distinct — the merge path touches only |days| x K sketch rows, which
# is the whole point. Deterministic md5 hashing makes the estimate
# itself oracle-checked (q90's discipline), with per-day k-min pruning
# via WindowGroupLimit.
# --------------------------------------------------------------------------
Q147_K = 64
_Q147_SCALE = float(2**60)


@register(
    "q147_kmv_daily_merge",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM events),
    day_sk AS (
      SELECT day, h FROM (
        SELECT day, h,
               row_number() OVER (PARTITION BY day ORDER BY h) AS rk
        FROM tok) WHERE rk <= {Q147_K}),
    merged AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM day_sk) t
      ORDER BY h LIMIT {Q147_K}),
    m AS (SELECT count(*) AS n_in_sketch, max(h) AS kth FROM merged),
    exact AS (
      SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
    SELECT CAST((SELECT count(DISTINCT day) FROM tok) AS BIGINT) AS n_days,
           CAST(exact.exact_distinct AS BIGINT) AS exact_distinct,
           round(CASE WHEN m.n_in_sketch < {Q147_K}
                      THEN m.n_in_sketch * 1.0
                      ELSE ({Q147_K} - 1) / (m.kth / {_Q147_SCALE!r})
                 END, 6) AS merged_estimate
    FROM m CROSS JOIN exact
    """,
)
def q147_kmv_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    tok = events.select(
        F.to_date("ts").alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("day").orderBy("h")
    day_sk = tok.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= Q147_K
    )
    # merge path: stored sketches only — distinct + global k-min via a
    # bounded heap (|days| x K input rows)
    merged = (
        day_sk.select("h").distinct().orderBy("h").limit(Q147_K)
    )
    m = merged.agg(
        F.count("*").alias("n_in_sketch"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_in_sketch") < Q147_K, F.col("n_in_sketch").cast("double")
    ).otherwise((Q147_K - 1) / (F.col("kth") / F.lit(_Q147_SCALE)))
    n_days = tok.agg(F.countDistinct("day").alias("n_days"))
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return (
        n_days.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(m))
        .select(
            "n_days",
            "exact_distinct",
            F.round(est, 6).alias("merged_estimate"),
        )
    )


# --------------------------------------------------------------------------
# q155 — dead-letter routing for semi-structured ingest: parse the props
# JSON against the expected schema and ROUTE rows that fail (here a
# deterministic 10% corruption fixture — trailing garbage appended when
# event_id % 10 == 7) to a dead-letter count instead of poisoning the
# batch — the PERMISSIVE/badRecordsPath ETL contract as an explicit
# query. Parse state is a pure row function (one from_json attempt, no
# shuffle before the per-type rollup); good rows aggregate their payload
# field, dead rows are counted with a sample of offending ids for the
# operator to triage.
# --------------------------------------------------------------------------
@register(
    "q155_dead_letter_parse",
    oracle="""
    WITH raw AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 10 = 7 THEN props || '!!' ELSE props END
               AS payload
      FROM events),
    parsed AS (
      SELECT event_type, event_id,
             TRY_CAST(json_extract(CASE WHEN json_valid(payload)
                        THEN payload END, '$.k') AS BIGINT) AS k,
             json_valid(payload) AS ok
      FROM raw)
    SELECT event_type,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_dead,
           round(avg(CASE WHEN ok THEN k END), 6) AS mean_k,
           CAST(min(CASE WHEN NOT ok THEN event_id END) AS BIGINT)
             AS first_dead_id
    FROM parsed GROUP BY 1 ORDER BY 1
    """,
)
def q155_dead_letter_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 10 == 7, F.concat(F.col("props"), F.lit("!!"))
    ).otherwise(F.col("props"))
    parsed = events.select(
        "event_type",
        "event_id",
        F.from_json(payload, "k bigint").alias("j"),
        # from_json is PERMISSIVE (null struct/fields on bad input); the
        # explicit validity bit mirrors json_valid so routing is exact
        payload.rlike(r"^\{.*\}$").alias("ok"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(F.col("ok").cast("int")).alias("n_ok"),
            F.sum((~F.col("ok")).cast("int")).alias("n_dead"),
            F.round(F.avg(F.when(F.col("ok"), F.col("j.k"))), 6).alias("mean_k"),
            F.min(F.when(~F.col("ok"), F.col("event_id"))).alias("first_dead_id"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q169 — first/last-touch revenue attribution: every purchase's value is
# credited to the user's FIRST and LAST non-purchase touch before the
# purchase (classic marketing attribution; 'direct' when no prior touch).
# One pass: first_value/last_value IGNORE NULLS windows over the per-user
# timeline — partitioned by user_id (bounded by a user's history), never
# global — then a channel-level rollup of the purchase rows only. No
# purchase x events join: the window carries the state.
# --------------------------------------------------------------------------
@register(
    "q169_touch_attribution",
    oracle="""
    WITH tl AS (
      SELECT user_id, event_type, value, ts, event_id,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS touch
      FROM events
    ),
    attr AS (
      SELECT user_id, event_type, value,
             first_value(touch IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS first_touch,
             last_value(touch IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_touch
      FROM tl
    ),
    purch AS (
      SELECT coalesce(first_touch, 'direct') AS first_ch,
             coalesce(last_touch, 'direct') AS last_ch, value
      FROM attr WHERE event_type = 'purchase'
    ),
    f AS (SELECT first_ch AS channel, count(*) AS n_first,
                 round(sum(value), 2) AS rev_first
          FROM purch GROUP BY 1),
    l AS (SELECT last_ch AS channel, count(*) AS n_last,
                 round(sum(value), 2) AS rev_last
          FROM purch GROUP BY 1)
    SELECT coalesce(f.channel, l.channel) AS channel,
           CAST(coalesce(n_first, 0) AS BIGINT) AS n_first,
           coalesce(rev_first, 0.0) AS rev_first,
           CAST(coalesce(n_last, 0) AS BIGINT) AS n_last,
           coalesce(rev_last, 0.0) AS rev_last
    FROM f FULL OUTER JOIN l ON f.channel = l.channel
    """,
)
def q169_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attr = ev.select(
        "user_id",
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    purch = attr.filter(F.col("event_type") == "purchase").select(
        F.coalesce("first_touch", F.lit("direct")).alias("first_ch"),
        F.coalesce("last_touch", F.lit("direct")).alias("last_ch"),
        "value",
    )
    f = purch.groupBy(F.col("first_ch").alias("channel")).agg(
        F.count("*").alias("n_first"), F.round(F.sum("value"), 2).alias("rev_first")
    )
    ll = purch.groupBy(F.col("last_ch").alias("channel")).agg(
        F.count("*").alias("n_last"), F.round(F.sum("value"), 2).alias("rev_last")
    )
    return (
        f.join(ll, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("n_first", F.lit(0)).cast("bigint").alias("n_first"),
            F.coalesce("rev_first", F.lit(0.0)).alias("rev_first"),
            F.coalesce("n_last", F.lit(0)).cast("bigint").alias("n_last"),
            F.coalesce("rev_last", F.lit(0.0)).alias("rev_last"),
        )
    )


# --------------------------------------------------------------------------
# q177 — backfill planning: partition-completeness audit over the
# (event_type, hour) grid. Expected hours = the full [min, max] hour
# range of the stream; observed = hours with >= 1 event for the type;
# missing hours coalesce into contiguous backfill intervals via
# gaps-and-islands (island id = hour_index - dense rank). The output is
# the work list a backfill orchestrator consumes. Hour keys are integer
# epoch-hours (UTC) — no tz-sensitive formatting in the compare — and
# the expected grid is generated per type from two scalars, never by
# scanning.
# --------------------------------------------------------------------------
@register(
    "q177_backfill_plan",
    oracle="""
    WITH span AS (
      SELECT CAST(floor(epoch(min(ts)) / 3600) AS BIGINT) AS h0,
             CAST(floor(epoch(max(ts)) / 3600) AS BIGINT) AS h1
      FROM events
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    expected AS (
      SELECT t.event_type, h.h
      FROM types t
      CROSS JOIN (SELECT unnest(range((SELECT h0 FROM span),
                                      (SELECT h1 FROM span) + 1)) AS h) h
    ),
    observed AS (
      SELECT DISTINCT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
      FROM events
    ),
    missing AS (
      SELECT e.event_type, e.h
      FROM expected e LEFT JOIN observed o
        ON e.event_type = o.event_type AND e.h = o.h
      WHERE o.h IS NULL
    ),
    islands AS (
      SELECT event_type, h,
             h - row_number() OVER (PARTITION BY event_type ORDER BY h)
                 AS grp
      FROM missing
    )
    SELECT event_type,
           CAST(min(h) AS BIGINT) AS gap_start_hour,
           CAST(max(h) AS BIGINT) AS gap_end_hour,
           CAST(count(*) AS BIGINT) AS n_hours
    FROM islands GROUP BY event_type, grp
    """,
)
def q177_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # unix_micros is timezone-independent (epoch microseconds), matching
    # the oracle's epoch(); unix_timestamp would re-interpret the
    # timestamp under spark.sql.session.timeZone and shift hour buckets
    # on non-UTC sessions (ADVICE r4). floor(), not integer `div`: div
    # truncates toward zero and would disagree with the oracle's
    # floor(epoch/3600) for pre-1970 timestamps. Exact-hour boundaries
    # stay exact: h*3.6e9 and h are both representable doubles, so the
    # correctly-rounded quotient is exactly h.
    hour = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("bigint")
    span = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    types = ev.select("event_type").distinct()
    expected = (
        types.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1")).alias("h"),
        )
    )
    observed = ev.select("event_type", hour.alias("h")).distinct()
    missing = expected.join(observed, ["event_type", "h"], "left_anti")
    wi = Window.partitionBy("event_type").orderBy("h")
    islands = missing.select(
        "event_type",
        "h",
        (F.col("h") - F.row_number().over(wi)).alias("grp"),
    )
    return islands.groupBy("event_type", "grp").agg(
        F.min("h").cast("bigint").alias("gap_start_hour"),
        F.max("h").cast("bigint").alias("gap_end_hour"),
        F.count("*").cast("bigint").alias("n_hours"),
    ).drop("grp")


# --------------------------------------------------------------------------
# q181 — behavior affinity (lift): for ordered event-type pairs, lift =
# P(user does b | user does a) / P(user does b) over distinct user sets.
# The market-basket association measure on the user x event bipartite
# graph; lift > 1 = types co-engage. Inputs are |users| x |types|
# distinct rows; the pair join is keyed on user_id and bounded by each
# user's distinct-type count (<= 5 here, bounded by the catalog size in
# general) — never |users|^2.
# --------------------------------------------------------------------------
@register(
    "q181_affinity_lift",
    oracle="""
    WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    per AS (SELECT event_type, count(*) AS n_t FROM du GROUP BY 1),
    co AS (
      SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_ab
      FROM du a JOIN du b ON a.user_id = b.user_id
                        AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_both,
           round(n_ab * 1.0 / pa.n_t, 6) AS p_b_given_a,
           round((n_ab * 1.0 / pa.n_t) / (pb.n_t * 1.0 / n.n_users), 6)
               AS lift
    FROM co
    JOIN per pa ON co.ta = pa.event_type
    JOIN per pb ON co.tb = pb.event_type
    CROSS JOIN n
    """,
)
def q181_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = ev.select("user_id", "event_type").distinct()
    n = ev.agg(F.countDistinct("user_id").alias("n_users"))
    per = du.groupBy("event_type").agg(F.count("*").alias("n_t"))
    a = du.select("user_id", F.col("event_type").alias("ta"))
    b = du.select("user_id", F.col("event_type").alias("tb"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("ta") != F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_ab"))
    )
    pa = per.select(F.col("event_type").alias("ta"), F.col("n_t").alias("na"))
    pb = per.select(F.col("event_type").alias("tb"), F.col("n_t").alias("nb"))
    return (
        co.join(F.broadcast(pa), "ta")
        .join(F.broadcast(pb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta",
            "tb",
            F.col("n_ab").cast("bigint").alias("n_both"),
            F.round(F.col("n_ab") * F.lit(1.0) / F.col("na"), 6).alias(
                "p_b_given_a"
            ),
            F.round(
                (F.col("n_ab") * F.lit(1.0) / F.col("na"))
                / (F.col("nb") * F.lit(1.0) / F.col("n_users")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# q182 — sequential path mining: the most common 3-step event-type paths
# across user timelines, built with lead() windows over each user's
# (ts, event_id)-ordered stream — no collect_list, no Python, and the
# window is per-user (bounded by history length). The output is the
# top-20 paths by frequency with a deterministic rank — the "what do
# users do next" table behind funnel design (q84 checks a FIXED funnel;
# this discovers them).
# --------------------------------------------------------------------------
Q182_TOPK = 20


@register(
    "q182_path_mining",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS s0,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS s1,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS s2
      FROM events
    ),
    paths AS (
      SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n
      FROM seq WHERE s2 IS NOT NULL GROUP BY 1
    )
    SELECT path, CAST(n AS BIGINT) AS n_occurrences,
           CAST(rk AS INT) AS rk
    FROM (SELECT path, n,
                 row_number() OVER (ORDER BY n DESC, path) AS rk
          FROM paths)
    WHERE rk <= {Q182_TOPK}
    """,
)
def q182_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s0"),
        F.lead("event_type", 1).over(w).alias("s1"),
        F.lead("event_type", 2).over(w).alias("s2"),
    )
    paths = (
        seq.filter(F.col("s2").isNotNull())
        .select(
            F.concat_ws(">", "s0", "s1", "s2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    # global top-k: TakeOrderedAndProject-sized (|paths| <= |types|^3),
    # rank assigned post-limit on the tiny result
    top = paths.orderBy(F.desc("n"), F.asc("path")).limit(Q182_TOPK)
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return top.select(
        "path",
        F.col("n").cast("bigint").alias("n_occurrences"),
        F.row_number().over(wr).alias("rk"),
    )


# --------------------------------------------------------------------------
# q196 — RFM segmentation: per-user recency (days since last purchase),
# frequency (purchase count) and monetary (purchase value) quintiles,
# rolled up to segment sizes — the classic warehouse customer-value
# cube. ntile(5) windows run over the per-user ROLLUP (|users| rows,
# never the event stream); ordering carries a user_id tie-break so both
# engines assign identical quintiles. At catalog scale the quintile
# boundaries come from the q126-style sketch instead of a global ntile —
# this exact form is the audit tier (cf. q193's note).
# --------------------------------------------------------------------------
@register(
    "q196_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT max(ts) AS t1 FROM events),
    per_user AS (
      SELECT user_id,
             CAST(epoch_us(anchor.t1 - max(ts)) // 86400000000 AS BIGINT)
                 AS recency_days,
             count(*) AS frequency,
             round(sum(value), 2) AS monetary
      FROM events CROSS JOIN anchor
      WHERE event_type = 'purchase'
      GROUP BY user_id, anchor.t1
    ),
    scored AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY recency_days, user_id) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m,
             monetary
      FROM per_user
    )
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(monetary), 2) AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q196_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("t1"))
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "t1")
        .agg(
            # microsecond-exact integer day arithmetic on BOTH engines:
            # unix_timestamp truncates to whole seconds while DuckDB's
            # epoch(interval) is fractional, so a user whose last purchase
            # straddles a day boundary by sub-second could land in a
            # different recency quintile per engine. diff >= 0 (anchor is
            # the global max), so `div` truncation == floor division.
            F.expr(
                "(unix_micros(first(t1)) - unix_micros(max(ts)))"
                " div 86400000000"
            )
            .cast("bigint")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .drop("t1")
    )
    wr = Window.orderBy("recency_days", "user_id")
    wf = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    wm = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    scored = per_user.select(
        "user_id",
        F.ntile(5).over(wr).alias("r"),
        F.ntile(5).over(wf).alias("f"),
        F.ntile(5).over(wm).alias("m"),
        "monetary",
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.sum("monetary"), 2).alias("total_monetary"),
    )


# --------------------------------------------------------------------------
# q198 — Gini concentration of engagement value: how unequally total
# purchase value distributes across users, via the exact rank formula
# G = 2*sum(i * x_i)/(n * sum(x)) - (n + 1)/n over values sorted
# ascending. One rank window over the per-user rollup; the inequality
# metric every marketplace/abuse dashboard tracks.
# --------------------------------------------------------------------------
@register(
    "q198_gini",
    oracle="""
    WITH per_user AS (
      SELECT user_id, sum(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, user_id) AS i,
             count(*) OVER () AS n, sum(v) OVER () AS tv
      FROM per_user
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           round(max(tv), 2) AS total_value,
           round(2.0 * sum(i * v) / (max(n) * max(tv))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    """,
)
def q198_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("v"))
    )
    wr = Window.orderBy("v", "user_id")
    wall = Window.partitionBy()
    ranked = per_user.select(
        "v",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("v").over(wall).alias("tv"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.round(F.max("tv"), 2).alias("total_value"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("v")) / (F.max("n") * F.max("tv"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# q233 — PSI drift monitor (population stability index, the standard
# production-ML input-drift alarm): per event_type, PSI of the `value`
# distribution between the reference window (first half of the stream's
# day range) and the current window (second half), over FIXED value bins
# bin = greatest(0, least(floor(value / 25), 9)) with Laplace smoothing
# across the full 10-bin domain (the lower clamp keeps out-of-range
# negative values inside the scaffold domain instead of silently
# dropping their mass from the terms while still counting them in
# n_ref/n_cur — the generator clips to [0, 560] today, but the operator
# must hold for general data):
#     PSI = sum_i (q_i - p_i) * ln(q_i / p_i),
#     p_i = (ref_i + 1)/(n_ref + 10),  q_i = (cur_i + 1)/(n_cur + 10).
#
# Determinism: bins are integer floors of exactly-representable
# divisions (values carry 2 decimals; v/25 only lands on an integer when
# it is exact in binary); every per-bin PSI term is one double chain
# from exact integer counts, frozen to BIGINT nano-units before the
# per-type sum, so summation order cannot move the result. The split
# day is integer midpoint of min/max epoch days — corpus-derived, no
# wall clock.
#
# Scale shape: one map-side-combinable groupBy over (type, window, bin)
# — the shuffle carries <= types x 2 x 10 rows of counts regardless of
# event volume; the bin-domain scaffold is a broadcast-sized explode.
# --------------------------------------------------------------------------
Q233_BIN_W = 25.0
Q233_NBINS = 10


def _q233_oracle() -> str:
    return f"""
    WITH ev AS (
      SELECT event_type, value,
             CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day
      FROM events
    ),
    split AS (
      SELECT (min(day) + max(day)) // 2 AS mid FROM ev
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN ev.day <= split.mid THEN 'ref' ELSE 'cur' END AS win,
             greatest(0, least(CAST(floor(value / {Q233_BIN_W}) AS BIGINT),
                               {Q233_NBINS - 1})) AS bin
      FROM ev CROSS JOIN split
    ),
    cnt AS (
      SELECT event_type, win, bin, count(*) AS c FROM binned GROUP BY 1, 2, 3
    ),
    tots AS (
      SELECT event_type,
             sum(CASE WHEN win = 'ref' THEN c ELSE 0 END) AS nr,
             sum(CASE WHEN win = 'cur' THEN c ELSE 0 END) AS nc
      FROM cnt GROUP BY 1
    ),
    dom AS (
      SELECT t.event_type, t.nr, t.nc, g.bin
      FROM tots t, (SELECT unnest(generate_series(0, {Q233_NBINS - 1})) AS bin) g
    ),
    terms AS (
      SELECT d.event_type, d.nr, d.nc,
             CAST(round(
               (((coalesce(c2.c, 0) + 1) * 1.0 / (d.nc + {Q233_NBINS}))
                - ((coalesce(c1.c, 0) + 1) * 1.0 / (d.nr + {Q233_NBINS})))
               * ln(((coalesce(c2.c, 0) + 1) * 1.0 * (d.nr + {Q233_NBINS}))
                    / (((coalesce(c1.c, 0) + 1)) * 1.0 * (d.nc + {Q233_NBINS})))
               * 1000000000, 0) AS BIGINT) AS term_nano
      FROM dom d
      LEFT JOIN cnt c1 ON c1.event_type = d.event_type AND c1.bin = d.bin
                       AND c1.win = 'ref'
      LEFT JOIN cnt c2 ON c2.event_type = d.event_type AND c2.bin = d.bin
                       AND c2.win = 'cur'
    )
    SELECT event_type,
           CAST(min(nr) AS BIGINT) AS n_ref,
           CAST(min(nc) AS BIGINT) AS n_cur,
           round(sum(term_nano) / 1000000000.0, 6) AS psi
    FROM terms GROUP BY 1
    """


@register("q233_psi_drift", oracle=_q233_oracle())
def q233_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_type",
        "value",
        (F.col("ts_us") / F.lit(_DAY_US)).cast("bigint").alias("day"),
    )
    split = ev.agg(
        ((F.min("day") + F.max("day")) / 2).cast("bigint").alias("mid")
    )
    binned = ev.crossJoin(F.broadcast(split)).select(
        "event_type",
        F.when(F.col("day") <= F.col("mid"), "ref").otherwise("cur")
        .alias("win"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.floor(F.col("value") / Q233_BIN_W).cast("bigint"),
                F.lit(Q233_NBINS - 1),
            ),
        ).alias("bin"),
    )
    # the count table is <= types x 2 x NBINS rows and feeds THREE
    # consumers (totals + both window legs) — materialize so the event
    # scan and the one-row split broadcast run once, not per consumer
    cnt = materialize(
        binned.groupBy("event_type", "win", "bin").agg(
            F.count("*").alias("c")
        )
    )
    tots = cnt.groupBy("event_type").agg(
        F.sum(F.when(F.col("win") == "ref", F.col("c")).otherwise(0))
        .alias("nr"),
        F.sum(F.when(F.col("win") == "cur", F.col("c")).otherwise(0))
        .alias("nc"),
    )
    dom = tots.select(
        "event_type", "nr", "nc",
        F.explode(F.sequence(F.lit(0), F.lit(Q233_NBINS - 1))).alias("bin"),
    )
    c1 = cnt.filter(F.col("win") == "ref").select(
        "event_type", "bin", F.col("c").alias("cr")
    )
    c2 = cnt.filter(F.col("win") == "cur").select(
        "event_type", "bin", F.col("c").alias("cc")
    )
    j = (
        dom.join(c1, ["event_type", "bin"], "left")
        .join(c2, ["event_type", "bin"], "left")
    )
    p_ref = (F.coalesce(F.col("cr"), F.lit(0)) + 1) * F.lit(1.0) / (
        F.col("nr") + Q233_NBINS
    )
    p_cur = (F.coalesce(F.col("cc"), F.lit(0)) + 1) * F.lit(1.0) / (
        F.col("nc") + Q233_NBINS
    )
    ratio = (
        (F.coalesce(F.col("cc"), F.lit(0)) + 1)
        * F.lit(1.0)
        * (F.col("nr") + Q233_NBINS)
    ) / (
        (F.coalesce(F.col("cr"), F.lit(0)) + 1)
        * F.lit(1.0)
        * (F.col("nc") + Q233_NBINS)
    )
    term_nano = F.round((p_cur - p_ref) * F.log(ratio) * 1e9, 0).cast(
        "bigint"
    )
    terms = j.select("event_type", "nr", "nc", term_nano.alias("term_nano"))
    return terms.groupBy("event_type").agg(
        F.min("nr").cast("bigint").alias("n_ref"),
        F.min("nc").cast("bigint").alias("n_cur"),
        F.round(F.sum("term_nano") / 1e9, 6).alias("psi"),
    )


# --------------------------------------------------------------------------
# q235 — two-sample Kolmogorov-Smirnov drift statistic (the
# distribution-free companion to q233's binned PSI: PSI needs a bin
# design and misses within-bin shape changes; KS is the sup-norm
# distance between the two raw ECDFs). Same ref/cur split as q233
# (integer midpoint of the stream's day range). Per event_type:
#
#     D = max over observed v of |F_ref(v) - F_cur(v)|
#       = max |cum_ref(v) * n_cur - cum_cur(v) * n_ref| / (n_ref*n_cur)
#
# Determinism: the max is taken on the EXACT BIGINT numerator
# (cum counts and totals are integers), with the smallest achieving
# value as the reported location (max(struct(num, -v)) — integer-first
# ordering, so no float rank boundary exists); D itself is one double
# division of exact integers, identical on both engines, rounded 6dp.
#
# Scale shape: one map-side-combinable groupBy over (type, value, win),
# then a cumulative-sum window PARTITIONED BY event_type over the
# distinct values (never a global window), then a struct-max aggregate
# — the shuffled volume after the first groupBy is bounded by the
# distinct (type, value) pairs, not the event count.
# --------------------------------------------------------------------------


def _q235_oracle() -> str:
    return f"""
    WITH ev AS (
      SELECT event_type, value,
             CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day
      FROM events
    ),
    split AS (SELECT (min(day) + max(day)) // 2 AS mid FROM ev),
    cnt AS (
      SELECT event_type, value,
             count(*) FILTER (day <= split.mid) AS cr,
             count(*) FILTER (day > split.mid) AS cc
      FROM ev CROSS JOIN split GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, value,
             CAST(sum(cr) OVER w AS BIGINT) AS fr,
             CAST(sum(cc) OVER w AS BIGINT) AS fc,
             CAST(sum(cr) OVER t AS BIGINT) AS nr,
             CAST(sum(cc) OVER t AS BIGINT) AS nc
      FROM cnt
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             t AS (PARTITION BY event_type)
    ),
    num AS (
      SELECT event_type, value, nr, nc,
             abs(fr * nc - fc * nr) AS d_num
      FROM cum
    ),
    best AS (
      SELECT event_type, nr, nc, d_num, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY d_num DESC, value) AS rn
      FROM num
    )
    SELECT event_type, nr AS n_ref, nc AS n_cur,
           round(d_num * 1.0 / (nr * nc), 6) AS ks,
           value AS ks_at
    FROM best WHERE rn = 1
    """


@register("q235_ks_drift", oracle=_q235_oracle())
def q235_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).select(
        "event_type",
        "value",
        (F.col("ts_us") / F.lit(_DAY_US)).cast("bigint").alias("day"),
    )
    split = ev.agg(
        ((F.min("day") + F.max("day")) / 2).cast("bigint").alias("mid")
    )
    cnt = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("event_type", "value")
        .agg(
            F.count(F.when(F.col("day") <= F.col("mid"), 1)).alias("cr"),
            F.count(F.when(F.col("day") > F.col("mid"), 1)).alias("cc"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = cnt.select(
        "event_type",
        "value",
        F.sum("cr").over(wcum).alias("fr"),
        F.sum("cc").over(wcum).alias("fc"),
        F.sum("cr").over(wtot).alias("nr"),
        F.sum("cc").over(wtot).alias("nc"),
    )
    num = cum.withColumn(
        "d_num", F.abs(F.col("fr") * F.col("nc") - F.col("fc") * F.col("nr"))
    )
    best = num.groupBy("event_type").agg(
        F.max("nr").alias("n_ref"),
        F.max("nc").alias("n_cur"),
        F.max(
            F.struct(F.col("d_num").alias("d"), (-F.col("value")).alias("nv"))
        ).alias("b"),
    )
    return best.select(
        "event_type",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(
            F.col("b.d") * F.lit(1.0) / (F.col("n_ref") * F.col("n_cur")), 6
        ).alias("ks"),
        (-F.col("b.nv")).alias("ks_at"),
    )


# --------------------------------------------------------------------------
# q238 — two-sample Mann-Whitney U drift (rank-sum): the third member of
# the drift family — PSI (q233) needs a bin design, KS (q235) is the
# sup-norm of the ECDF gap, and U is the RANK statistic: sensitive to
# stochastic dominance (a median/location shift that KS can understate
# and PSI's bins can swallow). Same ref/cur split as q233/q235 (integer
# midpoint of the stream's day range). Per event_type:
#
#     U = R_ref - n_ref(n_ref+1)/2,  R_ref = sum of ref ranks in the
#     COMBINED sample, ties taking the midrank.
#
# Determinism: midranks step by 1/2, so 2*R_ref is an exact BIGINT —
# per distinct value v with cb = combined count of smaller values and
# n_v = combined count at v, each ref occurrence contributes midrank
# cb + (n_v+1)/2, i.e. 2*contribution = cr_v * (2*cb + n_v + 1). The
# whole statistic stays integer through u2 = 2U; the reported effect
# size auc = U / (n_ref*n_cur) (the common-language effect size /
# ROC-AUC identity) is ONE double division of exact integers — no float
# boundary anywhere before the final rounding.
#
# Scale shape: identical to q235 — one map-side-combinable groupBy over
# (type, value), a cumulative window PARTITIONED BY event_type over the
# distinct values (never global), then one aggregate per type.
# --------------------------------------------------------------------------


def _q238_oracle() -> str:
    return f"""
    WITH ev AS (
      SELECT event_type, value,
             CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day
      FROM events
    ),
    split AS (SELECT (min(day) + max(day)) // 2 AS mid FROM ev),
    cnt AS (
      SELECT event_type, value,
             count(*) FILTER (day <= split.mid) AS cr,
             count(*) FILTER (day > split.mid) AS cc
      FROM ev CROSS JOIN split GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, value, cr, cc,
             CAST(coalesce(sum(cr + cc) OVER w, 0) AS BIGINT) AS cb
      FROM cnt
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(cr) AS BIGINT) AS n_ref,
             CAST(sum(cc) AS BIGINT) AS n_cur,
             CAST(sum(cr * (2 * cb + cr + cc + 1)) AS BIGINT) AS r2_ref
      FROM cum GROUP BY 1
    )
    SELECT event_type, n_ref, n_cur,
           r2_ref - n_ref * (n_ref + 1) AS u2,
           round((r2_ref - n_ref * (n_ref + 1))
                 / (2.0 * n_ref * n_cur), 6) AS auc
    FROM agg
    """


@register("q238_mwu_drift", oracle=_q238_oracle())
def q238_mwu_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).select(
        "event_type",
        "value",
        (F.col("ts_us") / F.lit(_DAY_US)).cast("bigint").alias("day"),
    )
    split = ev.agg(
        ((F.min("day") + F.max("day")) / 2).cast("bigint").alias("mid")
    )
    cnt = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("event_type", "value")
        .agg(
            F.count(F.when(F.col("day") <= F.col("mid"), 1)).alias("cr"),
            F.count(F.when(F.col("day") > F.col("mid"), 1)).alias("cc"),
        )
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cnt.select(
        "event_type",
        "cr",
        "cc",
        F.coalesce(F.sum(F.col("cr") + F.col("cc")).over(wb), F.lit(0))
        .cast("bigint")
        .alias("cb"),
    )
    agg = cum.groupBy("event_type").agg(
        F.sum("cr").cast("bigint").alias("n_ref"),
        F.sum("cc").cast("bigint").alias("n_cur"),
        F.sum(
            F.col("cr") * (2 * F.col("cb") + F.col("cr") + F.col("cc") + 1)
        )
        .cast("bigint")
        .alias("r2_ref"),
    )
    u2 = F.col("r2_ref") - F.col("n_ref") * (F.col("n_ref") + 1)
    return agg.select(
        "event_type",
        "n_ref",
        "n_cur",
        u2.alias("u2"),
        F.round(
            u2 / (2.0 * F.col("n_ref") * F.col("n_cur")), 6
        ).alias("auc"),
    )
