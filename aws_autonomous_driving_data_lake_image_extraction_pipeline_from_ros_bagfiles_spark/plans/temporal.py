"""Temporal join queries: as-of (nearest-timestamp) and keyed range joins
over the events stream — the sensor-fusion generalizations of the
reference's exact (timestamp, camera) frame/prediction join (SURVEY J2;
service joins both sides of one frame id).

Timestamps are compared as epoch MICROSECONDS (bigint) on both engines:
events.parquet carries TIMESTAMP(NANOS), which tables.load() and DuckDB
independently truncate to micros, so ``unix_micros`` == ``epoch_us``
exactly and no float/tz drift can enter the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.ranges import interval_point_join
from ..tables import load
from .registry import register

_HOUR_US = 3_600_000_000
_10MIN_US = 600_000_000


# --------------------------------------------------------------------------
# q66 — as-of join: every click matched to the user's most recent view
# at-or-before it, within a 1-hour tolerance; left-outer (unmatched clicks
# kept with NULLs). One shuffle on user_id (union+window plan; see
# operators/asof.py). Tie-break contract: latest ts, then highest view_id.
# --------------------------------------------------------------------------
@register(
    "q66_asof_join",
    oracle=f"""
    WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
                FROM events),
    clicks AS (SELECT event_id AS click_id, user_id, ts_us FROM ev
               WHERE event_type = 'click'),
    views AS (SELECT event_id AS view_id, user_id, ts_us, value FROM ev
              WHERE event_type = 'view'),
    cand AS (
        SELECT c.click_id, v.view_id, v.ts_us AS vts, v.value,
               row_number() OVER (PARTITION BY c.click_id
                                  ORDER BY v.ts_us DESC, v.view_id DESC) AS rk
        FROM clicks c
        JOIN views v ON c.user_id = v.user_id
                    AND v.ts_us <= c.ts_us
                    AND v.ts_us >= c.ts_us - {_HOUR_US}
    )
    SELECT c.click_id, c.user_id, c.ts_us AS click_ts_us,
           w.vts AS view_ts_us, w.view_id, w.value AS view_value,
           c.ts_us - w.vts AS lag_us
    FROM clicks c
    LEFT JOIN (SELECT * FROM cand WHERE rk = 1) w USING (click_id)
    """,
)
def q66_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts_us", "value"
    )
    out = asof_join(
        clicks,
        views,
        ts_col="ts_us",
        by=["user_id"],
        value_cols=["view_id", "value"],
        tolerance=_HOUR_US,
        direction="backward",
    )
    return out.select(
        "click_id",
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        F.col("r_ts_us").alias("view_ts_us"),
        F.col("r_view_id").alias("view_id"),
        F.col("r_value").alias("view_value"),
        (F.col("ts_us") - F.col("r_ts_us")).alias("lag_us"),
    )


# --------------------------------------------------------------------------
# q67 — keyed range join: each error event opens a 10-minute window; count
# the same user's clicks falling strictly after the error and within the
# window. Bin-bucketed equi-join (operators/ranges.py), never a
# nested-loop theta join; the oracle IS the theta join (tractable at
# oracle scale), proving the bucketed plan computes the same relation.
# --------------------------------------------------------------------------
@register(
    "q67_range_join",
    oracle=f"""
    WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
                FROM events),
    errs AS (SELECT event_id AS error_id, user_id, ts_us AS start_us,
                    ts_us + {_10MIN_US} AS end_us
             FROM ev WHERE event_type = 'error'),
    clicks AS (SELECT event_id AS click_id, user_id, ts_us FROM ev
               WHERE event_type = 'click'),
    pairs AS (
        SELECT e.user_id, e.error_id, c.click_id
        FROM errs e JOIN clicks c
          ON e.user_id = c.user_id
         AND c.ts_us > e.start_us AND c.ts_us <= e.end_us
    )
    SELECT user_id,
           count(*) AS n_pairs,
           CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT error_id) AS BIGINT) AS n_errors
    FROM pairs
    GROUP BY user_id
    """,
)
def q67_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
    )
    errs = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + _10MIN_US).alias("end_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts_us")
    )
    pairs = interval_point_join(
        errs,
        clicks,
        keys=["user_id"],
        start_col="start_us",
        end_col="end_us",
        pt_col="ts_us",
        bin_size=_10MIN_US,
        include_start=False,
        include_end=True,
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("click_id").alias("n_clicks"),
        F.countDistinct("error_id").alias("n_errors"),
    )


# --------------------------------------------------------------------------
# q127 — trajectory simplification (Ramer-Douglas-Peucker) per track:
# the GPS/odometry polyline reduction an AD data lake runs on every
# drive before map display / route clustering. RDP is sequential WITHIN
# a track and embarrassingly parallel ACROSS tracks, so it runs as one
# applyInPandas group per track (operators/trajectory.py) — the shuffle
# carries each track once, no cross-track movement, which is the whole
# scale story (a 100 TB trace corpus is millions of independent tracks).
#
# The fixture is deterministic (a spiked straight line and a sampled
# sine), so the oracle pins the exact kept-point index sets — keep/drop
# decisions, not just counts. Reduction-quality properties (every
# dropped point within eps of the simplified polyline) are asserted in
# tests/test_trajectory.py.
# --------------------------------------------------------------------------
Q127_EPS = 1.0


def _trajectories(spark: SparkSession) -> DataFrame:
    import math

    rows = []
    for i in range(21):  # track 0: straight line with a spike at i=10
        rows.append((0, i, float(i), 5.0 if i == 10 else 0.0))
    for i in range(31):  # track 1: sine wave, 6-decimal samples
        rows.append((1, i, float(i), round(3.0 * math.sin(i / 3.0), 6)))
    return spark.createDataFrame(
        rows, "track_id bigint, seq bigint, x double, y double"
    ).coalesce(2)  # 52-point fixture: don't fan 32 python workers for it


@register(
    "q127_trajectory_simplify",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(21 AS BIGINT), CAST(5 AS BIGINT), '0,9,10,11,20'),
        (CAST(1 AS BIGINT), CAST(31 AS BIGINT), CAST(5 AS BIGINT), '0,5,15,24,30')
    ) AS t(track_id, n_points, n_kept, kept_idx)
    """,
)
def q127_trajectory_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import simplify_trajectories

    traj = _trajectories(spark)
    kept = simplify_trajectories(traj, eps=Q127_EPS)
    totals = traj.groupBy("track_id").agg(F.count("*").alias("n_points"))
    summary = kept.groupBy("track_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(F.array_sort(F.collect_list("seq")), ",").alias("kept_idx"),
    )
    return (
        totals.join(summary, "track_id")
        .select("track_id", "n_points", "n_kept", "kept_idx")
        .orderBy("track_id")
    )
