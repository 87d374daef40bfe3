"""Sessionization + curation queries (q48-q50)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..streaming.sessionize import SESSION_GAP_SEC, sessionize_batch
from ..tables import load
from .registry import materialize, register


# --------------------------------------------------------------------------
# q48 — gap sessionization (batch form; the streaming twin is
# streaming/sessionize.sessionize_stream, equality-tested). Per session:
# event count, duration. Window lag -> flag -> running sum, one shuffle.
# --------------------------------------------------------------------------
@register(
    "q48_sessionization",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           round(epoch(max(ts)) - epoch(min(ts)), 0) AS duration_sec
    FROM sessions
    GROUP BY 1, 2
    """,
)
def q48_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    sess = sessionize_batch(events)
    dur = (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000)
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(dur, 0).alias("duration_sec"),
    )


# --------------------------------------------------------------------------
# q49 — composite quality score: the curation gate that decides whether a
# document enters the training set (weighted mix of length, diversity and
# stopword signals; weights arbitrary-but-fixed). One scan, pure codegen.
# --------------------------------------------------------------------------
@register(
    "q49_quality_score",
    oracle="""
    WITH feats AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tok,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
        FROM documents
    )
    SELECT doc_id, lang,
           round(0.4 * least(n_tok / 100.0, 1.0) + 0.4 * ttr + 0.2 * (1 - stop_ratio), 6) AS quality,
           CAST(0.4 * least(n_tok / 100.0, 1.0) + 0.4 * ttr + 0.2 * (1 - stop_ratio) >= 0.5 AS INT) AS keep
    FROM feats
    """,
)
def q49_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))).cast("double") / n_tok
    )
    quality = (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0)) + 0.4 * ttr + 0.2 * (1 - stop_ratio)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.round(quality, 6).alias("quality"),
        (quality >= 0.5).cast("int").alias("keep"),
    )


# --------------------------------------------------------------------------
# q50 — keep-first dedup by key (the ordering-aware dropDuplicates every
# curation pipeline needs: earliest event wins per (user, type)). The
# row_number form is deterministic under ties, unlike dropDuplicates whose
# survivor depends on partitioning.
# --------------------------------------------------------------------------
@register(
    "q50_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event, round(value, 3) AS first_value
    FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rk
        FROM events
    )
    WHERE rk = 1
    """,
)
def q50_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event"),
            F.round("value", 3).alias("first_value"),
        )
    )


# --------------------------------------------------------------------------
# q156 — stateful streaming EMA: per-user exponentially-weighted moving
# average of event values folded across micro-batches through keyed
# state (applyInPandasWithState; Spark 4's transformWithStateInPandas
# successor API is env-blocked here — its worker needs google.protobuf,
# absent from this container — see streaming/ema_state.py). The
# fixture lands the events in TWO files drained as two micro-batches
# (maxFilesPerTrigger=1), so the result only matches if state carries the
# running (ema, n) across batches — and because the fold order (ts,
# event_id) is total and floats ride through state exactly, the streamed
# recurrence is bit-identical to a single-pass fold. The oracle is the
# closed-form weighted sum (batch SQL over the whole table), equal to the
# recurrence within 6-dp rounding.
# --------------------------------------------------------------------------
Q156_ALPHA = 0.3


@register(
    "q156_stateful_ema",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events),
    weighted AS (
      SELECT user_id, n,
             value * CASE WHEN rn = 1
                          THEN pow(1.0 - {Q156_ALPHA}, n - 1)
                          ELSE {Q156_ALPHA} * pow(1.0 - {Q156_ALPHA}, n - rn)
                     END AS w
      FROM ordered)
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           round(sum(w), 6) AS ema
    FROM weighted GROUP BY 1
    """,
)
def q156_stateful_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    from ..streaming.ema_state import ema_stream
    from ..streaming.staging import stage_single_parquet

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    work = tempfile.mkdtemp(prefix="ema_state_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        # land two batch files split at a TIME boundary — batches must
        # arrive in fold order (the EMA recurrence is order-sensitive);
        # two files => two micro-batches. Pin mtimes explicitly: the file
        # source orders by modification time at ms granularity, and two
        # fast local writes can land in the SAME millisecond, letting b1
        # drain first and trip the in-order guard (r8 review — every
        # other multi-batch site already pins mtime).
        now = int(time.time())
        for i, cond in enumerate(
            [F.to_date("ts") < "2023-01-16", F.to_date("ts") >= "2023-01-16"]
        ):
            stage_single_parquet(
                events.filter(cond), f"{src}/b{i}.parquet", mtime=now - 60 + i * 10
            )
        ema_stream(
            spark,
            src,
            events.schema,
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            alpha=Q156_ALPHA,
            # full session width, DELIBERATELY not the q61/q65 narrow
            # treatment: this fold is Python compute (per-row float
            # recurrence in applyInPandasWithState), so state width is
            # its parallelism — the r13 sf1.0 A/B measured width 8 at
            # 15.7 s vs width 32 at ~8.4 s. Narrow widths only pay off
            # for cheap JVM state ops where the store commit dominates.
        )
        out = spark.read.parquet(f"{work}/out")
        # latest emission per key = the cumulative answer (n monotonic)
        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        final = (
            out.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("user_id", "n_events", F.round("ema", 6).alias("ema"))
        )
        return materialize(final)
    finally:
        shutil.rmtree(work, ignore_errors=True)
