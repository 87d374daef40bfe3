"""Custom stateful streaming operator: gap-based sessionization.

The reference's only session notion is the implicit frame-cadence bucket
(frame_duration=67ms, ST6); a real event pipeline needs gap sessions. Two
implementations with identical semantics:

- :func:`sessionize_batch` — windows: lag -> gap flag -> running sum =
  session ordinal; pure codegen, one shuffle on the user key. This is the
  oracle-checkable form (q48).
- :func:`sessionize_stream` — ``applyInPandasWithState`` keeping per-user
  ``(last_ts, session_id)`` state across micro-batches. The streaming
  form exists for unbounded input where the batch window (which needs the
  whole user history in one sort) is impossible. State eviction for idle
  users would use a processing-time timeout in production; with
  ``availableNow`` triggers that timeout schedules extra timeout-handling
  batches, so the finite-input form runs ``NoTimeout``.

The equality of the two on the same finite input is asserted in tests —
the same batch==stream contract q35/q41 established for aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 30 * 60

STREAM_OUT_SCHEMA = "user_id bigint, session_id bigint, ts timestamp"
STATE_SCHEMA = "last_ts_us bigint, session_id bigint"


def sessionize_batch(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """(user_id, ts, ..., session_id): a new session starts whenever the
    gap to the previous event exceeds gap_sec. session_id is the 0-based
    per-user session ordinal."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / F.lit(1_000_000)
    new_session = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_id", (F.sum(new_session).over(running) - 1).cast("bigint")
    )


def _stream_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_ts_us, session_id = state.get if state.exists else (None, -1)
        out_ts, out_sid = [], []
        # a key's micro-batch data arrives as MULTIPLE Arrow chunks; they
        # must be concatenated and sorted as one sequence — sorting each
        # chunk independently assigns wrong session ids whenever a user's
        # events span chunks
        chunks = [pdf for pdf in pdfs if len(pdf)]
        all_ts = (
            pd.concat(chunks)["ts"].sort_values() if chunks else pd.Series([], dtype="datetime64[ns]")
        )
        for ts in all_ts:
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if last_ts_us is None or ts_us - last_ts_us > gap_us:
                session_id += 1
            last_ts_us = ts_us
            out_ts.append(ts)
            out_sid.append(session_id)
        state.update((last_ts_us, session_id))
        yield pd.DataFrame(
            {"user_id": user_id, "session_id": out_sid, "ts": out_ts}
        )

    return fn


def sessionize_stream(events_stream: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """applyInPandasWithState sessionizer over a (user_id, ts) stream.

    Within a micro-batch events are processed in timestamp order per user;
    cross-batch continuity lives in the (last_ts, session_id) state. Late
    events older than the state's last_ts break ordinal equivalence with
    the batch form — a watermark-delay dedicated state design handles
    that; out of scope here, matching the reference's no-watermark model
    (ST3).
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _stream_fn(gap_sec),
        outputStructType=STREAM_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
