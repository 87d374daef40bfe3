"""Stateful streaming EMA: per-key ValueState-style fold across
micro-batches.

Per key (user), state holds ``(ema, n_events, last (ts, event_id))``;
every micro-batch folds its rows into the recurrence
``ema = alpha * x + (1 - alpha) * ema`` in (ts, event_id) order and
emits the running result. Because state carries the exact float across
batches and rows are folded in the same total order, the multi-batch
streaming result is BIT-IDENTICAL to a single-pass fold — which is what
lets the batch oracle check it.

That total order is a CONTRACT ON THE LANDING DIR (files must arrive in
(ts, event_id) order — the per-batch sort cannot reorder across batch
boundaries), and the fold ENFORCES it: state remembers the last folded
(ts, event_id) and a batch whose earliest row regresses fails loudly
instead of silently folding out of order and diverging from the oracle
(r7 review). Out-of-order landings need the watermarked-aggregation
path (windows.py) or a re-sort upstream, not this order-sensitive fold.

API note: Spark 4's ``transformWithStateInPandas`` (the arbitrary-state
successor API) is ENV-BLOCKED in this container — its worker imports
``google.protobuf`` (pyspark.sql.streaming.proto.StateMessage_pb2),
which is not installed and cannot be (no pip). The implementation
therefore uses ``applyInPandasWithState`` (same keyed-state semantics,
GroupState instead of ValueState); swapping to transformWithState on a
full deployment is a mechanical port of `_fold_batch`.

Scale: state is O(1) per key (two numbers); the shuffle keys on user_id
once per batch — the standard keyed-state layout that holds at any
stream width.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, ema double"
STATE_SCHEMA = "ema double, n bigint, last_us bigint, last_eid bigint"


def _make_fold(alpha: float):
    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        if state.exists:
            ema, n, last_us, last_eid = state.get
        else:
            ema, n, last_us, last_eid = None, 0, None, None
        first_us = int(pdf["ts"].iloc[0].value // 1000)
        first_eid = int(pdf["event_id"].iloc[0])
        if last_us is not None and (first_us, first_eid) <= (last_us, last_eid):
            raise ValueError(
                f"ema_stream: key {key[0]} received a batch starting at"
                f" (ts_us={first_us}, event_id={first_eid}) at or before the"
                f" last folded row (ts_us={last_us}, event_id={last_eid}) —"
                " the landing dir violated the in-order contract; the fold"
                " would silently diverge from the single-pass oracle"
            )
        for x in pdf["value"]:
            x = float(x)
            ema = x if ema is None else alpha * x + (1.0 - alpha) * ema
            n += 1
        state.update(
            (
                ema,
                n,
                int(pdf["ts"].iloc[-1].value // 1000),
                int(pdf["event_id"].iloc[-1]),
            )
        )
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ema": [ema]})

    return fold


def ema_stream(
    spark: SparkSession,
    src_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    alpha: float,
    shuffle_partitions: int | None = None,
) -> None:
    """Drain the landing dir with availableNow, appending per-batch
    running EMA rows to ``out_dir`` (one row per key per batch it appears
    in; the latest row per key is the stream's current answer).

    ``shuffle_partitions`` (scoped to the drain, restored after) sizes
    the keyed-state shuffle; per-key results are width-independent (the
    fold sees all of a key's rows whichever partition the key hashes
    to). CAVEAT (r13 A/B at sf1.0): unlike the q61/q65 stateful ops,
    this fold is PYTHON compute — per-row float recurrence — so the
    state width IS its parallelism; narrowing it to cut store-commit
    fixed costs measured 8.4 -> 15.7 s at sf1.0. Leave None (session
    width) unless the store commits are the measured wall."""
    sp_key = "spark.sql.shuffle.partitions"
    prior_sp = spark.conf.get(sp_key, "200")
    if shuffle_partitions is not None:
        spark.conf.set(sp_key, str(shuffle_partitions))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one landed file per micro-batch
        .parquet(src_dir)
    )
    try:
        q = (
            stream.groupBy("user_id")
            .applyInPandasWithState(
                _make_fold(alpha),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(sp_key, prior_sp)
