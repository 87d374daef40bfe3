"""Streaming max-upsert: availableNow convergence + duplicate-delivery
idempotence (ST1-ST3)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.upsert import (
    compact_upsert_state,
    max_upsert_stream,
    read_upsert_changes,
    read_upsert_state,
)


def test_stream_equals_batch_and_duplicates_are_noops(spark):
    work = tempfile.mkdtemp(prefix="t_stream_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        df = spark.range(0, 1000).select(
            (F.col("id") % 7).alias("k"),
            (F.col("id") % 13).cast("double").alias("v"),
        )
        df.write.parquet(f"{src}/batch1")
        schema = spark.read.parquet(f"{src}/batch1").schema

        args = dict(
            spark=spark, source_path=f"{src}/batch1", schema=schema,
            state_dir=f"{work}/state", checkpoint_dir=f"{work}/ckpt",
            key_cols=["k"], value_col="v",
        )
        max_upsert_stream(**args)
        first = {r.k: r.mx for r in read_upsert_state(spark, f"{work}/state", ["k"], "mx").collect()}
        batch = {r.k: r.mx for r in df.groupBy("k").agg(F.max("v").alias("mx")).collect()}
        assert first == batch

        # duplicate delivery: re-run with a FRESH checkpoint (forces
        # reprocessing of the same files) -> state gains rows but the
        # compacted result is unchanged. A checkpoint change against live
        # state must be refused by DEFAULT (batch-id collision with
        # UNRELATED data would silently overwrite partials) and requires
        # the explicit same-payload opt-in.
        args["checkpoint_dir"] = f"{work}/ckpt2"
        import pytest as _pytest

        with _pytest.raises(ValueError, match="different checkpoint"):
            max_upsert_stream(**args)
        max_upsert_stream(**args, allow_checkpoint_change=True)
        second = {r.k: r.mx for r in read_upsert_state(spark, f"{work}/state", ["k"], "mx").collect()}
        assert second == batch
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_compaction_and_cdc_read(spark):
    work = tempfile.mkdtemp(prefix="t_compact_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        schema = "k bigint, v double"
        # batch 0: keys 0..4 at v=10; batch 1: key 2 raised, key 9 new
        spark.createDataFrame([(k, 10.0) for k in range(5)], schema).write.parquet(f"{src}/b0")
        args = dict(
            spark=spark, schema=spark.read.parquet(f"{src}/b0").schema,
            state_dir=f"{work}/state", checkpoint_dir=f"{work}/ckpt",
            key_cols=["k"], value_col="v",
        )
        max_upsert_stream(source_path=f"{src}/b0", **args)
        spark.createDataFrame([(2, 99.0), (9, 1.0), (0, 5.0)], schema).write.mode("append").parquet(f"{src}/b0")
        max_upsert_stream(source_path=f"{src}/b0", **args)

        want = {0: 10.0, 1: 10.0, 2: 99.0, 3: 10.0, 4: 10.0, 9: 1.0}
        got = {r.k: r.mx for r in read_upsert_state(spark, f"{work}/state", ["k"], "mx").collect()}
        assert got == want

        # CDC: since batch 0 -> only keys whose max changed in batch 1.
        # Key 0's batch-1 value (5.0) did NOT raise its max -> not a change.
        changes = {
            r.k: (r.mx, r.last_batch)
            for r in read_upsert_changes(spark, f"{work}/state", ["k"], "mx", since_batch=0).collect()
        }
        assert changes == {2: (99.0, 1), 9: (1.0, 1)}

        # explicit compaction: same state, partials gone, one generation
        gen = compact_upsert_state(spark, f"{work}/state", ["k"])
        assert gen == 0
        pdir = f"{work}/state/partials"
        assert not os.path.isdir(pdir) or not any(
            e.startswith("batch_id=") for e in os.listdir(pdir)
        )
        after = {r.k: r.mx for r in read_upsert_state(spark, f"{work}/state", ["k"], "mx").collect()}
        assert after == want
        # CDC still answerable post-compaction (last_batch preserved)
        changes2 = {
            r.k: (r.mx, r.last_batch)
            for r in read_upsert_changes(spark, f"{work}/state", ["k"], "mx", since_batch=0).collect()
        }
        assert changes2 == {2: (99.0, 1), 9: (1.0, 1)}

        # a second compaction folds the first generation into the next
        spark.createDataFrame([(3, 77.0)], schema).write.mode("append").parquet(f"{src}/b0")
        max_upsert_stream(source_path=f"{src}/b0", **args)
        assert compact_upsert_state(spark, f"{work}/state", ["k"]) == 1
        final = {r.k: r.mx for r in read_upsert_state(spark, f"{work}/state", ["k"], "mx").collect()}
        assert final == {**want, 3: 77.0}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_manifest_sink_replay_and_orphan_invisibility(spark, tmp_path):
    """Replayed commit for the same batchId OVERWRITES its manifest (files
    listed exactly once) and staged-uncommitted files are invisible."""
    from pyspark.sql.types import StructType, StructField, LongType

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.manifest_sink import (
        ManifestStreamWriter,
        read_committed,
    )

    import pyarrow as pa

    schema = StructType([StructField("x", LongType())])
    w = ManifestStreamWriter({"path": str(tmp_path)}, schema)
    # the writer is a DataSourceStreamArrowWriter: write() receives
    # pyarrow RecordBatches (what Spark's write worker feeds it)
    rb = pa.RecordBatch.from_pylist([{"x": 1}, {"x": 2}])
    m1 = w.write(iter([rb]))
    w.commit([m1], batchId=0)
    # at-least-once replay of batch 0: a fresh attempt re-stages and
    # re-commits — the manifest must be replaced, not appended
    m1b = w.write(iter([rb]))
    w.commit([m1b], batchId=0)
    # an aborted/crashed attempt leaves a staged orphan
    orphan = w.write(iter([pa.RecordBatch.from_pylist([{"x": 99}])]))
    df = read_committed(spark, str(tmp_path), "x long")
    assert sorted(r.x for r in df.collect()) == [1, 2]
    w.abort([orphan], batchId=1)
    import os

    assert not os.path.exists(orphan.path)


def test_q41_partials_replay_idempotent(spark, tmp_path):
    """q41's additive partials land under batch_id= with dynamic overwrite
    (upsert.py:87-96 pattern). foreachBatch is at-least-once: re-running
    the SAME batch function with the SAME batch_id must overwrite that
    batch's partition, not append a second copy — the compacted SUM is
    unchanged. (Plain mode('append') double-counts here; VERDICT r2/r3.)"""
    events = (
        spark.read.option("nanosAsLong", "true")
        .parquet("/root/testdata/sf0.001/events.parquet")
        .limit(200)
        .cache()
    )
    state = str(tmp_path / "state")

    def batch_fn(batch_df, batch_id):
        (
            batch_df.groupBy("event_type")
            .agg(F.count("*").alias("partial_n"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state)
        )

    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    batch_fn(half1, 0)
    batch_fn(half2, 1)

    def compacted():
        return {
            r.event_type: r.n
            for r in spark.read.parquet(state)
            .groupBy("event_type")
            .agg(F.sum("partial_n").alias("n"))
            .collect()
        }

    want = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert compacted() == want

    batch_fn(half2, 1)  # at-least-once replay of the same micro-batch
    assert compacted() == want, "replayed batch_id must not double-count"
    events.unpersist()


def test_q156_state_carries_across_batches_exactly(spark, tmp_path):
    # the two-micro-batch streamed EMA must be BIT-identical to a single
    # in-memory fold over the same rows in the same total order — state
    # carries the exact float between batches
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sessions import (
        Q156_ALPHA,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.ema_state import (
        ema_stream,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.tables import (
        load,
    )

    events = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "value"
    )
    src = f"{tmp_path}/in"
    os.makedirs(src)
    for i, cond in enumerate(
        [F.to_date("ts") < "2023-01-16", F.to_date("ts") >= "2023-01-16"]
    ):
        stage = f"{tmp_path}/b{i}.stage"
        events.filter(cond).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/b{i}.parquet")
    ema_stream(
        spark, src, events.schema,
        out_dir=f"{tmp_path}/out", checkpoint_dir=f"{tmp_path}/ckpt",
        alpha=Q156_ALPHA,
    )
    out = spark.read.parquet(f"{tmp_path}/out").collect()
    latest = {}
    for r in out:
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.ema)

    rows = sorted(
        events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    expect = {}
    for r in rows:
        ema, n = expect.get(r.user_id, (None, 0))
        x = float(r.value)
        ema = x if ema is None else Q156_ALPHA * x + (1.0 - Q156_ALPHA) * ema
        expect[r.user_id] = (ema, n + 1)
    assert set(latest) == set(expect)
    for uid, (n, ema) in latest.items():
        e_ema, e_n = expect[uid]
        assert n == e_n
        assert ema == e_ema  # bit-identical, not approx


def test_cdc_equal_value_redelivery_does_not_advance_cursor(spark, tmp_path):
    """last_batch must be the FIRST batch to reach the key's max: a later
    batch re-delivering an EQUAL value did not raise it (the DynamoDB
    conditional s.v > t.v would not fire) and must not re-surface the key
    through read_upsert_changes (r7 review)."""
    import os

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.upsert import (
        compact_upsert_state,
        read_upsert_changes,
    )

    state = str(tmp_path / "state")
    pdir = os.path.join(state, "partials")
    # batch 2 raises k to 10.0; batch 5 re-delivers 10.0; batch 6 raises j
    for bid, rows in ((2, [("k", 10.0)]), (5, [("k", 10.0)]), (6, [("j", 3.0)])):
        spark.createDataFrame(rows, "k string, partial_max double").write.mode(
            "overwrite"
        ).parquet(os.path.join(pdir, f"batch_id={bid}"))
    changed = {
        r["k"]: r["last_batch"]
        for r in read_upsert_changes(spark, state, ["k"], "mx", since_batch=3).collect()
    }
    assert changed == {"j": 6}, changed  # k's max was set at batch 2, not 5
    # compaction bakes the same raise-only cursor into the generation
    compact_upsert_state(spark, state, ["k"])
    changed2 = {
        r["k"]: r["last_batch"]
        for r in read_upsert_changes(spark, state, ["k"], "mx", since_batch=3).collect()
    }
    assert changed2 == {"j": 6}, changed2


def test_manifest_sink_binary_roundtrip(spark, tmp_path):
    """Binary columns must survive the manifest sink byte-exact: the old
    default=str serializer wrote bytearray REPR strings, which a
    BinaryType read returned as garbage with no error (r7 review). Spark's
    JSON reader decodes BinaryType from base64 — the writer now emits it."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.manifest_sink import (
        ManifestStreamWriter,
        read_committed,
    )

    import pyarrow as pa

    schema = StructType(
        [StructField("k", LongType()), StructField("payload", BinaryType())]
    )
    w = ManifestStreamWriter({"path": str(tmp_path)}, schema)
    blob = bytes(range(256))
    rb = pa.record_batch(
        [pa.array([1, 2], pa.int64()),
         pa.array([bytes(bytearray(blob)), b"\x89PNG\r\n\x1a\n"], pa.binary())],
        names=["k", "payload"],
    )
    m = w.write(iter([rb]))
    w.commit([m], batchId=0)
    got = {
        r["k"]: bytes(r["payload"])
        for r in read_committed(spark, str(tmp_path), "k long, payload binary").collect()
    }
    assert got == {1: blob, 2: b"\x89PNG\r\n\x1a\n"}


def test_stream_plan_audit_capture(spark):
    """VERDICT r10 #3: a streaming drain must expose its micro-batch
    executed plan to the plan audit — the registry-level explain of
    q61/q92-class queries sees only the final static frame, so without
    this hook a stateful streaming query audits as an all-zeros row.
    Pin: with an audit sink installed, the q92 drain (stateful
    dropDuplicatesWithinWatermark) captures a plan that shows the
    state-store dedup operator; with no sink, the hook is a no-op."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans import (
        registry,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.staging import (
        stage_single_parquet,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.windows import (
        dedup_within_watermark,
    )

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        # raw parquet infers TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        .limit(50)
    )
    work = tempfile.mkdtemp(prefix="stream_audit_")
    captured: list = []
    try:
        src = f"{work}/in"
        os.makedirs(src)
        stage_single_parquet(events, f"{src}/d0.parquet", mtime=int(time.time()) - 30)
        registry.set_audit_sink(captured)
        try:
            dedup_within_watermark(
                spark,
                src,
                events.schema,
                out_dir=f"{work}/out",
                checkpoint_dir=f"{work}/ckpt",
                keys=["event_id"],
            )
        finally:
            registry.set_audit_sink(None)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    tags = [t for t, _ in captured]
    assert "windows:dedup_drain" in tags, tags
    plan = dict(captured)["windows:dedup_drain"]
    # the executed micro-batch plan must show the stateful dedup
    # operator and its state-store partitioning — exactly what the
    # registry-level explain can never see (the last captured batch is
    # the empty watermark-finalization one; the operator shape is the
    # same in every batch of the drain)
    assert "DeduplicateWithinWatermark" in plan, plan[:2000]
    assert "state info" in plan and "EventTimeWatermark" in plan, plan[:2000]
