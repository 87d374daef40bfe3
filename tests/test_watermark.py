"""Watermarked late-data semantics (ST3, ROADMAP item 2).

The reference has no watermark concept — late label arrivals are absorbed
by upsert semantics (process-queue-sync.py:85-97). Real event-time
pipelines need bounded state: a watermark declares how late data may be,
the engine drops older rows and finalizes windows.

This test drives a two-micro-batch stream (maxFilesPerTrigger=1) so the
watermark actually advances between batches, then asserts:

- a row later than the watermark is DROPPED (its window never updates),
- a late-but-within-watermark row IS aggregated,
- append mode emits only finalized windows (watermark past window end).
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    """Land a single parquet FILE at `path` (the streaming file source
    does not recurse into the directory a df.write.parquet would make)."""
    import glob

    df = spark.createDataFrame(rows, "user_id bigint, sec bigint").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    stage = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.move(part, path)
    shutil.rmtree(stage, ignore_errors=True)


def test_windowed_agg_with_watermark_drops_too_late_rows(spark):
    """Watermark guarantees under the engine's run-per-arrival pattern
    (two availableNow runs over one checkpoint — see streaming/windows.py
    for why the late filter is enforced from the CHECKPOINTED watermark):
    a window already finalized in run 1 is emitted exactly once, and a
    too-late row arriving in run 2 is provably dropped
    (numRowsDroppedByWatermark) rather than resurrecting the window."""
    work = tempfile.mkdtemp(prefix="t_wm_")
    import time

    base = 1_700_000_000
    w1 = base - (base % 600)  # 10-min windows align to the epoch
    try:
        src = f"{work}/in"
        os.makedirs(src)

        schema = None

        def drain():
            # parquet sink, not memory: only a durable sink supports
            # checkpoint recovery, which the run-per-arrival pattern needs
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            agg = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "10 minutes").alias("w"))
                .agg(F.count("*").alias("n"))
                .select(F.col("w.start").cast("long").alias("start_sec"), "n")
            )
            q = (
                agg.writeStream.format("parquet")
                .option("path", f"{work}/out")
                .option("checkpointLocation", f"{work}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return sum(
                (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
                for p in q.recentProgress
                if p["stateOperators"]
            )

        # run 1: two rows in W1, a +50m row advancing the watermark to
        # +20m, then a +80m row -> final committed wm = +50m; W1 (end
        # ~ +10m) finalizes and is emitted during this run
        _write_batch(spark, f"{src}/b1.parquet", [(1, base + 60), (1, base + 120), (1, base + 50 * 60)])
        time.sleep(1.1)
        _write_batch(spark, f"{src}/b2.parquet", [(1, base + 80 * 60)])
        schema = spark.read.parquet(f"{src}/b1.parquet").schema
        dropped1 = drain()
        rows1 = spark.read.parquet(f"{work}/out").collect()
        assert {r.start_sec: r.n for r in rows1}.get(w1) == 2  # W1 finalized in run 1

        # run 2: a very late row aimed at the already-evicted W1 -> must
        # be DROPPED by the checkpointed watermark (+50m), not resurrect W1
        _write_batch(spark, f"{src}/b3.parquet", [(1, base + 30)])
        dropped2 = drain()
        rows = spark.read.parquet(f"{work}/out").collect()
        out = {r.start_sec: r.n for r in rows}

        assert dropped1 == 0 and dropped2 >= 1  # the drop is observable
        # W1 emitted exactly once with only its two original rows; the b3
        # late row neither re-emitted nor mutated it
        assert out.get(w1) == 2
        assert len([r for r in rows if r.start_sec == w1]) == 1
        # unfinalized later windows (+50m/+80m regions) not emitted yet
        assert all(s < base + 40 * 60 for s in out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_drop_duplicates_within_watermark(spark):
    work = tempfile.mkdtemp(prefix="t_wmd_")
    base = 1_700_000_000
    try:
        src = f"{work}/in"
        os.makedirs(src)
        # same event id re-delivered within the watermark window -> one
        # survivor; a fresh id -> kept
        _write_batch(spark, f"{src}/b1.parquet", [(7, base), (7, base), (8, base + 60)])
        schema = spark.read.parquet(f"{src}/b1.parquet").schema
        stream = spark.readStream.schema(schema).parquet(src)
        dedup = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["user_id"]
        )
        q = (
            dedup.writeStream.format("memory")
            .queryName("wmd_out")
            .option("checkpointLocation", f"{work}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        users = sorted(r.user_id for r in spark.table("wmd_out").collect())
        assert users == [7, 8]
    finally:
        shutil.rmtree(work, ignore_errors=True)
