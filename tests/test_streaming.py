"""Streaming max-upsert: availableNow convergence + duplicate-delivery
idempotence (ST1-ST3)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.upsert import (
    max_upsert_stream,
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
        # compacted result is unchanged
        args["checkpoint_dir"] = f"{work}/ckpt2"
        max_upsert_stream(**args)
        second = {r.k: r.mx for r in read_upsert_state(spark, f"{work}/state", ["k"], "mx").collect()}
        assert second == batch
    finally:
        shutil.rmtree(work, ignore_errors=True)
