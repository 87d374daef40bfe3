"""Streaming pipeline monitor (K7/ST7): listener captures lifecycle +
progress and exposes them as a queryable audit table."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.monitor import (
    PipelineMonitor,
    audit_frame,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.upsert import (
    max_upsert_stream,
)


def test_monitor_audit_table(spark):
    mon = PipelineMonitor()
    spark.streams.addListener(mon)
    work = tempfile.mkdtemp(prefix="t_mon_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        df = spark.range(0, 500).select(
            (F.col("id") % 5).alias("k"), F.col("id").cast("double").alias("v")
        )
        df.write.parquet(f"{src}/b1")
        schema = spark.read.parquet(f"{src}/b1").schema
        max_upsert_stream(
            spark, f"{src}/b1", schema,
            state_dir=f"{work}/state", checkpoint_dir=f"{work}/ckpt",
            key_cols=["k"], value_col="v",
        )
        # listener delivery is async — wait for the terminal event
        import time

        for _ in range(100):
            if any(r[1] == "terminated" for r in mon.records):
                break
            time.sleep(0.1)
        audit = audit_frame(spark, mon)
        by_event = {r.event: r for r in audit.collect()}
        assert "started" in by_event and "terminated" in by_event
        assert by_event["terminated"].status == "Complete"
        total_rows = (
            audit.filter(F.col("event") == "progress")
            .agg(F.sum("num_input_rows").alias("n"))
            .first()
            .n
        )
        assert total_rows == 500
    finally:
        spark.streams.removeListener(mon)
        shutil.rmtree(work, ignore_errors=True)
