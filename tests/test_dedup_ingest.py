"""Streaming dedup ingest: the corpus admits each document family once,
across exact dups, intra-batch near-dups, and cross-batch near-dups."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.dedup_ingest import (
    run_dedup_ingest,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _land(spark, path, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    stage = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], path)
    shutil.rmtree(stage, ignore_errors=True)


def test_streaming_dedup_ingest(spark):
    work = tempfile.mkdtemp(prefix="t_ingest_")
    try:
        src = f"{work}/in"
        os.makedirs(src)
        # batch 1: original + exact dup + near-dup + a distinct doc
        _land(spark, f"{src}/b1.parquet", [
            (1, BASE),
            (2, BASE),                               # exact dup of 1
            (3, BASE.replace("kappa", "lambda")),    # near-dup of 1
            (4, "zz yy xx ww vv uu tt ss rr qq"),    # novel
        ])
        import time

        time.sleep(1.1)
        # batch 2: near-dup of batch-1 corpus doc + genuinely new doc.
        # (Variant chosen to land in LSH's deterministic hit zone —
        # banded LSH has bounded recall by design; candidates are then
        # exact-verified, so misses only lose recall, never precision.)
        _land(spark, f"{src}/b2.parquet", [
            (10, BASE.replace("iota", "omega")),     # near-dup of corpus doc 1
            (11, "one two three four five six seven eight nine ten"),
        ])
        schema = spark.read.parquet(f"{src}/b1.parquet").schema
        run_dedup_ingest(
            spark, src, schema,
            corpus_dir=f"{work}/corpus", checkpoint_dir=f"{work}/ckpt",
            threshold=0.5,
        )
        corpus = sorted(r.doc_id for r in spark.read.parquet(f"{work}/corpus").collect())
        # survivors: 1 (family canonical), 4, 11 — 2/3 deduped in-batch,
        # 10 deduped against the corpus cross-batch
        assert corpus == [1, 4, 11]
    finally:
        shutil.rmtree(work, ignore_errors=True)
