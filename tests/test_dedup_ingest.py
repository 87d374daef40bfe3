"""Streaming dedup ingest: the corpus admits each document family once,
across exact dups, intra-batch near-dups, cross-batch near-dups, and
cross-batch exact dups of short (sub-shingle-width) documents; batch
replays (at-least-once delivery) are idempotent."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.streaming.dedup_ingest import (
    dedup_batch_against_corpus,
    read_corpus,
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
        # batch 1: original + exact dup + near-dup + a distinct doc + a
        # SHORT doc (2 tokens -> empty shingle set, invisible to LSH)
        _land(spark, f"{src}/b1.parquet", [
            (1, BASE),
            (2, BASE),                               # exact dup of 1
            (3, BASE.replace("kappa", "lambda")),    # near-dup of 1
            (4, "zz yy xx ww vv uu tt ss rr qq"),    # novel
            (5, "hi yo"),                            # novel, short
        ])
        import time

        time.sleep(1.1)
        # batch 2: near-dup of batch-1 corpus doc + genuinely new doc +
        # exact dup of the short corpus doc (only the md5 fingerprint
        # anti-join tier can reject it — LSH cannot see it).
        # (Variant chosen to land in LSH's deterministic hit zone —
        # banded LSH has bounded recall by design; candidates are then
        # exact-verified, so misses only lose recall, never precision.)
        _land(spark, f"{src}/b2.parquet", [
            (10, BASE.replace("iota", "omega")),     # near-dup of corpus doc 1
            (11, "one two three four five six seven eight nine ten"),
            (12, "hi yo"),                           # exact dup of short corpus doc 5
        ])
        schema = spark.read.parquet(f"{src}/b1.parquet").schema
        run_dedup_ingest(
            spark, src, schema,
            corpus_dir=f"{work}/corpus", checkpoint_dir=f"{work}/ckpt",
            threshold=0.5,
        )
        corpus_df = read_corpus(spark, f"{work}/corpus")
        corpus = sorted(r.doc_id for r in corpus_df.collect())
        # survivors: 1 (family canonical), 4, 5, 11 — 2/3 deduped
        # in-batch, 10 near-dup vs corpus, 12 exact-dup of short doc 5
        assert corpus == [1, 4, 5, 11]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_reemitted_doc_id_checked_by_content(spark):
    """A source that re-emits a CORPUS doc_id in a later batch must still
    be near-dup-checked by content (the verify keys parity-tag the
    sides): the edited near-dup is dropped, a same-id genuinely-new text
    is admitted, and the collision must not corrupt jaccard for other
    candidates sharing the batch."""
    work = tempfile.mkdtemp(prefix="t_collide_")
    try:
        corpus_dir = f"{work}/corpus"
        b0 = spark.createDataFrame(
            [(42, BASE), (43, "cc dd ee ff gg hh ii jj kk ll")],
            "doc_id bigint, text string",
        )
        # batch 1: id 42 re-emitted with near-dup text (must drop);
        # id 43 re-emitted with unrelated novel text (must admit);
        # id 60 near-dup of corpus 43 (must drop — its jaccard would be
        # deflated if 43's two texts merged under one verify key)
        b1 = spark.createDataFrame(
            [
                (42, BASE.replace("kappa", "lambda")),
                (43, "one two three four five six seven eight nine ten"),
                (60, "c0 dd ee ff gg hh ii jj kk ll"),
            ],
            "doc_id bigint, text string",
        )

        def deliver(batch_df, batch_id):
            corpus = read_corpus(spark, corpus_dir, exclude_batch=batch_id)
            novel = dedup_batch_against_corpus(batch_df, corpus, 0.5)
            novel.write.mode("overwrite").parquet(f"{corpus_dir}/batch={batch_id}")

        deliver(b0, 0)
        deliver(b1, 1)
        survivors = sorted(
            (r.doc_id, r.text[:2]) for r in read_corpus(spark, corpus_dir).collect()
        )
        assert survivors == [(42, "al"), (43, "cc"), (43, "on")]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_replayed_batch_is_idempotent(spark):
    """At-least-once: re-running a batch with the same batch_id (crash
    between output write and checkpoint commit) must neither duplicate its
    documents nor lose them by deduping against its own prior output."""
    work = tempfile.mkdtemp(prefix="t_replay_")
    try:
        corpus_dir = f"{work}/corpus"
        b0 = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
        b1 = spark.createDataFrame(
            [(7, "one two three four five six seven eight nine ten")],
            "doc_id bigint, text string",
        )

        def deliver(batch_df, batch_id):
            corpus = read_corpus(spark, corpus_dir, exclude_batch=batch_id)
            novel = dedup_batch_against_corpus(batch_df, corpus, 0.5)
            novel.write.mode("overwrite").parquet(f"{corpus_dir}/batch={batch_id}")

        deliver(b0, 0)
        deliver(b1, 1)
        deliver(b1, 1)  # replay: same batch_id, corpus already holds doc 7
        corpus = sorted(r.doc_id for r in read_corpus(spark, corpus_dir).collect())
        assert corpus == [1, 7]
    finally:
        shutil.rmtree(work, ignore_errors=True)
