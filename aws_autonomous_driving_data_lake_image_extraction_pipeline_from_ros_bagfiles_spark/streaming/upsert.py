"""Idempotent max-upsert streaming sink with compaction + CDC reads
(ST1-ST3, K6 semantics; ROADMAP #5/#7).

The reference's arrival-driven pipeline (S3 event -> SQS -> Lambda ->
DynamoDB conditional-max update, process-queue-sync.py:85-97) maps to:

- ``readStream`` file source = the event queue (checkpoint = queue offset)
- ``foreachBatch`` writing *partial max aggregates* = the consumer Lambda
- a compacting read = the conditional-max upsert

Layout (no Delta/Iceberg jar in this environment; on a cluster with one,
``batch_fn`` becomes ``MERGE WHEN MATCHED AND s.v > t.v THEN UPDATE``):

    state_dir/
      partials/batch_id=N/   one partition per micro-batch, written with
                             dynamic partition overwrite -> a replayed
                             batch OVERWRITES its own partition, so even
                             non-idempotent merges would be replay-safe
                             (the r1 ADVICE at-least-once fix, applied
                             here as well as in dedup_ingest)
      compacted/v=E/         compact generations; each carries per-key
                             (value max, last_batch) so CDC survives
                             partial-file deletion

Idempotence argument (ST2): max is commutative, associative and
idempotent, so any interleaving of appends, replays, compactions, and
crashed compactions (worst case: partials coexist with the compacted
generation that already includes them) collapses to the same per-key
max. Compaction bounds the read cost: without it the partial history
grows with every batch (the r1 VERDICT "compaction cost grows with
history" gap); with it the state is O(|keys|) again.

CDC-style incremental read: every partial row carries its ``batch_id``;
compaction preserves per-key ``last_batch`` = the last batch that
touched the key. ``read_upsert_changes(since_batch)`` therefore answers
"which keys changed since batch B, and what is their value now" without
replaying history — the consumer-side analog of a Delta CDF read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _sources(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Union of live partials and all compact generations, normalized to
    (key..., partial_max, batch_id). Overlap between a crashed compact's
    inputs and its output is harmless under max-merge."""
    parts = []
    pdir, cdir = os.path.join(state_dir, "partials"), os.path.join(state_dir, "compacted")
    if os.path.isdir(pdir) and any(e.startswith("batch_id=") for e in os.listdir(pdir)):
        # partition-dir inference types batch_id as int; normalize to bigint
        parts.append(
            spark.read.parquet(pdir).withColumn("batch_id", F.col("batch_id").cast("bigint"))
        )
    if os.path.isdir(cdir) and any(e.startswith("v=") for e in os.listdir(cdir)):
        parts.append(
            spark.read.parquet(cdir).drop("v").withColumnRenamed("last_batch", "batch_id")
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def max_upsert_stream(
    spark: SparkSession,
    source_path: str,
    schema: StructType,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_col: str,
) -> None:
    """Run an availableNow streaming pass: per micro-batch, write the
    batch's per-key max partials under its own ``batch_id=`` partition
    (overwrite -> replay-idempotent); checkpointed so a restart resumes
    at the unprocessed remainder."""
    stream = spark.readStream.schema(schema).parquet(source_path)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(*key_cols)
            .agg(F.max(value_col).alias("partial_max"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(state_dir, "partials"))
        )

    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_upsert_state(
    spark: SparkSession, state_dir: str, key_cols: list[str], value_alias: str
) -> DataFrame:
    """Compact-on-read: final per-key max over partials + generations —
    the read side of the emulated MERGE."""
    src = _sources(spark, state_dir)
    if src is None:
        raise FileNotFoundError(f"no upsert state under {state_dir}")
    return src.groupBy(*key_cols).agg(F.max("partial_max").alias(value_alias))


def read_upsert_changes(
    spark: SparkSession,
    state_dir: str,
    key_cols: list[str],
    value_alias: str,
    since_batch: int,
) -> DataFrame:
    """CDC read: keys whose value changed after ``since_batch``, with
    their current max and ``last_batch`` (the most recent batch that
    raised the key's max)."""
    src = _sources(spark, state_dir)
    if src is None:
        raise FileNotFoundError(f"no upsert state under {state_dir}")
    w_key = src.groupBy(*key_cols).agg(
        F.max("partial_max").alias(value_alias),
        F.max_by("batch_id", F.struct("partial_max", "batch_id")).alias("last_batch"),
    )
    return w_key.filter(F.col("last_batch") > since_batch)


def compact_upsert_state(spark: SparkSession, state_dir: str, key_cols: list[str]) -> int:
    """Explicit compaction pass: fold current partials + older generations
    into one new generation (per-key max + last_batch), then drop the
    inputs. Crash-safe without a table format: the new generation is
    fully written before any input is deleted, and a crash in between
    leaves overlapping state that the max-merge reads collapse correctly.
    Returns the new generation number."""
    import shutil

    src = _sources(spark, state_dir)
    if src is None:
        raise FileNotFoundError(f"no upsert state under {state_dir}")
    cdir = os.path.join(state_dir, "compacted")
    gens = (
        [int(e[2:]) for e in os.listdir(cdir) if e.startswith("v=")]
        if os.path.isdir(cdir)
        else []
    )
    new_gen = (max(gens) + 1) if gens else 0
    pdir = os.path.join(state_dir, "partials")
    included = (
        [e for e in os.listdir(pdir) if e.startswith("batch_id=")]
        if os.path.isdir(pdir)
        else []
    )
    compacted = src.groupBy(*key_cols).agg(
        F.max("partial_max").alias("partial_max"),
        F.max_by("batch_id", F.struct("partial_max", "batch_id")).alias("last_batch"),
    )
    compacted.write.mode("overwrite").parquet(os.path.join(cdir, f"v={new_gen}"))
    # inputs are now redundant; delete AFTER the generation is durable
    for e in included:
        shutil.rmtree(os.path.join(pdir, e), ignore_errors=True)
    for g in gens:
        shutil.rmtree(os.path.join(cdir, f"v={g}"), ignore_errors=True)
    return new_gen
