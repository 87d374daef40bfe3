"""Idempotent max-upsert streaming sink (ST1-ST3, K6 semantics).

The reference's arrival-driven pipeline (S3 event -> SQS -> Lambda ->
DynamoDB conditional-max update, process-queue-sync.py:85-97) maps to:

- ``readStream`` file source = the event queue (checkpoint = queue offset)
- ``foreachBatch`` writing *partial max aggregates* = the consumer Lambda
- a compacting read = the conditional-max upsert

Idempotence argument (ST2): max is commutative, associative and
idempotent, so duplicate/re-delivered batches can only re-append partials
that collapse to the same final max — the exact property that made the
reference's conditional update safe under SQS at-least-once delivery.
Without Delta in this environment, MERGE is emulated as append-partials +
compact-on-read; on a cluster with Delta/Iceberg, ``batch_fn`` becomes a
``MERGE WHEN MATCHED AND s.v > t.v THEN UPDATE`` (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def max_upsert_stream(
    spark: SparkSession,
    source_path: str,
    schema: StructType,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_col: str,
) -> None:
    """Run an availableNow streaming pass: per micro-batch, append the
    batch's per-key max partials to ``state_dir``; checkpointed so a
    restart resumes at the unprocessed remainder."""
    stream = spark.readStream.schema(schema).parquet(source_path)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(*key_cols)
            .agg(F.max(value_col).alias("partial_max"))
            .write.mode("append")
            .parquet(state_dir)
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
    """Compact the appended partials to the final per-key max — the read
    side of the emulated MERGE."""
    return (
        spark.read.parquet(state_dir)
        .groupBy(*key_cols)
        .agg(F.max("partial_max").alias(value_alias))
    )
