"""Streaming dedup ingest: admit only novel documents to the corpus.

The capstone composition of the engine's streaming + dedup machinery:
each arriving micro-batch is near-dup-checked against the accumulated
corpus (cross-corpus MinHash-LSH join) and within itself (self-join), and
only novel documents are appended. This is the canonical LLM-data
ingestion loop — the corpus never accumulates near-duplicates, and the
check cost stays bounded because the corpus side's band table is
effectively an index (here recomputed per batch; on a table format it
would be persisted and appended).

Exactly-once: the checkpointed file source replays no batch twice; the
append of survivors is the only side effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedup import exact_dedup, minhash_lsh_join, minhash_lsh_pairs


def dedup_batch_against_corpus(
    batch: DataFrame, corpus: DataFrame | None, threshold: float
) -> DataFrame:
    """Novel documents of *batch*: near-dups of the corpus and intra-batch
    near-dups (keep min id) removed, exact dups removed first."""
    keepers = exact_dedup(batch).select(F.col("keeper_id").alias("doc_id"))
    batch = batch.join(F.broadcast(keepers), "doc_id", "left_semi")

    intra = minhash_lsh_pairs(batch, threshold)
    batch = batch.join(intra.select(F.col("id_b").alias("doc_id")), "doc_id", "left_anti")

    if corpus is not None and not corpus.isEmpty():
        cross = minhash_lsh_join(batch, corpus, threshold)
        batch = batch.join(cross.select(F.col("id_a").alias("doc_id")), "doc_id", "left_anti")
    return batch


def run_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    corpus_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
) -> None:
    """availableNow pass: each micro-batch of documents is deduped against
    itself and the current corpus, survivors appended to corpus_dir."""
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(source_dir)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        try:
            corpus = spark.read.parquet(corpus_dir)
        except Exception:
            corpus = None
        novel = dedup_batch_against_corpus(batch_df, corpus, threshold)
        novel.write.mode("append").parquet(corpus_dir)
        spark.catalog.clearCache()  # release band/shingle caches per batch

    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
