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


def _list_partials(state_dir: str) -> list[str]:
    pdir = os.path.join(state_dir, "partials")
    if not os.path.isdir(pdir):
        return []
    return sorted(e for e in os.listdir(pdir) if e.startswith("batch_id="))


def _list_gens(state_dir: str) -> list[int]:
    cdir = os.path.join(state_dir, "compacted")
    if not os.path.isdir(cdir):
        return []
    return sorted(int(e[2:]) for e in os.listdir(cdir) if e.startswith("v="))


def _sources_for(
    spark: SparkSession, state_dir: str, partials: list[str], gens: list[int]
) -> DataFrame | None:
    """Union of EXACTLY the named partial partitions and compact
    generations, normalized to (key..., partial_max, batch_id). Reading
    a fixed snapshot (not whole directories) is what makes compaction
    safe against concurrent writers — see compact_upsert_state. Overlap
    between a crashed compact's inputs and its output is harmless under
    max-merge."""
    parts = []
    pdir, cdir = os.path.join(state_dir, "partials"), os.path.join(state_dir, "compacted")
    if partials:
        # basePath keeps batch_id as a partition column; inference types
        # it int, normalize to bigint
        parts.append(
            spark.read.option("basePath", pdir)
            .parquet(*[os.path.join(pdir, e) for e in partials])
            .withColumn("batch_id", F.col("batch_id").cast("bigint"))
        )
    if gens:
        # leaf-dir reads carry no v partition column; rows already hold
        # (key..., partial_max, last_batch)
        parts.append(
            spark.read.parquet(*[os.path.join(cdir, f"v={g}") for g in gens])
            .withColumnRenamed("last_batch", "batch_id")
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sources(spark: SparkSession, state_dir: str) -> DataFrame | None:
    return _sources_for(
        spark, state_dir, _list_partials(state_dir), _list_gens(state_dir)
    )


def _last_raising_batch():
    """``last_batch`` = the FIRST batch to reach the key's current max:
    among max-value rows, the SMALLEST batch_id. A later batch
    re-delivering an EQUAL value did not raise the max and must not
    advance the CDC cursor (the DynamoDB conditional ``s.v > t.v`` would
    not fire, hence no change event) — r7 review; the previous
    (value, batch_id) tie-break reported unchanged keys as changed.
    Associative under re-merge (argmax by (value, -batch)), so compacted
    generations stay consistent with partial replays."""
    return F.max_by(
        "batch_id", F.struct(F.col("partial_max"), (-F.col("batch_id")).alias("nb"))
    ).alias("last_batch")


def max_upsert_stream(
    spark: SparkSession,
    source_path: str,
    schema: StructType,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_col: str,
    allow_checkpoint_change: bool = False,
) -> None:
    """Run an availableNow streaming pass: per micro-batch, write the
    batch's per-key max partials under its own ``batch_id=`` partition
    (overwrite -> replay-idempotent); checkpointed so a restart resumes
    at the unprocessed remainder.

    The replay-safety argument holds only for ONE checkpoint lineage: a
    fresh checkpoint restarts batch ids at 0, and dynamic partition
    overwrite would then silently replace the old lineage's
    batch_id=0..N partials with UNRELATED data (r7 review — the classic
    lost-checkpoint ops event). A marker file pins the state dir to its
    checkpoint; a mismatch with live state refuses loudly unless the
    caller passes ``allow_checkpoint_change=True`` — the documented
    escape for the one safe case: redelivering the SAME source payload
    (at-least-once duplicate delivery, a no-op under max-merge).
    """
    marker = os.path.join(state_dir, "_stream_checkpoint.txt")
    cp = os.path.abspath(checkpoint_dir)
    if not allow_checkpoint_change:
        if os.path.exists(marker):
            prior = open(marker).read().strip()
            if prior != cp and (_list_partials(state_dir) or _list_gens(state_dir)):
                raise ValueError(
                    f"state_dir {state_dir} holds state written under checkpoint"
                    f" {prior}; a different checkpoint ({cp}) would restart"
                    " batch ids at 0 and silently overwrite those partials —"
                    " compact and clear the state, reuse the original"
                    " checkpoint, or pass allow_checkpoint_change=True if this"
                    " is a same-payload redelivery"
                )
        elif _list_partials(state_dir) or _list_gens(state_dir):
            # Pre-marker state dir (upgraded layout) with live partials but
            # no recorded lineage: adopting ANY checkpoint here risks the
            # exact batch_id=0..N overwrite the marker exists to prevent
            # (r8 review — the guard previously only fired when the marker
            # file already existed).
            raise ValueError(
                f"state_dir {state_dir} holds live state but no checkpoint"
                " marker (pre-upgrade layout); cannot verify the checkpoint"
                f" lineage for {cp} — compact and clear the state first, or"
                " pass allow_checkpoint_change=True to adopt this checkpoint"
                " as the state's lineage"
            )
    os.makedirs(state_dir, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(cp)
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
        _last_raising_batch(),
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

    # SNAPSHOT the input set FIRST, then read and later delete exactly
    # that set: listing the deletions after the read (the previous order)
    # let a partial batch land in between — present in `included`, absent
    # from the compaction input, deleted uncompacted = silent data loss
    # (r7 review).
    included = _list_partials(state_dir)
    gens = _list_gens(state_dir)
    src = _sources_for(spark, state_dir, included, gens)
    if src is None:
        raise FileNotFoundError(f"no upsert state under {state_dir}")
    cdir = os.path.join(state_dir, "compacted")
    pdir = os.path.join(state_dir, "partials")
    new_gen = (max(gens) + 1) if gens else 0
    compacted = src.groupBy(*key_cols).agg(
        F.max("partial_max").alias("partial_max"),
        _last_raising_batch(),
    )
    compacted.write.mode("overwrite").parquet(os.path.join(cdir, f"v={new_gen}"))
    # inputs are now redundant; delete AFTER the generation is durable,
    # and ONLY the snapshotted inputs
    for e in included:
        shutil.rmtree(os.path.join(pdir, e), ignore_errors=True)
    for g in gens:
        shutil.rmtree(os.path.join(cdir, f"v={g}"), ignore_errors=True)
    return new_gen
