"""Demo-fixture staging for file-source streaming queries.

Several registry queries drive a Structured Streaming file source from a
tiny sf slice landed as individual parquet FILES (one file == one
micro-batch under maxFilesPerTrigger=1). The landing idiom — coalesce(1)
into a throwaway stage dir, move the single part file into the source
dir, optionally pin its mtime so the source's arrival ordering is
deterministic — was copy-pasted across seven plan sites; this is the one
shared implementation.

This is NOT the production write path: real deployments land files via
their upstream writer (Kinesis/Firehose, a fleet uploader — reference
service/app/main.py's S3 drop pattern); the single-partition write exists
only to make a one-file fixture batch. It is ``repartition(1)``, NOT
``coalesce(1)``: coalescing a parallelized LOCAL relation (createDataFrame
fixtures like q61's watermark-probe row) stalls the lone task ~5 s per
write in local mode (r8 measurement, scheduler-side and size-independent),
while the one-row shuffle costs ~0.3 s and is equivalent for
parquet-derived frames.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def stage_sliced_parquet(
    df: DataFrame,
    key_col,
    dests: list[tuple[object, str, int | None]],
) -> None:
    """Land several disjoint key-slices of ``df`` as one parquet FILE
    each, in ONE Spark job (``dests`` = [(key_value, dest_path, mtime)]).

    The per-slice :func:`stage_single_parquet` loop paid one
    repartition(1) write job per slice; a multi-batch fixture (q65's
    three arrival files) stages in a single partitionBy write instead —
    hash-repartitioning on the slice key puts each value in exactly one
    task, so each partition directory holds exactly one part file, which
    is then moved to its destination. Row CONTENT per slice is identical
    to the per-slice filter+write (the slice key is a partition
    directory, not a file column); consumers that depend on intra-file
    row ORDER should keep staging per-slice."""
    stage = f"{dests[0][1]}.stage"
    (
        df.withColumn("__slice", key_col)
        .repartition("__slice")
        .write.mode("overwrite")
        .partitionBy("__slice")
        .parquet(stage)
    )
    try:
        for val, dest, mtime in dests:
            parts = glob.glob(f"{stage}/__slice={val}/part-*.parquet")
            if len(parts) != 1:  # hash-partitioned key => exactly one file
                raise RuntimeError(
                    f"stage_sliced_parquet: {len(parts)} part files for "
                    f"slice {val!r} (expected 1)"
                )
            shutil.move(parts[0], dest)
            if mtime is not None:
                os.utime(dest, (mtime, mtime))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def stage_single_parquet(df: DataFrame, dest: str, mtime: int | None = None) -> str:
    """Land ``df`` as exactly ONE parquet file at ``dest``.

    ``mtime`` (epoch seconds) pins the file's modification time when the
    consumer orders micro-batches by arrival time. Returns ``dest``.
    """
    stage = f"{dest}.stage"
    df.repartition(1).write.mode("overwrite").parquet(stage)
    shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dest)
    shutil.rmtree(stage, ignore_errors=True)
    if mtime is not None:
        os.utime(dest, (mtime, mtime))
    return dest
