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
