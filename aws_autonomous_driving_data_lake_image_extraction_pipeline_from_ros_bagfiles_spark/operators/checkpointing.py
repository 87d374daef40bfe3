"""Lineage-truncation helper shared by the iterative graph operators
(components.py, pagerank.py).

Two tiers (VERDICT r4 #6):

- ``checkpoint_dir=None`` (default): ``localCheckpoint`` — blocks live in
  executor storage. Fast (no distributed-FS round trip) but NOT
  fault-tolerant: losing an executor mid-iteration loses blocks and the
  truncated lineage cannot recompute them, so the job fails and must be
  rerun from the start (acceptable for interactive/bench runs).
- ``checkpoint_dir=path``: RELIABLE checkpoint — materialized to the
  given directory (HDFS/S3A/local path). Iterations survive executor
  loss; this is the setting for long multi-hour graph jobs on
  preemptible fleets. The checkpoint dir is set once per SparkContext
  (Spark keeps one global dir; per-call divergent dirs would silently
  re-point the whole context, so we only set it when unset or changed).

Storage lifecycle of the reliable tier (ADVICE r5): each call writes one
``rdd-N`` snapshot under the dir and Spark does NOT delete superseded
ones by default — an unbounded leak for per-iteration checkpointing.
The engine therefore sets ``spark.cleaner.referenceTracking
.cleanCheckpoints=true`` at context start (session.py): the
ContextCleaner deletes a checkpoint's files once its RDD is
garbage-collected, which for the iterative loops here happens as soon
as the round rebinds ``cur``/``ranks`` (CPython refcount drops the
py4j handle; the JVM reclaims on its next GC). Frames that stay live
across the loop (``nodes``/``deg``/the returned result) keep their
files, which is exactly the fault-tolerance contract. A blanket
"delete all but the newest rdd-*" sweep here would be WRONG for that
same reason. Sessions built outside ``session.get_spark`` must set the
conf themselves (it is read once by the ContextCleaner constructor) or
accept the accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# last dir set per SparkContext (keyed by applicationId — id(sc) could
# alias after a context restart reuses the address, cf. tables._BUCKETED's
# convention): setCheckpointDir is global to the context and mints a fresh
# UUID subdir on every call, so we only re-set it when the requested dir
# actually changes
_SET_DIRS: dict[str, str] = {}


def truncate_lineage(
    df: DataFrame, checkpoint_dir: str | None, eager: bool
) -> DataFrame:
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    app = sc.applicationId
    if _SET_DIRS.get(app) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        _SET_DIRS[app] = checkpoint_dir
    return df.checkpoint(eager=eager)
