"""Pipeline monitor (K7/ST7): the reference's RekMonitor DynamoDB table —
one status row per processed unit with Status/End columns
(process-queue-sync.py:160-169; ecs_stack.py:360-367) — re-expressed as a
StreamingQueryListener feeding an audit table.

The listener records lifecycle + per-batch progress (rows seen, batch id,
timestamps) in memory; :func:`audit_frame` turns the log into a queryable
DataFrame so pipeline health is just another table — the same philosophy
the reference applied by making its monitor a DynamoDB table rather than
log lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

AUDIT_SCHEMA = (
    "query_id string, event string, batch_id bigint, num_input_rows bigint, "
    "status string, ts string"
)


class PipelineMonitor(StreamingQueryListener):
    """In-memory audit log of streaming query lifecycle + progress."""

    def __init__(self) -> None:
        self.records: list[tuple] = []

    def onQueryStarted(self, event) -> None:
        self.records.append((str(event.id), "started", None, None, "Running", event.timestamp))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.records.append(
            (str(p.id), "progress", p.batchId, p.numInputRows, "Running", p.timestamp)
        )

    def onQueryIdle(self, event) -> None:
        self.records.append((str(event.id), "idle", None, None, "Idle", event.timestamp))

    def onQueryTerminated(self, event) -> None:
        status = "Complete" if event.exception is None else "Failed"
        self.records.append((str(event.id), "terminated", None, None, status, None))


def audit_frame(spark: SparkSession, monitor: PipelineMonitor) -> DataFrame:
    """The monitor log as a DataFrame (the RekMonitor-table analog)."""
    return spark.createDataFrame(monitor.records, AUDIT_SCHEMA)
