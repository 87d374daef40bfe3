"""Manifest-committed streaming sink — a Python DataSourceStreamWriter
with EXACTLY-ONCE visibility semantics over a plain filesystem.

The reference's sinks upload per-frame objects and only then update the
DynamoDB status row (service/app/main.py upload-then-mark); a crash
between the two leaves orphans that its check_pngs service reconciles.
This sink closes that gap the way table formats do, with nothing but
files and one atomic rename:

- ``write(iterator)`` (executor, per partition) writes an uncommitted
  data file under ``_staging/`` and returns its path + row count as the
  WriterCommitMessage.
- ``commit(messages, batchId)`` (driver, once per micro-batch) writes a
  MANIFEST line-file listing that batch's data files and renames it into
  ``_manifests/batch-<id>.json`` — the rename is the commit point.
- ``abort()`` removes the staged files; a crash before commit leaves only
  staged orphans that no reader ever sees.

Readers (:func:`read_committed`) list manifests, then read exactly the
files they name. At-least-once batch replay is safe: a replayed batch
re-stages and OVERWRITES its own ``batch-<id>.json``, so its files are
listed exactly once — the reader-side contract the engine's upsert sink
establishes with batch-id partition overwrite (streaming/upsert.py), here
enforced by the sink itself.

Works on any shared filesystem (one rename per batch, no object-store
list-after-write dependence for correctness of VISIBILITY — only the
manifest read needs to see the rename).
"""

from __future__ import annotations

import base64
import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


def _json_cell(v):
    """json.dumps fallback for non-JSON cell types. Binary columns MUST
    become base64 (what Spark's JSON reader decodes BinaryType from) —
    the previous blanket default=str wrote bytearray repr strings, which
    read_committed then returned as garbage with no error on either side
    (r7 review). Everything else (timestamps, decimals) keeps str()."""
    if isinstance(v, (bytes, bytearray, memoryview)):
        return base64.b64encode(bytes(v)).decode("ascii")
    return str(v)


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class ManifestStreamWriter(DataSourceStreamArrowWriter):
    """Arrow-batch form of the staged write (guide §4.2: hand whole
    batches to the Python boundary, not pickled Rows). ``write`` receives
    pyarrow RecordBatches; column values come out of ``to_pylist()`` as
    the same Python objects the Row path carried (int/str/bytes/datetime/
    Decimal), so the JSONL bytes keep the `_json_cell` contract — except
    nested structs, which now serialize as real JSON objects instead of
    the Row path's ``str(Row)`` fallback (strictly more parseable; no
    engine consumer writes structs through this sink). One
    ``JSONEncoder.encode`` call per row replaces dict-build + json.dumps
    with default separators; measured ~2x on the serialization loop, and
    the Arrow transfer replaces per-row pickling on the JVM boundary."""

    def __init__(self, options: dict, schema) -> None:
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("manifest sink requires a 'path' option")
        self._cols = schema.fieldNames()

    def write(self, iterator) -> _FileCommit:
        os.makedirs(f"{self._dir}/_staging", exist_ok=True)
        path = f"{self._dir}/_staging/{uuid.uuid4().hex}.jsonl"
        n = 0
        cols = self._cols
        enc = json.JSONEncoder(separators=(",", ":"), default=_json_cell).encode
        with open(path, "w") as f:
            for rb in iterator:
                data = [c.to_pylist() for c in rb.columns]
                n += rb.num_rows
                f.writelines(
                    enc(dict(zip(cols, row))) + "\n" for row in zip(*data)
                )
        return _FileCommit(path, n)

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(f"{self._dir}/_manifests", exist_ok=True)
        files = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None and m.n_rows > 0
        ]
        tmp = f"{self._dir}/_manifests/.batch-{batchId}.json.tmp"
        with open(tmp, "w") as f:
            json.dump({"batch": batchId, "files": files}, f)
        os.replace(tmp, f"{self._dir}/_manifests/batch-{batchId}.json")  # commit point

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ManifestSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_sink"

    def streamWriter(self, schema, overwrite: bool) -> ManifestStreamWriter:
        return ManifestStreamWriter(dict(self.options), schema)


def register_manifest_sink(spark: SparkSession) -> None:
    """Idempotently register ``format("manifest_sink")`` for writeStream."""
    spark.dataSource.register(ManifestSink)


def read_committed(spark: SparkSession, sink_dir: str, schema: str) -> DataFrame:
    """Exactly the rows of COMMITTED batches: list manifests, read only
    the data files they name. Staged-but-uncommitted files are invisible."""
    paths: list[str] = []
    for mf in sorted(glob.glob(f"{sink_dir}/_manifests/batch-*.json")):
        with open(mf) as f:
            paths.extend(e["path"] for e in json.load(f)["files"])
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(paths)
