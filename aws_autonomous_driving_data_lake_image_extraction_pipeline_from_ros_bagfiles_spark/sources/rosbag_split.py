"""Chunk-splittable bag decoding — parallelism WITHIN one bag, plus
topic/time predicate pushdown driven by the bag's own index records.

SURVEY §7.3 flags the reference's one-task-per-bag ceiling: its parser is
a strictly sequential stream (bagstream.py:184-210), so a single multi-GB
bag occupies one Fargate task for its whole runtime. The bag format
itself, however, is splittable: chunks are self-contained record batches,
and well-formed bags repeat connection records at the top level (outside
chunks) precisely so readers can index without decompressing anything.

Two-phase split read:

1. :func:`scan_bag_layout` — a header-only scan: walks top-level record
   frames reading headers and *seeking past* chunk payloads (I/O is
   O(header bytes), not O(file)); collects the connection registry, a
   ``(offset, length, compression)`` extent per chunk, and the chunk-info
   index records (op=6) carrying each chunk's time range and
   per-connection message counts. The reference skips op 4/6 as
   process_unknown (bagstream.py:364-371); they are exactly what makes
   pushdown possible. The reference's unused ``topics_to_extract`` env
   vars (ecs_stack.py:180,308) are the intent this realizes.
2. :func:`read_bags_split` — parallelizes the chunk extents as a
   DataFrame of splits; each task opens the file, seeks to its extent,
   decompresses/decodes just that chunk with the broadcast connection
   map. A 100-chunk bag becomes 100 tasks instead of 1.

Pushdown: ``topics=``/``time_range=`` prune whole chunks at the planning
step — a chunk whose info record shows no selected-topic messages, or a
time range disjoint from the predicate, is never read (its bytes are
never fetched, never decompressed). A residual per-message filter inside
the chunk handles the coarse boundaries. Chunks with no info record are
decoded conservatively. This is the Python shape of a DataSource-V2
``planInputPartitions`` with filter pushdown.
"""

from __future__ import annotations

import bz2
import json
import struct
from collections.abc import Iterator
from dataclasses import dataclass

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pandas is executor-side only: importing it at module
    # level charges ~0.36 s to EVERY fresh interpreter that unpickles this
    # module — in particular the per-query python_streaming_source_runner
    # Spark spawns with useDaemon=false for format("rosbag") streams
    # (measured: the spawn is most of the ~1.4 s pre-trigger gap per
    # drain). The closures below import it once per task instead.
    import pandas as pd

from .rosbag import (
    BAG_MAGIC,
    BAG_RECORD_SCHEMA,
    OP_CHUNK,
    OP_CONNECTION,
    OP_MESSAGE,
    _RECORD_COLUMNS,
    _connection_entry,
    _message_row,
    _parse_fields,
    _iter_records,
    _ros_key,
)
from .ros_messages import decode_message

OP_CHUNK_INFO = 6

# public re-export: the packed-ros-time ordering key (docs on the
# canonical definition in rosbag.py — one implementation, not a copy)
ros_key = _ros_key


@dataclass
class ChunkExtent:
    path: str
    record_offset: int  # offset of the chunk RECORD (what chunk_pos names)
    data_offset: int    # offset of the chunk's data payload
    data_len: int
    compression: str


@dataclass
class ChunkInfo:
    chunk_pos: int
    start_time: int  # packed ros time (nsec << 32 | sec)
    end_time: int
    counts: dict[int, int]  # conn id -> message count


@dataclass
class BagLayout:
    connections: dict[int, dict[str, str]]
    chunks: list[ChunkExtent]
    chunk_infos: dict[int, ChunkInfo]  # keyed by chunk record offset


def scan_bag_layout(path: str) -> BagLayout:
    """Header-only pass: connection registry + chunk extents + chunk infos.

    Requires top-level connection records (the standard bag layout writes
    them in the index region after the chunks); raises if none are found
    so callers can fall back to the sequential decoder. Malformed framing
    raises ValueError naming the path (same contract as the sequential
    decoder — this scan runs driver-side over EVERY bag in the plan, so
    an unattributed struct.error would abort planning undebuggably).
    """
    connections: dict[int, dict[str, str]] = {}
    chunks: list[ChunkExtent] = []
    infos: dict[int, ChunkInfo] = {}
    with open(path, "rb") as f:
        magic = f.read(len(BAG_MAGIC))
        if magic != BAG_MAGIC:
            raise ValueError(
                f"{path}: unsupported bag version: {magic[:40]!r} (only 2.0)"
            )
        try:
            _scan_records(f, connections, chunks, infos, path)
        except (struct.error, IndexError, KeyError, ValueError) as e:
            raise ValueError(f"corrupt bag layout in {path}: {e}") from e
    if not connections:
        raise ValueError(
            f"{path}: no top-level connection records — bag is not split-readable; "
            "use sources.rosbag.read_bags (sequential) instead"
        )
    return BagLayout(connections, chunks, infos)


def _scan_records(f, connections, chunks, infos, path: str) -> None:
    while True:
        record_offset = f.tell()
        raw = f.read(4)
        if len(raw) < 4:
            break
        (hlen,) = struct.unpack("<I", raw)
        header = _parse_fields(f.read(hlen))
        (dlen,) = struct.unpack("<I", f.read(4))
        op = header["op"][0]
        if op == OP_CONNECTION:
            conn_id, entry = _connection_entry(header, f.read(dlen))
            connections[conn_id] = entry
        elif op == OP_CHUNK:
            compression = header.get("compression", b"none").decode("iso-8859-1")
            chunks.append(ChunkExtent(path, record_offset, f.tell(), dlen, compression))
            f.seek(dlen, 1)
        elif op == OP_CHUNK_INFO:
            pos = struct.unpack("<Q", header["chunk_pos"])[0]
            data = f.read(dlen)
            counts: dict[int, int] = {}
            for off in range(0, len(data) - 7, 8):
                cid, n = struct.unpack_from("<II", data, off)
                counts[cid] = n
            infos[pos] = ChunkInfo(
                pos,
                struct.unpack("<Q", header["start_time"])[0],
                struct.unpack("<Q", header["end_time"])[0],
                counts,
            )
        else:
            f.seek(dlen, 1)


def plan_bag_splits(
    paths: list[str],
    topics: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
) -> tuple[list[tuple], dict[str, int]]:
    """Layout scan + index-driven chunk pruning.

    ``topics`` keeps only chunks whose info record counts >=1 message on a
    selected connection; ``time_range`` is an inclusive (lo, hi) pair of
    PACKED ros times (fixture helper ``ros_time``) compared via
    :func:`ros_key`; chunks with a disjoint [start,end] are dropped.
    Chunks lacking an info record are kept (conservative). Returns
    (split rows, stats) where stats counts chunks/bytes total vs selected
    — the proof that pruning skipped real I/O.
    """
    splits: list[tuple] = []
    stats = {"chunks_total": 0, "chunks_selected": 0, "bytes_total": 0, "bytes_selected": 0}
    for p in paths:
        layout = scan_bag_layout(p)
        selected_conns = {
            cid
            for cid, c in layout.connections.items()
            if topics is None or c["topic"] in topics
        }
        conn_blob = json.dumps(
            {str(k): v for k, v in layout.connections.items() if k in selected_conns}
        )
        for c in layout.chunks:
            stats["chunks_total"] += 1
            stats["bytes_total"] += c.data_len
            info = layout.chunk_infos.get(c.record_offset)
            if info is not None:
                if topics is not None and not any(
                    info.counts.get(cid, 0) > 0 for cid in selected_conns
                ):
                    continue
                if time_range is not None and (
                    ros_key(info.end_time) < ros_key(time_range[0])
                    or ros_key(info.start_time) > ros_key(time_range[1])
                ):
                    continue
            stats["chunks_selected"] += 1
            stats["bytes_selected"] += c.data_len
            splits.append((c.path, c.data_offset, c.data_len, c.compression, conn_blob))
    return splits, stats


def _decode_chunk(
    path: str,
    extent_off: int,
    extent_len: int,
    compression: str,
    connections: dict[int, dict[str, str]],
    time_range: tuple[int, int] | None = None,
) -> Iterator[dict]:
    lo = ros_key(time_range[0]) if time_range is not None else None
    hi = ros_key(time_range[1]) if time_range is not None else None
    with open(path, "rb") as f:
        f.seek(extent_off)
        data = f.read(extent_len)
    if compression == "bz2":
        data = bz2.decompress(data)
    for header, payload in _iter_records(data):
        op = header["op"][0]
        if op == OP_CONNECTION:
            # in-chunk copy; layout scan already registered the top-level one
            continue
        if op != OP_MESSAGE:
            continue
        conn_id = struct.unpack("<I", header["conn"])[0]
        conn = connections.get(conn_id)
        if conn is None:
            # connection not selected by the topic pushdown — the payload
            # is never deserialized (the expensive step)
            continue
        ros_time = struct.unpack("<Q", header["time"])[0]
        if lo is not None and not (lo <= ros_key(ros_time) <= hi):
            continue
        yield _message_row(path, conn, ros_time, decode_message(conn["type"], payload))


def read_bags_split(
    spark: SparkSession,
    paths: list[str],
    topics: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Decode bags with chunk-level parallelism and predicate pushdown.

    The layout scan runs on the driver (header-only, cheap); chunk extents
    become the unit of work, pre-pruned by ``topics``/``time_range`` via
    the bag's chunk-info index (see :func:`plan_bag_splits`). Connection
    maps ride along in the split rows (they are tiny: topic+type strings
    per selected connection). Use :func:`plan_bag_splits` directly when
    the pruning stats are wanted.
    """
    splits, _ = plan_bag_splits(paths, topics, time_range)
    split_df = spark.createDataFrame(
        splits,
        "path string, data_offset bigint, data_len bigint, compression string, conn_json string",
    ).repartition(max(len(splits), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        import pandas as pd  # once per task (deferred — see module header)

        for pdf in batches:
            rows = []
            for path, off, ln, comp, conn_json in zip(
                pdf["path"], pdf["data_offset"], pdf["data_len"], pdf["compression"], pdf["conn_json"]
            ):
                conns = {int(k): v for k, v in _json.loads(conn_json).items()}
                rows.extend(
                    _decode_chunk(path, int(off), int(ln), comp, conns, time_range)
                )
            yield pd.DataFrame(rows, columns=_RECORD_COLUMNS)

    return split_df.mapInPandas(run, schema=BAG_RECORD_SCHEMA)
