"""ROS bag v2.0 streaming decoder as a Spark source.

Format (public rosbag spec; the reference's reader implements the same
framing in service/app/bagstream.py:64-210):

- magic line ``#ROSBAG V2.0\\n``; only version 2.0 accepted
  (bagstream.py:74-77)
- records: ``u32 header_len | fields | u32 data_len | data`` where each
  field is ``u32 field_len`` then ``name=value`` (bagstream.py:103-131);
  the ``op`` field is a single byte
- op 7 = connection (topic/type in a nested field block,
  bagstream.py:133-159), op 2 = message (conn id + u64 time,
  bagstream.py:219-238), op 5 = chunk (``compression`` none|bz2 +
  ``size``; inner records re-framed until exhausted,
  bagstream.py:184-210), other ops skipped by data_len
  (bagstream.py:240-243)
- message payloads use ROS little-endian serialization, decoded per type
  by :mod:`ros_messages` — the analog of the reference's
  ``process_message_map`` registry (bagstream.py:379-384)

Spark integration: one bag = one ``binaryFile`` row = one task
(parallelism across bags, matching the reference's one-Fargate-task-per-bag
model, SURVEY §3 EP1); the decode itself is a single forward pass with
O(record) memory, emitted as Arrow batches from ``mapInPandas``. Output is
a long-format DataFrame; typed per-topic views are carved out afterwards
with ``from_json`` + fixed schemas (the dynamic-schema split, SURVEY §4.2).
"""

from __future__ import annotations

import bz2
import json
import struct
from collections.abc import Iterable, Iterator

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # executor-side only — deferred so the per-query
    # python_streaming_source_runner spawn (fresh interpreter,
    # useDaemon=false) does not pay pandas' ~0.36 s import when it
    # unpickles the rosbag DataSource (see rosbag_split.py header).
    import pandas as pd

from .ros_messages import decode_message

BAG_MAGIC = b"#ROSBAG V2.0\n"

OP_MESSAGE = 2
OP_BAG_HEADER = 3
OP_CHUNK = 5
OP_CONNECTION = 7

BAG_RECORD_SCHEMA = (
    "bag string, topic string, msg_type string, ros_time bigint, "
    "seq bigint, frame_id string, payload_json string, "
    "img_encoding string, img_width int, img_height int, img_data binary"
)

_RECORD_COLUMNS = [
    "bag",
    "topic",
    "msg_type",
    "ros_time",
    "seq",
    "frame_id",
    "payload_json",
    "img_encoding",
    "img_width",
    "img_height",
    "img_data",
]


def _read_u32(buf: bytes, pos: int) -> tuple[int, int]:
    return struct.unpack_from("<I", buf, pos)[0], pos + 4


def _parse_fields(block: bytes) -> dict[str, bytes]:
    """Length-prefixed ``name=value`` fields (bagstream.py:103-131 framing)."""
    fields: dict[str, bytes] = {}
    pos = 0
    while pos < len(block):
        flen, pos = _read_u32(block, pos)
        item = block[pos : pos + flen]
        pos += flen
        eq = item.index(b"=")
        fields[item[:eq].decode("iso-8859-1")] = item[eq + 1 :]
    return fields


def _iter_records(buf: bytes, pos: int = 0) -> Iterator[tuple[dict[str, bytes], bytes]]:
    """Yield (header_fields, data) for each record in buf[pos:]."""
    n = len(buf)
    while pos < n:
        hlen, pos = _read_u32(buf, pos)
        header = _parse_fields(buf[pos : pos + hlen])
        pos += hlen
        dlen, pos = _read_u32(buf, pos)
        data = buf[pos : pos + dlen]
        pos += dlen
        yield header, data


def _ros_key(t: int) -> int:
    """Monotone ordering key for packed ros times.

    The packed form is ``(nsec << 32) | sec`` (bagstream.py:222), whose
    integer order is dominated by nanoseconds — comparing raw packed
    values is WRONG. This swaps the halves so sec is the high word.
    (rosbag_split re-exports this as its public ``ros_key``.)
    """
    return ((t & 0xFFFFFFFF) << 32) | (t >> 32)


def _connection_entry(header: dict[str, bytes], data: bytes) -> tuple[int, dict[str, str]]:
    """op-7 record -> (conn id, {topic, type}) — THE connection parse,
    shared by the sequential decoder and rosbag_split's layout scan so
    the registry semantics cannot drift."""
    conn_id = struct.unpack("<I", header["conn"])[0]
    conn_fields = _parse_fields(data)
    return conn_id, {
        "topic": header.get("topic", conn_fields.get("topic", b"")).decode("iso-8859-1"),
        "type": conn_fields.get("type", b"").decode("iso-8859-1"),
    }


def _message_row(bag_name: str, conn: dict[str, str], ros_time: int, msg: dict) -> dict:
    """Decoded message -> BAG_RECORD_SCHEMA row dict — shared by the
    sequential decoder and rosbag_split's chunk decoder (one source of
    truth for the output shape)."""
    return {
        "bag": bag_name,
        "topic": conn["topic"],
        "msg_type": conn["type"],
        "ros_time": ros_time,
        "seq": msg.get("seq"),
        "frame_id": msg.get("frame_id"),
        "payload_json": json.dumps(msg.get("payload", {}), sort_keys=True)
        if msg.get("payload") is not None
        else None,
        "img_encoding": msg.get("img_encoding"),
        "img_width": msg.get("img_width"),
        "img_height": msg.get("img_height"),
        "img_data": msg.get("img_data"),
    }


def decode_bag_bytes(
    bag_name: str,
    blob: bytes,
    topics: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
) -> Iterator[dict]:
    """Single forward pass over one bag's bytes -> record dicts.

    Connections are registered as encountered (op 7); messages (op 2)
    resolve their connection and decode the typed payload; chunks (op 5)
    are decompressed and their inner records processed inline — identical
    control flow to the reference's constructor loop (bagstream.py:64-89).

    ``topics``/``time_range`` (packed ros times, inclusive) skip the
    payload deserialization — the expensive step — for non-matching
    messages; the sequential reader still frames through every record
    (chunk-level skipping needs the op-6 index, see rosbag_split).
    The reference's unused ``topics_to_extract`` env vars
    (ecs_stack.py:180,308) are the intent this realizes.

    Malformed framing (truncated file, garbage bytes) raises ValueError
    naming the bag — a lake-scale ingest will meet corrupt objects and a
    bare struct.error with no file context is undebuggable.
    """
    if not blob.startswith(BAG_MAGIC):
        version = blob.split(b"\n", 1)[0][:40]
        raise ValueError(f"unsupported bag version: {version!r} (only 2.0)")

    connections: dict[int, dict[str, str]] = {}
    lo = _ros_key(time_range[0]) if time_range is not None else None
    hi = _ros_key(time_range[1]) if time_range is not None else None

    def handle(records: Iterable[tuple[dict[str, bytes], bytes]]) -> Iterator[dict]:
        for header, data in records:
            op = header["op"][0]
            if op == OP_CONNECTION:
                conn_id, entry = _connection_entry(header, data)
                connections[conn_id] = entry
            elif op == OP_MESSAGE:
                conn_id = struct.unpack("<I", header["conn"])[0]
                ros_time = struct.unpack("<Q", header["time"])[0]
                conn = connections.get(conn_id, {"topic": "?", "type": "?"})
                if topics is not None and conn["topic"] not in topics:
                    continue
                if lo is not None and not (lo <= _ros_key(ros_time) <= hi):
                    continue
                yield _message_row(
                    bag_name, conn, ros_time, decode_message(conn["type"], data)
                )
            elif op == OP_CHUNK:
                compression = header.get("compression", b"none").decode("iso-8859-1")
                inner = bz2.decompress(data) if compression == "bz2" else data
                yield from handle(_iter_records(inner))
            # op 3 (bag header), 4/6 (index) and unknown ops: skipped by
            # data_len, as the reference does (bagstream.py:240-243, 363-371)

    try:
        yield from handle(_iter_records(blob, len(BAG_MAGIC)))
    except (struct.error, IndexError, KeyError, OSError, ValueError) as e:
        # struct/index: truncated or garbage framing; KeyError: missing
        # mandatory header field; OSError: garbage fed to bz2; ValueError:
        # truncated bz2 stream ("data ended before end-of-stream marker")
        # and '='-less header fields — all must carry the bag name, or a
        # thousand-bag ingest fails with an unattributable bare error
        raise ValueError(f"corrupt bag record stream in {bag_name}: {e}") from e


def _decode_partition(
    permissive: bool,
    topics: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # once per task (deferred — see module header)

        for pdf in batches:
            for bag_path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    # materialize per bag BEFORE yielding so a bag that
                    # corrupts mid-stream contributes nothing (all-or-
                    # nothing per file, no partial topic tables)
                    decoded = list(
                        decode_bag_bytes(bag_path, bytes(blob), topics, time_range)
                    )
                except ValueError:
                    if not permissive:
                        raise
                    # permissive mode: a corrupt bag is skipped, good bags
                    # in the same batch still decode (Spark's PERMISSIVE
                    # json-mode philosophy applied to binary ingest)
                else:
                    # one Arrow batch PER BAG, not per input batch: peak
                    # memory is one bag's rows, not every bag in the
                    # partition stacked into a single list (r7 review)
                    if decoded:
                        yield pd.DataFrame(decoded, columns=_RECORD_COLUMNS)

    return run


def read_bags(
    spark: SparkSession,
    path: str,
    permissive: bool = False,
    topics: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
) -> DataFrame:
    """``binaryFile`` scan -> decoded long-format record DataFrame.

    ``pathGlobFilter`` plays the role of the reference's S3 suffix filter
    (S5: ecs_stack.py:244-248) — non-bag objects never reach the decoder.
    ``permissive=True`` skips corrupt bags instead of failing the job.
    ``topics``/``time_range`` push the selection into the decoder so
    non-matching payloads are never deserialized.
    """
    bags = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bag")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return bags.mapInPandas(
        _decode_partition(permissive, topics, time_range), schema=BAG_RECORD_SCHEMA
    )


def decode_bag_df(
    bags: DataFrame,
    permissive: bool = False,
    topics: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Decode an already-loaded (path, content) DataFrame (e.g. synthesized
    fixtures in tests or a streaming source)."""
    return bags.mapInPandas(
        _decode_partition(permissive, topics, time_range), schema=BAG_RECORD_SCHEMA
    )
