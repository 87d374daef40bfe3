"""Pure-stdlib MXNet RecordIO codec (S11/K10 byte-format closer).

The reference packs its training set into indexed RecordIO via
``mx.recordio`` (im2rec.py:119-184 pack, 194-221 indexed write) and reads
it back with ``RecordFileDetection`` (train_yolov3.py:104-108). Earlier
rounds kept only the *semantics* (normalized boxes in parquet, SURVEY S11
note); this module closes the remaining byte-format gap the way png.py
and avi.py closed K2/K3 — the container is simple framing, implemented
from the public MXNet format:

- record frame: ``u32 magic (0xced7230a) | u32 lrecord | data | pad4``
  where ``lrecord = (cflag << 29) | len(data)`` (cflag 0 = complete
  record; multi-part continuation flags exist in the format but a writer
  never needs them for byte-exact round-trips of whole records).
- IRHeader (image record payload prefix): ``<IfQQ`` = (flag, label, id,
  id2). A scalar label rides in the header float; a label VECTOR sets
  ``flag = len(vector)``, zeroes the header float, and prepends the
  float32 array to the payload — exactly ``mx.recordio.pack``.
- index file: one ``"<key>\\t<offset>\\n"`` text line per record, offset =
  byte position of the record frame in the .rec stream
  (``MXIndexedRecordIO``).

All functions are bytes-in/bytes-out so they run identically on driver
or executors (see sources/sinks.py:write_recordio_files for the
distributed sink).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0xCED7230A
_IR_HEADER = struct.Struct("<IfQQ")  # flag, label, id, id2


def pack_record(data: bytes) -> bytes:
    """Frame one complete record (cflag=0), padded to a 4-byte boundary."""
    if len(data) >= (1 << 29):
        raise ValueError("record too large for single-frame RecordIO")
    out = struct.pack("<II", MAGIC, len(data)) + data
    return out + b"\x00" * (-len(data) % 4)


def unpack_records(buf: bytes) -> list[tuple[int, bytes]]:
    """-> [(offset, data)] for every framed record in the stream."""
    out = []
    pos = 0
    while pos + 8 <= len(buf):
        magic, lrec = struct.unpack_from("<II", buf, pos)
        if magic != MAGIC:
            raise ValueError(f"bad RecordIO magic at offset {pos}")
        cflag, length = lrec >> 29, lrec & ((1 << 29) - 1)
        if cflag != 0:
            raise ValueError("multi-part records not produced by this writer")
        if pos + 8 + length > len(buf):
            # a crashed writer / partial copy: slicing would silently
            # return a SHORT payload — truncated training records with no
            # error (r7 review; the named-corruption contract of the bag
            # decoder applies to every byte format here)
            raise ValueError(
                f"truncated RecordIO stream: record at offset {pos} declares"
                f" {length} bytes but only {len(buf) - pos - 8} remain"
            )
        out.append((pos, buf[pos + 8 : pos + 8 + length]))
        pos += 8 + length + (-length % 4)
    return out


def pack_ir(labels, rec_id: int, payload: bytes) -> bytes:
    """IRHeader + payload. ``labels``: scalar -> header float; sequence ->
    flag=len, float32 array prepended (mx.recordio.pack semantics)."""
    try:
        n = len(labels)
    except TypeError:
        return _IR_HEADER.pack(0, float(labels), rec_id, 0) + payload
    vec = np.asarray(labels, dtype=np.float32)
    return _IR_HEADER.pack(n, 0.0, rec_id, 0) + vec.tobytes() + payload


def unpack_ir(data: bytes) -> tuple[list[float], int, bytes]:
    """-> (label_vector, id, payload); a scalar label comes back as a
    one-element vector for a uniform return shape."""
    if len(data) < _IR_HEADER.size:
        raise ValueError(
            f"truncated IRHeader: {len(data)} bytes < {_IR_HEADER.size}"
        )
    flag, label, rec_id, _id2 = _IR_HEADER.unpack_from(data, 0)
    body = data[_IR_HEADER.size :]
    if flag == 0:
        return [label], rec_id, body
    if len(body) < 4 * flag:
        raise ValueError(
            f"truncated IR label vector: flag declares {flag} floats but"
            f" {len(body)} payload bytes remain"
        )
    vec = np.frombuffer(body[: 4 * flag], dtype=np.float32)
    return [float(x) for x in vec], rec_id, body[4 * flag :]


def write_indexed(records: list[tuple[int, bytes]]) -> tuple[bytes, str]:
    """[(key, record_payload)] -> (.rec stream, .idx text). Offsets index
    the framed record start, as MXIndexedRecordIO records them."""
    rec_parts: list[bytes] = []
    idx_lines: list[str] = []
    offset = 0
    for key, data in records:
        framed = pack_record(data)
        idx_lines.append(f"{key}\t{offset}\n")
        rec_parts.append(framed)
        offset += len(framed)
    return b"".join(rec_parts), "".join(idx_lines)


def read_indexed(rec: bytes, idx: str) -> dict[int, bytes]:
    """Random-access read via the index: {key: payload}. Validates that
    every index offset lands on a real record frame."""
    out: dict[int, bytes] = {}
    for line in idx.splitlines():
        key_s, off_s = line.split("\t")
        off = int(off_s)
        if off < 0 or off + 8 > len(rec):
            raise ValueError(
                f"index key {key_s}: offset {off} outside the record stream"
            )
        magic, lrec = struct.unpack_from("<II", rec, off)
        if magic != MAGIC:
            raise ValueError(f"index key {key_s}: offset {off} is not a record")
        length = lrec & ((1 << 29) - 1)
        if off + 8 + length > len(rec):
            raise ValueError(
                f"index key {key_s}: record at offset {off} is truncated"
            )
        key = int(key_s)
        if key in out:
            # write_indexed happily writes duplicate keys; a dict read
            # would silently keep only the last record (r7 review)
            raise ValueError(f"duplicate index key {key}")
        out[key] = rec[off + 8 : off + 8 + length]
    return out
