"""MXNet-RecordIO byte format (S11/K10): frame/IRHeader/index round-trips
and the distributed per-split .rec/.idx sink."""

import os
import struct

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.functions.recordio import (
    MAGIC,
    pack_ir,
    pack_record,
    read_indexed,
    unpack_ir,
    unpack_records,
    write_indexed,
)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 5, 17])
def test_frame_roundtrip_and_padding(n):
    data = bytes(range(n % 256))[:n] or b""
    framed = pack_record(data)
    assert len(framed) % 4 == 0  # 4-byte alignment
    magic, lrec = struct.unpack_from("<II", framed, 0)
    assert magic == MAGIC and (lrec & ((1 << 29) - 1)) == n
    [(off, back)] = unpack_records(framed)
    assert off == 0 and back == data


def test_stream_of_records_with_offsets():
    datas = [b"a", b"bb", b"ccc", b"dddd", b"x" * 100]
    stream = b"".join(pack_record(d) for d in datas)
    got = unpack_records(stream)
    assert [d for _, d in got] == datas
    # every reported offset points at a magic word
    for off, _ in got:
        assert struct.unpack_from("<I", stream, off)[0] == MAGIC


def test_irheader_scalar_and_vector_labels():
    s = pack_ir(2.0, 7, b"img")
    labels, rid, payload = unpack_ir(s)
    assert labels == [2.0] and rid == 7 and payload == b"img"

    vec = [4.0, 5.0, 800.0, 600.0, 1.0, 0.25, 0.5, 0.75, 1.0]
    s = pack_ir(vec, 123, b"payload-bytes")
    labels, rid, payload = unpack_ir(s)
    assert rid == 123 and payload == b"payload-bytes"
    assert labels == [float(np.float32(x)) for x in vec]


def test_indexed_write_and_random_access():
    records = [(k, pack_ir([float(k)], k, bytes([k]) * k)) for k in (1, 2, 5)]
    rec, idx = write_indexed(records)
    assert len(idx.splitlines()) == 3
    by_key = read_indexed(rec, idx)
    for k, packed in records:
        assert by_key[k] == packed


def test_write_recordio_files_sink(spark, tmp_path):
    """Per-split .rec/.idx pairs from shuffled input: records land sorted
    by rec_id (the reference's reorder-after-parallel-encode), labels
    survive as float32, payloads and index offsets round-trip."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.sinks import (
        write_recordio_files,
    )

    rows = [
        ("train", 3, [1.0, 0.5], bytearray(b"c3")),
        ("train", 1, [2.0, 0.25], bytearray(b"a1")),
        ("val", 9, [3.0], bytearray(b"v9")),
        ("train", 2, [4.0, 0.125, 0.5], bytearray(b"b2")),
    ]
    packed = spark.createDataFrame(
        rows, "split string, rec_id bigint, labels array<double>, payload binary"
    ).repartition(4)  # scatter rows so each group must re-sort
    out = {
        r.split: (r.n_records, r.rec_bytes, r.idx_records)
        for r in write_recordio_files(packed, str(tmp_path)).collect()
    }
    assert out["train"][0] == 3 and out["val"][0] == 1

    rec = open(os.path.join(str(tmp_path), "train.rec"), "rb").read()
    idx = open(os.path.join(str(tmp_path), "train.idx")).read()
    assert len(rec) == out["train"][1]
    ids, all_labels, payloads = [], [], []
    for _, data in unpack_records(rec):
        labels, rid, payload = unpack_ir(data)
        ids.append(rid)
        all_labels.append(labels)
        payloads.append(payload)
    assert ids == [1, 2, 3]  # sorted by rec_id despite shuffled arrival
    assert payloads == [b"a1", b"b2", b"c3"]
    assert all_labels[0] == [float(np.float32(x)) for x in [2.0, 0.25]]
    by_key = read_indexed(rec, idx)
    assert set(by_key) == {1, 2, 3}
    _, rid2, p2 = unpack_ir(by_key[2])
    assert rid2 == 2 and p2 == b"b2"
