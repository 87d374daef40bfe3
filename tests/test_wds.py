"""WebDataset shard codec + sink (functions/wds.py, q112)."""

import glob
import os
import tarfile

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.functions.wds import (
    archive_bytes,
    decode_tar,
    encode_tar,
    member_bytes,
)


def test_tar_round_trip_and_determinism():
    members = [
        ("sample_000000001.txt", b"hello world" * 40),
        ("sample_000000001.json", b'{"doc_id":1}'),
        ("sample_000000002.txt", b""),  # empty member: header block only
        ("sample_000000002.json", b'{"doc_id":2}'),
    ]
    buf = encode_tar(members)
    assert decode_tar(buf) == members  # names, bytes, ORDER
    assert encode_tar(members) == buf  # bit-stable
    assert len(buf) == archive_bytes([len(d) for _, d in members])
    # external parser agrees (stdlib tarfile re-reading its own USTAR)
    import io

    names = [m.name for m in tarfile.open(fileobj=io.BytesIO(buf)).getmembers()]
    assert names == [n for n, _ in members]


def test_member_bytes_padding_edges():
    assert member_bytes(0) == 512
    assert member_bytes(1) == 1024
    assert member_bytes(512) == 1024
    assert member_bytes(513) == 1536
    # archive: 2 end blocks then round up to the 10240 blocking factor
    assert archive_bytes([0]) == 10240
    assert archive_bytes([10240]) == 3 * 10240 // 2 + 10240 // 2  # 20480


def test_webdataset_sink_writes_real_shards(spark, tmp_path):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.sinks import (
        write_webdataset_shards,
    )

    rows = [
        (0, "sample_b", "text b", '{"k":"b"}'),
        (0, "sample_a", "text a", '{"k":"a"}'),  # out of order on purpose
        (1, "sample_c", "text c", '{"k":"c"}'),
    ]
    df = spark.createDataFrame(rows, "shard long, key string, text string, meta string")
    root = str(tmp_path / "wds")
    out = {r["shard"]: r for r in write_webdataset_shards(df, root).collect()}
    assert out[0]["n_samples"] == 2 and out[1]["n_samples"] == 1
    files = sorted(glob.glob(os.path.join(root, "shard-*.tar")))
    assert [os.path.basename(f) for f in files] == [
        "shard-000000.tar",
        "shard-000001.tar",
    ]
    with open(files[0], "rb") as f:
        buf = f.read()
    assert out[0]["tar_bytes"] == len(buf)
    got = decode_tar(buf)
    # sorted by key inside the shard, .txt before .json per sample
    assert [n for n, _ in got] == [
        "sample_a.txt",
        "sample_a.json",
        "sample_b.txt",
        "sample_b.json",
    ]
    assert dict(got)["sample_a.txt"] == b"text a"
