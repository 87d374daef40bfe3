"""Chunk-splittable bag reader: split decode == sequential decode, and the
layout scan is header-only."""

import os
import shutil
import tempfile

import pytest

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources import (
    rosbag_fixtures as fx,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.rosbag import (
    decode_bag_bytes,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.rosbag_split import (
    read_bags_split,
    scan_bag_layout,
)


def _write_bag(work: str, **kw) -> str:
    path = os.path.join(work, "demo.bag")
    with open(path, "wb") as f:
        f.write(fx.build_demo_bag(**kw))
    return path


def test_layout_scan(spark):
    work = tempfile.mkdtemp(prefix="t_split_")
    try:
        path = _write_bag(work, n_frames=6, top_level_connections=True)
        conns, chunks = scan_bag_layout(path)
        assert len(conns) == 4 and conns[1]["type"] == "nav_msgs/Odometry"
        assert len(chunks) == 2
        assert chunks[0].compression == "none" and chunks[1].compression == "bz2"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_split_decode_equals_sequential(spark):
    work = tempfile.mkdtemp(prefix="t_split_")
    try:
        path = _write_bag(work, n_frames=8, top_level_connections=True)
        split_rows = read_bags_split(spark, [path]).collect()
        with open(path, "rb") as f:
            seq_rows = list(decode_bag_bytes(path, f.read()))

        def canon(rows):
            out = []
            for r in rows:
                d = r if isinstance(r, dict) else r.asDict()
                img = d.get("img_data")
                out.append(
                    (d["topic"], d["msg_type"], d["ros_time"], d["seq"],
                     d["payload_json"], None if img is None else bytes(img))
                )
            return sorted(out)

        assert canon(split_rows) == canon(seq_rows)
        assert len(split_rows) == 32  # 4 topics x 8 frames
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_unsplittable_bag_raises(spark):
    work = tempfile.mkdtemp(prefix="t_split_")
    try:
        path = _write_bag(work, n_frames=2, top_level_connections=False)
        with pytest.raises(ValueError, match="not split-readable"):
            scan_bag_layout(path)
    finally:
        shutil.rmtree(work, ignore_errors=True)
