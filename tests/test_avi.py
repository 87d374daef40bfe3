"""K3 AVI render: codec round-trip (write -> demux -> pixel-exact frames)
and the distributed per-group sink."""

import os

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.functions.avi import (
    decode_avi,
    encode_avi,
)


@pytest.mark.parametrize(
    "n,h,w,fps",
    [
        (3, 5, 7, 5),     # odd width exercises the 4-byte DIB row padding
        (2, 16, 16, 30),  # aligned stride
        (1, 1, 1, 5),     # degenerate single pixel
        (24, 6, 8, 12),   # the q106 clip shape
    ],
)
def test_codec_roundtrip_pixel_exact(n, h, w, fps):
    rng = np.random.default_rng(n * 1000 + h * 100 + w * 10 + fps)
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    data = encode_avi(frames, fps=fps)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    back, got_fps = decode_avi(data)
    assert got_fps == fps
    assert back.shape == frames.shape
    assert (back == frames).all()


def test_container_structure():
    """The emitted container carries the standard chunks a stock demuxer
    expects: hdrl with avih + vids/DIB stream, movi with one 00db per
    frame, and an idx1 index."""
    frames = np.zeros((4, 6, 8, 3), dtype=np.uint8)
    data = encode_avi(frames, fps=5)
    for tag in (b"hdrl", b"avih", b"strh", b"vids", b"DIB ", b"strf", b"movi", b"idx1"):
        assert tag in data, tag.decode()
    assert data.count(b"00db") == 4 * 2  # movi chunk ids + idx1 entries


def test_render_avi_videos_sink(spark, tmp_path):
    """Distributed sink: one AVI per group, frames in frame_idx order even
    when rows arrive shuffled; files on disk demux back pixel-exact."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.sources.sinks import (
        render_avi_videos,
    )

    h, w = 4, 6
    rng = np.random.default_rng(7)
    clips = {
        "cam_front": rng.integers(0, 256, (5, h, w, 3), dtype=np.uint8),
        "cam_rear": rng.integers(0, 256, (3, h, w, 3), dtype=np.uint8),
    }
    rows = []
    for topic, stack in clips.items():
        for i in range(stack.shape[0]):
            rows.append((topic, i, w, h, bytearray(stack[i].tobytes())))
    rows = rows[::-1]  # reversed arrival order: the sink must sort
    frames = spark.createDataFrame(
        rows,
        "topic string, frame_idx int, img_width int, img_height int, pixels binary",
    )
    out = {
        r.group: (r.n_frames, r.avi_bytes)
        for r in render_avi_videos(frames, str(tmp_path), fps=5).collect()
    }
    assert set(out) == set(clips)
    for topic, stack in clips.items():
        assert out[topic][0] == stack.shape[0]
        path = os.path.join(str(tmp_path), f"{topic}.avi")
        data = open(path, "rb").read()
        assert len(data) == out[topic][1]
        back, fps = decode_avi(data)
        assert fps == 5
        assert (back == stack).all()
