"""Sinks (SURVEY §2.2): per-topic tables, frames, detections.

The reference's sinks are hand-managed files and DynamoDB items; here
every sink is a partitioned columnar write whose layout IS the query
optimization:

- per-topic tables partitioned by ``topic`` -> partition pruning replaces
  the reference's one-CSV-per-connection bookkeeping (K1,
  bagstream.py:171-182)
- frames partitioned by ``(topic)`` with raw pixel buffers -> no per-frame
  PNG round-trip (K2); camera/day layout gives the enrich path a pruned
  incremental scan. :func:`write_png_files` is the reference-parity sink:
  real ``.png`` files (stdlib codec, functions/png.py), one per frame,
  written from the executors (bagstream.py:246-266's cv2.imwrite)
- detections partitioned by ``ts_key`` -> the wide table's natural query
  axis ("find frames with cars on day X", README.md:9-13)

mp4 rendering (K3) shells out to ffmpeg in the reference (main.py:47-66);
no codec exists in this container so :func:`render_videos` is an explicit
stub documenting the grouping semantics (one video per image directory =
``groupBy(dirname)`` + ``applyInPandas``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_topic_tables(records: DataFrame, root: str, fmt: str = "parquet") -> None:
    """K1: one logical table per topic via partitioned write. CSV is
    supported for reference parity; parquet is the real layout."""
    writer = records.write.mode("overwrite").partitionBy("topic")
    if fmt == "csv":
        # CSV cannot carry binary image payloads — mirror the reference,
        # which routes images to the PNG sink instead of the topic CSV
        writer = records.drop("img_data").write.mode("overwrite").partitionBy("topic")
        writer.option("header", True).csv(root)
    else:
        writer.parquet(root)


def write_frames(frames: DataFrame, root: str) -> None:
    """K2: frame table with raw pixel/binary payloads, partitioned by
    topic; filenames (``img_file``) remain reference-compatible keys."""
    frames.write.mode("overwrite").partitionBy("topic").parquet(root)


def write_png_files(decoded: DataFrame, root: str, name_col: str = "img_file") -> int:
    """K2 reference-parity sink: encode each decoded frame to a real PNG
    and write ``<root>/<topic-sanitized>/<img_file>`` from the executors —
    the distributed analog of bagstream.py:246-266's per-frame cv2.imwrite
    (at scale each task PUTs to the object store exactly like the
    reference's upload queue, K4). Returns the number of files written."""

    def write_batches(batches):
        import os

        import pandas as pd

        from ..functions.png import encode_png

        n = 0
        for pdf in batches:
            for topic, name, pix, w, h in zip(
                pdf["topic"], pdf[name_col], pdf["pixels"], pdf["img_width"], pdf["img_height"]
            ):
                d = os.path.join(root, topic.strip("/").replace("/", "_"))
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, name), "wb") as f:
                    f.write(encode_png(bytes(pix), int(w), int(h), 3))
                n += 1
        yield pd.DataFrame({"n": [n]})

    counts = decoded.mapInPandas(write_batches, schema="n bigint").collect()
    return sum(r["n"] for r in counts)


def write_detections(wide: DataFrame, root: str, partition_col: str = "ts_key") -> None:
    """K6 batch sink: idempotent overwrite-by-partition (dynamic partition
    overwrite = the batch analog of the streaming max-upsert MERGE)."""
    (
        wide.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(root)
    )


def render_videos(*_args, **_kwargs):
    """K3 (mp4 per camera dir, ffmpeg, main.py:47-66): requires an ffmpeg
    binary not present in this container. Semantics when wired: group
    frames by directory (A4's distinct-dirs set), sortWithinPartitions by
    frame_id, applyInPandas shelling to ffmpeg per group."""
    raise NotImplementedError("mp4 rendering needs ffmpeg; see docstring for the plan shape")
