"""Multimodal audio/video queries (q63-q64): the decode / feature-extract
/ frame-sample legs of a training-data pipeline over opaque binary
columns (operators/audio.py, operators/video.py).

Both fixtures are deterministic (seeded synth), so expected outputs are
CONSTANT oracles — the same hash-checked pattern as q60/q62: the oracle
pins decode + feature math end-to-end, not just row counts.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import materialize, register


def _audio_clips(spark: SparkSession) -> DataFrame:
    """4 deterministic 1-second PCM16 sine clips at 8 kHz: clip i has
    frequency 100*(i+1) Hz and amplitude 1000*(i+1)."""
    from ..operators.audio import encode_wav

    rate = 8000
    t = np.arange(rate) / rate
    rows = []
    for i in range(4):
        wave = (1000 * (i + 1) * np.sin(2 * np.pi * 100 * (i + 1) * t)).astype("<i2")
        rows.append((i, bytearray(encode_wav(wave, rate))))
    return spark.createDataFrame(rows, "clip_id bigint, wav binary")


# --------------------------------------------------------------------------
# q63 — audio decode + frame-level features: WAV (stdlib RIFF parse) ->
# PCM -> per-1024-sample-window RMS / zero-crossing-rate -> per-clip
# summary. RMS tracks amplitude (a/sqrt(2)); ZCR tracks frequency
# (2f/rate) — the oracle constants are those physics, which only a
# correct decode + feature chain reproduces.
# --------------------------------------------------------------------------
@register(
    "q63_audio_features",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(8000 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(7 AS BIGINT), CAST(706.383 AS DOUBLE), CAST(0.0249 AS DOUBLE)),
        (CAST(1 AS BIGINT), CAST(8000 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(7 AS BIGINT), CAST(1413.714 AS DOUBLE), CAST(0.0499 AS DOUBLE)),
        (CAST(2 AS BIGINT), CAST(8000 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(7 AS BIGINT), CAST(2121.068 AS DOUBLE), CAST(0.0748 AS DOUBLE)),
        (CAST(3 AS BIGINT), CAST(8000 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(7 AS BIGINT), CAST(2828.54 AS DOUBLE), CAST(0.0998 AS DOUBLE))
    ) AS t(clip_id, sample_rate, duration_s, n_frames, avg_rms, avg_zcr)
    """,
)
def q63_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.audio import audio_features, decode_audio

    # persist the decoded frame: it feeds BOTH the feature pass and the
    # per-clip meta side of the join, and an unpersisted mapInPandas
    # decode lineage would run the WAV parse twice (r8 review)
    decoded = decode_audio(_audio_clips(spark)).persist()
    try:
        feats = audio_features(decoded, frame_len=1024)
        meta = decoded.select("clip_id", "sample_rate", "duration_s")
        summary = feats.groupBy("clip_id").agg(
            F.count("*").alias("n_frames"),
            F.round(F.avg("rms"), 3).alias("avg_rms"),
            F.round(F.avg("zcr"), 4).alias("avg_zcr"),
        )
        out = (
            meta.join(summary, "clip_id")
            .select(
                "clip_id",
                F.col("sample_rate").cast("bigint").alias("sample_rate"),
                "duration_s",
                "n_frames",
                "avg_rms",
                "avg_zcr",
            )
            .orderBy("clip_id")
        )
        return materialize(out)
    finally:
        decoded.unpersist()


def _videos(spark: SparkSession) -> DataFrame:
    """2 deterministic raw-packed clips: 24 frames of 8x6 RGB at 12 fps;
    pixel (v, f, y, x, c) = (37*v + 11*f + 5*y + 3*x + c) mod 256."""
    from ..operators.video import encode_rawv

    rows = []
    for v in range(2):
        n, w, h = 24, 8, 6
        f_idx, y, x, c = np.meshgrid(
            np.arange(n), np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        frames = ((37 * v + 11 * f_idx + 5 * y + 3 * x + c) % 256).astype(np.uint8)
        rows.append((v, bytearray(encode_rawv(frames, fps=12.0))))
    return spark.createDataFrame(rows, "video_id bigint, video binary")


# --------------------------------------------------------------------------
# q64 — video frame sampling: packed raw video -> k=4 uniformly spaced
# frames per clip, sampled INSIDE the Arrow batch (only sampled pixels
# leave the Python worker). Per-clip summary checksums the sampled
# frame indices, their timestamps, and the mean pixel value — wrong
# stride, wrong frame offsets, or wrong plane math all break the hash.
# --------------------------------------------------------------------------
@register(
    "q64_video_frame_sample",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(46 AS BIGINT), CAST(3.8333 AS DOUBLE), CAST(87.8333 AS DOUBLE)),
        (CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(46 AS BIGINT), CAST(3.8333 AS DOUBLE), CAST(123.5 AS DOUBLE))
    ) AS t(video_id, n_sampled, sum_frame_idx, sum_ts_offset, avg_pixel)
    """,
)
def q64_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.video import sample_frames

    sampled = sample_frames(_videos(spark), k_uniform=4)
    # per-frame mean pixel via codegen on the binary column would need a
    # byte-wise HOF; the pixel mean comes from the same Arrow pass instead
    from collections.abc import Iterator

    import pandas as pd

    def with_mean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["video_id", "frame_idx", "ts_offset_s"]].copy()
            out["pix_mean"] = [
                float(np.frombuffer(bytes(p), dtype=np.uint8).mean()) for p in pdf["pixels"]
            ]
            yield out

    stats = sampled.mapInPandas(
        with_mean,
        schema="video_id bigint, frame_idx int, ts_offset_s double, pix_mean double",
    )
    return (
        stats.groupBy("video_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("frame_idx").cast("bigint").alias("sum_frame_idx"),
            F.round(F.sum("ts_offset_s"), 4).alias("sum_ts_offset"),
            F.round(F.avg("pix_mean"), 4).alias("avg_pixel"),
        )
        .orderBy("video_id")
    )


# --------------------------------------------------------------------------
# q106 — video render sink (K3, main.py:47-66): every frame of each clip
# is grouped per video, ordered by frame index, and packed into ONE
# uncompressed RIFF AVI per group on the executors (stdlib codec,
# functions/avi.py — the png.py move applied to K3; only libx264
# compression remains env-blocked). The container layout is fully
# deterministic, so the oracle pins the exact byte size of each rendered
# file; pixel-exact round-trip (write -> demux -> frames) is asserted in
# tests/test_avi.py, NOT in this serving plan.
# --------------------------------------------------------------------------
@register(
    "q106_video_render",
    oracle="""
    SELECT * FROM (VALUES
        ('0', CAST(24 AS BIGINT), CAST(4264 AS BIGINT)),
        ('1', CAST(24 AS BIGINT), CAST(4264 AS BIGINT))
    ) AS t("group", n_frames, avi_bytes)
    """,
)
def q106_video_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.video import sample_frames
    from ..sources.sinks import render_avi_videos

    videos = _videos(spark)
    frames = sample_frames(videos, every_n=1)
    work = tempfile.mkdtemp(prefix="avi_render_")
    try:
        out = render_avi_videos(
            frames,
            work,
            fps=12,
            group_col="video_id",
            order_col="frame_idx",
            # collision check on the raw pre-decode table — the frame
            # lineage is a mapInPandas decode that would otherwise run
            # twice (r8 review)
            groups_src=videos,
        )
        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _dhash_images(spark: SparkSession) -> DataFrame:
    """12 deterministic 32x24 rgb8 frames in 4 content groups: seq 3p is a
    diagonal stripe pattern (period p+4, slope p+1), seq 3p+1 the same
    pattern brightness-shifted by +20 (a NEAR duplicate — same structure,
    different pixels), and seq 3p+2 a structurally different pattern
    (orientation/slope changed)."""
    import datetime

    rows = []
    ts = datetime.datetime(2023, 1, 1)
    for p in range(4):
        h, w = 24, 32
        y, x, _ = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        period = p + 4
        base = np.where((x + y * (p + 1)) % period < period // 2, 200, 40)
        variants = [
            base.astype(np.uint8),
            (base + 20).astype(np.uint8),
            np.where(
                (y + x * (p + 2)) % period < period // 2, 180, 60
            ).astype(np.uint8),
        ]
        for v, img in enumerate(variants):
            rows.append(
                ("fix.bag", "/camera/image_raw", ts, 3 * p + v, "rgb8", w, h,
                 bytearray(img.tobytes()))
            )
    return spark.createDataFrame(
        rows,
        "bag string, topic string, ts timestamp, seq bigint, "
        "img_encoding string, img_width int, img_height int, img_data binary",
    ).coalesce(2)  # 12-frame fixture: don't fan 32 python workers for it


# --------------------------------------------------------------------------
# q125 — perceptual-hash image near-dedup: decode -> 64-bit dHash
# (block-mean difference hash, brightness/contrast-invariant) -> exact
# groupBy on the hash -> groups with >= 2 members are near-duplicate
# image clusters. The image analogue of the text tier's fingerprint
# dedup: the expensive pixel work stays in one Arrow pass, the shuffle
# carries only (8-byte hash, id), and dedup is a map-side-combinable
# aggregate — no pairwise image comparison anywhere, at any corpus size.
# The fixture is deterministic, so the oracle pins the exact hash values
# and group memberships end-to-end (the q63/q64 constant-oracle pattern);
# the brightness-shifted variants MUST collide and the structurally
# different ones MUST NOT.
# --------------------------------------------------------------------------
@register(
    "q125_image_dhash_dedup",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(-6172933524898338134 AS BIGINT), CAST(2 AS BIGINT), '9,10'),
        (CAST(-5957508786450944686 AS BIGINT), CAST(2 AS BIGINT), '6,7'),
        (CAST(3257318913330139723 AS BIGINT), CAST(2 AS BIGINT), '0,1'),
        (CAST(5425760247342648364 AS BIGINT), CAST(2 AS BIGINT), '3,4')
    ) AS t(dhash, n_frames, members)
    """,
)
def q125_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import decode_frames, dhash_frames

    hashed = dhash_frames(decode_frames(_dhash_images(spark)))
    return (
        hashed.groupBy("dhash")
        .agg(
            F.count("*").alias("n_frames"),
            F.array_join(F.array_sort(F.collect_list("seq")), ",").alias(
                "members"
            ),
        )
        .filter(F.col("n_frames") >= 2)
        .orderBy("dhash")
    )
