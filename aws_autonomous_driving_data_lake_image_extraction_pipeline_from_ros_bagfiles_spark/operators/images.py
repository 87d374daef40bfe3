"""Multimodal image operators over binary columns (F18-F21, K2/K8).

Images travel as opaque ``binary`` columns with typed metadata
(encoding/width/height) — the same shape as the decoder's image records
and Spark's built-in image source. All transforms are Arrow-batched
``mapInPandas`` stages operating on raw pixel buffers with numpy:

- :func:`decode_frames` — raw ROS payload -> RGB pixel buffer, including
  the BGR->RGB swizzle for ``8UC3`` (reference bagstream.py:257-259) and
  the mode map {rgb8, rgba8, mono8, 8UC3} (:249-255)
- :func:`blur_regions` — box-blur rectangles (the anonymizer's Gaussian
  blur over text/face boxes, select-labelling-imgs.py:89-124; box blur
  keeps it dependency-free and deterministic)
- :func:`resize_shorter_edge` — proportional nearest-neighbor resize
  (im2rec.py:163-175's resize semantics)

PNG encoding (K2, the reference's per-frame ``cv2.imwrite``/Pillow sink,
bagstream.py:246-266) is provided by the pure-stdlib codec in
:mod:`..functions.png` — :func:`encode_frames_png` stamps a ``png``
column onto decoded frames. The canonical frame layout remains raw
pixel buffers in parquet (no per-frame codec round-trip in every
downstream transform at 100 TB); PNG encode is the sink stage on the
way out, as in the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "bag string, topic string, ts timestamp, seq bigint, "
    "img_width int, img_height int, pixels binary"
)

_CHANNELS = {"rgb8": 3, "rgba8": 4, "mono8": 1, "8UC3": 3}


def _to_rgb(buf: bytes, encoding: str, w: int, h: int) -> np.ndarray:
    ch = _CHANNELS.get(encoding)
    if ch is None:
        raise ValueError(f"unsupported encoding {encoding!r}; known: {sorted(_CHANNELS)}")
    arr = np.frombuffer(buf, dtype=np.uint8)[: w * h * ch].reshape(h, w, ch)
    if encoding == "8UC3":
        arr = arr[:, :, ::-1]  # BGR -> RGB swizzle (bagstream.py:257-259)
    if encoding == "rgba8":
        arr = arr[:, :, :3]
    if encoding == "mono8":
        arr = np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr)


def decode_frames(frames: DataFrame) -> DataFrame:
    """image_view rows -> normalized RGB pixel buffers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["bag", "topic", "ts", "seq", "img_width", "img_height"]].copy()
            out["pixels"] = [
                _to_rgb(bytes(d), e, w, h).tobytes()
                for d, e, w, h in zip(
                    pdf["img_data"], pdf["img_encoding"], pdf["img_width"], pdf["img_height"]
                )
            ]
            yield out

    return frames.mapInPandas(run, schema=DECODED_SCHEMA)


def _box_blur(arr: np.ndarray, radius: int) -> np.ndarray:
    """Separable box blur via padded cumulative sums (pure numpy)."""
    k = 2 * radius + 1
    out = arr.astype(np.float32)
    for axis in (0, 1):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (radius + 1, radius)
        padded = np.pad(out, pad, mode="edge")
        cs = np.cumsum(padded, axis=axis)
        out = (np.take(cs, range(k, k + arr.shape[axis]), axis=axis)
               - np.take(cs, range(0, arr.shape[axis]), axis=axis)) / k
    return np.clip(out, 0, 255).astype(np.uint8)


def blur_pixels(buf: bytes, w: int, h: int, boxes: list[tuple[int, int, int, int]], radius: int = 7) -> bytes:
    """Blur (x1,y1,x2,y2) pixel regions — the anonymize_PII core (F20).

    Cost is proportional to the BOX area, not the frame: each region is
    blurred from a radius-padded crop (the separable box blur only needs
    radius pixels of context). The first cut blurred the full frame per
    row and threw most of it away — at corpus scale the majority of
    frames carry zero or small PII boxes (r7 review).
    """
    if not boxes:
        return buf if isinstance(buf, bytes) else bytes(buf)
    # Blur every crop from the PRISTINE frame (a zero-copy view of buf),
    # writing into a separate output copy: overlapping / adjacent boxes
    # must sample original pixels, matching the whole-frame-blur contract.
    src = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    arr = src.copy()
    for x1, y1, x2, y2 in boxes:
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(w, x2), min(h, y2)
        if x2 <= x1 or y2 <= y1:
            continue
        # pad the crop so the box's blur sees the same neighborhood it
        # would inside a whole-frame pass
        px1, py1 = max(0, x1 - radius), max(0, y1 - radius)
        px2, py2 = min(w, x2 + radius), min(h, y2 + radius)
        crop_blur = _box_blur(src[py1:py2, px1:px2], radius)
        arr[y1:y2, x1:x2] = crop_blur[y1 - py1 : y2 - py1, x1 - px1 : x2 - px1]
    return arr.tobytes()


def blur_regions(decoded: DataFrame, boxes_col: str = "boxes", radius: int = 7) -> DataFrame:
    """Blur each row's box list (array<struct<x1,y1,x2,y2>> ints)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["bag", "topic", "ts", "seq", "img_width", "img_height"]].copy()
            # NB: Arrow hands array<struct> columns over as numpy arrays,
            # whose truthiness is ambiguous for >1 element — never `boxes or []`
            out["pixels"] = [
                blur_pixels(
                    bytes(p), w, h,
                    [
                        (b["x1"], b["y1"], b["x2"], b["y2"])
                        for b in ([] if boxes is None else boxes)
                    ],
                    radius,
                )
                for p, w, h, boxes in zip(
                    pdf["pixels"], pdf["img_width"], pdf["img_height"], pdf[boxes_col]
                )
            ]
            yield out

    return decoded.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_pixels(buf: bytes, w: int, h: int, target_short: int) -> tuple[bytes, int, int]:
    """Proportional nearest-neighbor resize to a shorter-edge target (F21)."""
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
    scale = target_short / min(w, h)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    yi = np.minimum((np.arange(nh) / scale).astype(int), h - 1)
    xi = np.minimum((np.arange(nw) / scale).astype(int), w - 1)
    return arr[yi][:, xi].tobytes(), nw, nh


def resize_shorter_edge(decoded: DataFrame, target_short: int) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resize_pixels(bytes(p), w, h, target_short)
                for p, w, h in zip(pdf["pixels"], pdf["img_width"], pdf["img_height"])
            ]
            out = pdf[["bag", "topic", "ts", "seq"]].copy()
            out["img_width"] = [r[1] for r in resized]
            out["img_height"] = [r[2] for r in resized]
            out["pixels"] = [r[0] for r in resized]
            yield out[["bag", "topic", "ts", "seq", "img_width", "img_height", "pixels"]]

    return decoded.mapInPandas(run, schema=DECODED_SCHEMA)


def encode_frames_png(decoded: DataFrame, level: int = 6) -> DataFrame:
    """K2: stamp a ``png`` column (real PNG bytes, stdlib codec) onto
    decoded RGB frames — the engine's analog of the reference's per-frame
    PNG write (bagstream.py:246-266)."""
    from ..functions.png import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["bag", "topic", "ts", "seq", "img_width", "img_height"]].copy()
            out["png"] = [
                encode_png(bytes(p), w, h, 3, level)
                for p, w, h in zip(pdf["pixels"], pdf["img_width"], pdf["img_height"])
            ]
            yield out

    return decoded.mapInPandas(
        run,
        schema=(
            "bag string, topic string, ts timestamp, seq bigint, "
            "img_width int, img_height int, png binary"
        ),
    )


def dhash_pixels(buf: bytes, w: int, h: int, grid: int = 8) -> int:
    """64-bit perceptual difference hash of an RGB pixel buffer.

    Grayscale (channel mean) -> block-mean downsample to grid x (grid+1)
    -> one bit per horizontally adjacent cell comparison. Monotone
    per-pixel intensity changes (brightness shift, contrast stretch)
    preserve every comparison, so the hash is invariant to them — the
    property that makes exact-groupBy on the hash a NEAR-duplicate
    detector. Returned as a signed 64-bit int (bigint-safe).
    """
    gray = (
        np.frombuffer(buf, dtype=np.uint8)[: w * h * 3]
        .reshape(h, w, 3)
        .astype(np.float64)
        .mean(axis=2)
    )
    bits = 0
    cells = np.empty((grid, grid + 1))
    for yy in range(grid):
        r0 = min((yy * h) // grid, h - 1)
        # clamp to a non-empty slice: for h < grid (w < grid+1) the floor
        # boundaries coincide and an empty .mean() is NaN — every
        # comparison then reads False and ALL small images collapse to
        # hash 0, merging distinct images as "duplicates" (r7 review).
        # Clamped cells re-read rows/cols for tiny images, which is the
        # right degradation for a perceptual hash.
        r1 = max(r0 + 1, ((yy + 1) * h) // grid)
        for xx in range(grid + 1):
            c0 = min((xx * w) // (grid + 1), w - 1)
            c1 = max(c0 + 1, ((xx + 1) * w) // (grid + 1))
            cells[yy, xx] = gray[r0:r1, c0:c1].mean()
    for yy in range(grid):
        for xx in range(grid):
            if cells[yy, xx + 1] > cells[yy, xx]:
                bits |= 1 << (yy * grid + xx)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def dhash_frames(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """Decoded frames -> (bag, topic, seq, dhash): the image-dedup key.

    Arrow-batched; only the 8-byte hash leaves the Python worker — the
    pixel buffers never shuffle. Downstream exact/near dedup is a plain
    groupBy on the hash (the image analogue of the text pipeline's
    md5-fingerprint dedup in operators/dedup.py).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["bag", "topic", "seq"]].copy()
            out["dhash"] = [
                dhash_pixels(bytes(p), w, h, grid)
                for p, w, h in zip(pdf["pixels"], pdf["img_width"], pdf["img_height"])
            ]
            yield out

    return decoded.mapInPandas(
        run, schema="bag string, topic string, seq bigint, dhash bigint"
    )
