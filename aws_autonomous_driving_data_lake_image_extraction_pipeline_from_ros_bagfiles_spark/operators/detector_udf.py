"""Pluggable detector-UDF contract (U4/U5): batched model inference over
binary image columns.

Reference behavior: one synchronous Rekognition call per PNG
(process-queue-sync.py:154-156) and a SageMaker ``transform_fn`` per
request (train_yolov3.py:311-367). Here the contract is a plain Python
callable

    predict(images: list[bytes]) -> list[list[dict]]
    # each dict: {"name": str, "confidence": float, "n_instances": int}

wrapped into an Arrow-batched ``mapInPandas`` stage — the model sees whole
batches (a strict improvement over the reference's per-image calls,
SURVEY §4.1 "batched external calls"), executors each load the model once
per partition, and the output schema matches ``detections.LABEL_SCHEMA``
so the downstream explode->pivot-max plan is identical for the stub, a
local model, or a remote endpoint with rate limiting inside the callable
(ST5's retry loop belongs inside ``predict``).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Predictor = Callable[[list[bytes]], list[list[dict]]]

_OUT_SCHEMA = "bag string, topic string, ts timestamp, seq bigint, labels_json string"


def deterministic_stub_predictor(images: list[bytes]) -> list[list[dict]]:
    """Model-free stand-in: derives labels from image bytes (first-byte
    arithmetic), deterministic for golden tests."""
    vocab = ["Person", "Car", "Bicycle", "Truck", "Motorcycle"]
    out = []
    for buf in images:
        seed = (buf[0] + len(buf)) if buf else 0
        out.append(
            [
                {
                    "name": vocab[seed % 5],
                    "confidence": round(50 + (seed % 50), 3),
                    "n_instances": seed % 3 + 1,
                }
            ]
        )
    return out


def detect(frames: DataFrame, predict: Predictor, image_col: str = "img_data") -> DataFrame:
    """Run the detector over an image-frame DataFrame.

    Returns (bag, topic, ts, seq, labels) with ``labels`` typed as
    ``detections.LABEL_SCHEMA`` — ready for ``explode_labels``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds = predict([bytes(b) for b in pdf[image_col]])
            out = pdf[["bag", "topic", "ts", "seq"]].copy()
            out["labels_json"] = [json.dumps(p) for p in preds]
            yield out

    raw = frames.mapInPandas(run, schema=_OUT_SCHEMA)
    from .detections import LABEL_SCHEMA

    return raw.select(
        "bag", "topic", "ts", "seq", F.from_json("labels_json", LABEL_SCHEMA).alias("labels")
    )
