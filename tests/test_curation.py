"""Value-level pins for the curation tier (q109-q111).

The registry oracles already hash-check these against DuckDB at sf0.01;
these tests pin the SEMANTICS on hand-built fixtures where the expected
answer is derivable by eye — the survivor choice in a semantic-duplicate
group, the exact classifier logit, and the span merge geometry.
"""

import math

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.curation import (
    Q110_BIAS,
    Q111_K,
    Q111_MIN_SPAN_WORDS,
    _centroids,
    _wt_int,
)


# ---------------------------------------------------------------- q109


def test_centroids_elementwise_mean(spark):
    emb = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [3.0, 2.0]), (3, 1, [5.0, 5.0])],
        "vec_id long, label int, embedding array<float>",
    )
    rows = {r["label"]: r["c"] for r in _centroids(emb, "label").collect()}
    assert rows[0] == [2.0, 1.0]
    assert rows[1] == [5.0, 5.0]


def test_semdedup_keeps_lowest_centroid_similarity(spark, monkeypatch, tmp_path):
    # Cluster of three: two near-identical vectors near the centroid and
    # one diverse outlier. SemDeDup must drop exactly one of the twins —
    # the one with HIGHER centroid similarity — and keep the outlier.
    # Vectors live in the operators' real 64-dim plane space (zero-padded
    # — the dim guard now rejects short toys loudly) and are chosen so
    # all three share LSH cell bit 0 (plane(0,0) has c0=-1, c1=+1:
    # every vector needs x1 < x0).
    import aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.curation as C

    def pad(v):
        return v + [0.0] * (64 - len(v))

    twins_plus_outlier = [
        (1, 0, pad([1.0, -0.02])),
        (2, 0, pad([1.0, 0.0])),
        (3, 0, pad([0.2, -1.0])),
    ]
    emb = spark.createDataFrame(
        twins_plus_outlier, "vec_id long, label int, embedding array<float>"
    )
    path = str(tmp_path / "embeddings.parquet")
    emb.write.parquet(path)
    monkeypatch.setattr(
        C, "load", lambda _s, _d, _t: spark.read.parquet(path)
    )
    kept = {
        r["vec_id"]: r["centroid_cos"]
        for r in C.q109_semantic_dedup(spark, "ignored").collect()
    }
    # twins have cosine ~0.9998 >= tau; vec 1 sits closer to the centroid
    # (its -y lean points toward the outlier's pull) so vec 1 is dropped
    assert set(kept) == {2, 3}
    assert kept[3] < kept[2] < 1.0


# ---------------------------------------------------------------- q110


def test_wt_int_range_and_determinism(spark):
    toks = spark.createDataFrame(
        [(t,) for t in ["the", "quick", "fox", "", "123", "the"]], "t string"
    )
    out = [r["wi"] for r in toks.select(_wt_int(F.col("t")).alias("wi")).collect()]
    assert all(-100 <= w <= 100 for w in out)
    assert out[0] == out[5]  # same token -> same weight


def test_quality_classifier_exact_logit(spark, monkeypatch, tmp_path):
    import aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.curation as C

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    monkeypatch.setattr(C, "load", lambda _s, _d, _t: spark.read.parquet(path))
    rows = {r["doc_id"]: r for r in C.q110_quality_classifier(spark, "x").collect()}
    wts = {
        r["t"]: r["wi"]
        for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "t string"
        ).select("t", _wt_int(F.col("t")).alias("wi")).collect()
    }
    z1 = sum(wts.values()) / (5.0 * 3)
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["score"] == pytest.approx(
        round(1.0 / (1.0 + math.exp(-(z1 + Q110_BIAS))), 6), abs=1e-9
    )
    assert rows[1]["kept"] == (z1 + Q110_BIAS >= 0)
    z2 = wts["alpha"] / 5.0
    assert rows[2]["kept"] == (z2 + Q110_BIAS >= 0)


# ---------------------------------------------------------------- q111


def test_dup_substring_span_geometry(spark, monkeypatch, tmp_path):
    import aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.curation as C

    # Two docs sharing an 9-word run; doc bodies otherwise unique. Every
    # K-gram inside the shared run occurs twice -> one maximal span per
    # doc covering exactly the run.
    shared = "one two three four five six seven eight nine"  # 9 words
    docs = spark.createDataFrame(
        [
            (1, f"u1a u1b {shared} u1c u1d"),
            (2, f"v1a v1b v1c {shared}"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    monkeypatch.setattr(C, "load", lambda _s, _d, _t: spark.read.parquet(path))
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_words"])
        for r in C.q111_dup_substring_spans(spark, "x").collect()
    }
    assert Q111_MIN_SPAN_WORDS <= 9
    # doc 1: shared run occupies words 3..11; doc 2: words 4..12
    assert rows[1] == (3, 11, 9)
    assert rows[2] == (4, 12, 9)
    assert 3 not in rows  # unique doc yields no spans
    # span covers full K-gram extents: end - start + 1 >= K
    assert all(e - s + 1 >= Q111_K for s, e, _ in rows.values())
