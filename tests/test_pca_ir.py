"""Pins for phrase search (q113) and power-iteration PCA (q114)."""

import math

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.pca import (
    gram_matrix,
    power_iteration,
    project,
)


def test_power_iteration_known_eigenvector():
    # G = [[2, 1], [1, 2]]: dominant eigvec (1,1)/sqrt(2), eigval 3
    rows = [(1, 1, 2.0), (1, 2, 1.0), (2, 1, 1.0), (2, 2, 2.0)]
    v = power_iteration(rows, 2, 20)
    s = 1.0 / math.sqrt(2.0)
    assert abs(v[0] - s) < 1e-12 and abs(v[1] - s) < 1e-12


def test_gram_matrix_exact(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    g = {(r["i"], r["j"]): r["g"] for r in gram_matrix(emb).collect()}
    assert g[(1, 1)] == 10.0 and g[(1, 2)] == 14.0
    assert g[(2, 1)] == 14.0 and g[(2, 2)] == 20.0


def test_project_fold(spark):
    emb = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    out = emb.select(project(emb, [0.5, 0.25]).alias("p")).collect()[0]["p"]
    assert out == 1.0


def test_phrase_search_adjacency(spark, monkeypatch, tmp_path):
    import aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.text_ir as TI

    docs = spark.createDataFrame(
        [
            (1, "table hash x table hash"),  # two phrase hits
            (2, "table x hash"),  # terms present, not adjacent
            (3, "hash table"),  # reversed order only
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    monkeypatch.setattr(TI, "load", lambda _s, _d, _t: spark.read.parquet(path))
    rows = {r["doc_id"]: r for r in TI.q113_phrase_search(spark, "x").collect()}
    assert set(rows) == {1}
    assert rows[1]["n_matches"] == 2 and rows[1]["first_pos"] == 1


def test_retrieve_rerank_two_stage(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.text_ir import (
        Q117_TOPK,
        q80_bm25,
        q117_retrieve_rerank,
    )

    sf = "/root/testdata/sf0.001"
    out = q117_retrieve_rerank(spark, sf).collect()
    assert len(out) <= Q117_TOPK
    # top-5 is drawn from the BM25 candidate set (stage-2 never widens)
    cands = {r["doc_id"] for r in q80_bm25(spark, sf).collect()}
    assert {r["doc_id"] for r in out} <= cands
    # rank column is 1..n in rerank-score order
    scores = [r["rerank_score"] for r in out]
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))
    assert scores == sorted(scores, reverse=True)
