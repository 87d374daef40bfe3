"""int8 quantization: code range, reconstruction bound, zero vectors."""

import pytest
from pyspark.sql import Row

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.quantize import (
    dequant_error,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, -2.0, 0.5, 4.0]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),
        Row(vec_id=3, embedding=[-3.0, 3.0, 1.5, -1.5]),
    ]
    return spark.createDataFrame(rows)


def test_codes_span_full_range(vecs):
    out = {r.vec_id: r for r in quantize_int8(vecs).collect()}
    # the max-|x| element always maps to +/-127
    assert max(abs(c) for c in out[1].qvec) == 127
    assert out[1].qvec[3] == 127 and out[3].qvec[0] == -127
    assert all(-127 <= c <= 127 for r in out.values() for c in r.qvec)


def test_zero_vector_is_safe(vecs):
    out = {r.vec_id: r for r in quantize_int8(vecs).collect()}
    assert out[2].scale == 0.0 and out[2].qvec == [0, 0, 0, 0]


def test_reconstruction_bound(vecs):
    out = {r.vec_id: r for r in dequant_error(quantize_int8(vecs)).collect()}
    for r in out.values():
        if r.scale > 0:
            # half-up rounding keeps every element within scale/2
            assert r.mae <= r.scale / 2 + 1e-12
    assert out[2].mae == 0.0


def test_no_shuffle_no_python(vecs):
    plan = quantize_int8(vecs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# quantized_topk (two-stage retrieval)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def emb(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.tables import load

    return load(spark, "/root/testdata/sf0.01", "embeddings")


def test_quantized_retrieval_recall_vs_brute(emb):
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.quantize import (
        quantized_topk,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.similarity import (
        cosine_topk,
    )

    query = emb.filter(F.col("vec_id") == 0).select("vec_id", F.col("embedding").alias("qe"))
    corpus = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    approx = {r.vec_id for r in quantized_topk(corpus, query, k=5, expand=4).collect()}
    exact = {r.vec_id for r in cosine_topk(corpus, query.select("qe"), 5).collect()}
    # int8 over 64 dims is near-lossless: demand >= 4/5 overlap
    assert len(approx & exact) >= 4, (approx, exact)


def test_quantized_retrieval_no_full_sort(emb):
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.quantize import (
        quantized_topk,
    )

    query = emb.filter(F.col("vec_id") == 0).select("vec_id", F.col("embedding").alias("qe"))
    corpus = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    plan = (
        quantized_topk(corpus, query, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
