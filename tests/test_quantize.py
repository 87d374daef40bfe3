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
