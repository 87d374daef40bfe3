"""Contamination detection: semantics and the broadcast plan shape."""

import pytest
from pyspark.sql import Row

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.contamination import (
    contamination_report,
)


@pytest.fixture(scope="module")
def corpora(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon")]
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 3-gram "beta gamma delta" twice
            Row(doc_id=1, text="x beta gamma delta y beta gamma delta z"),
            # shares words but no 3-gram
            Row(doc_id=2, text="alpha gamma beta delta epsilon alpha"),
            Row(doc_id=3, text="completely unrelated text tokens here"),
        ]
    )
    return train, bench


def test_hits_and_multiplicity(corpora):
    train, bench = corpora
    out = {r.doc_id: r for r in contamination_report(train, bench, n=3).collect()}
    assert set(out) == {1}
    # "beta gamma delta" x2, "alpha beta gamma" x0 ... plus any other overlap
    assert out[1].n_hits == 2 and out[1].n_grams_hit == 1


def test_benchmark_side_is_broadcast(corpora):
    train, bench = corpora
    plan = (
        contamination_report(train, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_no_broadcast_fallback(corpora):
    train, bench = corpora
    rows = contamination_report(train, bench, n=3, broadcast_bench=False).collect()
    assert {r.doc_id for r in rows} == {1}
