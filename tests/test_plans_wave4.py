"""Physical-plan pins for the wave-4 queries: the join strategies the
scale arguments rely on must actually appear in the executed plan.

Complements tests/test_plans.py (earlier waves). Rules:
- No BroadcastNestedLoopJoin / CartesianProduct anywhere except the
  deliberate scalar crossJoins (tiny one-row corpus-stats frames), which
  Spark plans as BroadcastNestedLoopJoin over a 1-row side — these are
  allowed ONLY when one side is a scalar aggregate.
- Dimension-sized sides the code marks with F.broadcast() must plan as
  BroadcastHashJoin.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pq_codebook_joins_are_broadcast(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.dataprep import (
        q170_pq_adc_retrieval,
    )

    plan = _plan(q170_pq_adc_retrieval(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_inverted_index_broadcasts(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.text_ir import (
        q162_hard_negatives,
    )

    plan = _plan(q162_hard_negatives(spark, SF_DIR))
    # qtok / dfall / qterms are vocabulary-sized broadcast sides; the
    # only nested-loop allowed is the one-row corpus-stats crossJoin
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_triangle_and_linkpred_no_cartesian(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.graph_metrics import (
        q168_triangle_count,
        q180_link_prediction,
    )

    for q in (q168_triangle_count, q180_link_prediction):
        plan = _plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_shingle_explode_reads_token_attribute(spark):
    """The O(len^2) regression guard: the gram-building Generate must
    consume a materialized token-array attribute, not re-split the text
    inside the generator expression (BENCH_NOTES round-4)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.dedup import (
        shingles_long,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(shingles_long(docs))
    gen = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen, plan
    # the generator expression must reference the projected __toks
    # attribute; a regressed plan inlines split(text, ...) here
    assert any("__toks" in ln for ln in gen), gen
    assert not any("split(text" in ln for ln in gen), gen


def test_attribution_window_partitioned_by_user(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        q169_touch_attribution,
    )

    plan = _plan(q169_touch_attribution(spark, SF_DIR))
    # per-user windows: no single-partition global Window
    assert "Window" in plan
    for ln in plan.splitlines():
        if "Window " in ln or ln.strip().startswith("Window"):
            assert "user_id" in ln or "windowspecdefinition" not in ln.lower()


def test_dq_fk_checks_are_anti_joins(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.reporting import (
        q179_dq_constraints,
    )

    plan = _plan(q179_dq_constraints(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
