"""Layout-maintenance queries (q165/q166) and the wave-4b curation tier:
value-level contracts the oracle hash alone does not express — Z-order
locality actually beats arrival order, the production range-partitioned
write produces disjoint zval ranges, compaction bins respect the target,
cluster canonicalization keeps exactly one doc per cluster, and the HLL
estimate lands within its theoretical error envelope.
"""

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.layout import (
    Q165_FILES,
    Q166_TARGET,
    _zval_col,
    q165_zorder_layout,
    q166_compaction_plan,
)

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_beats_naive_on_worst_dimension(spark):
    out = q165_zorder_layout(spark, SF_DIR).collect()
    by_layout = {}
    for r in out:
        by_layout.setdefault(r.layout, []).append(r)
    assert len(by_layout["zorder"]) == Q165_FILES
    assert len(by_layout["naive"]) == Q165_FILES
    lo_x = min(r.min_x for r in out)
    hi_x = max(r.max_x for r in out)
    lo_y = min(r.min_y for r in out)
    hi_y = max(r.max_y for r in out)

    def worst_dim_span(rows):
        # mean normalized file span per dimension; a point query on a
        # dimension touches ~that fraction of files. The layout's quality
        # is its WORST dimension — naive (arrival order) is perfect on
        # time but spans the full user range in every file; Z-order
        # shrinks both.
        sx = sum((r.max_x - r.min_x + 1) / (hi_x - lo_x + 1) for r in rows)
        sy = sum((r.max_y - r.min_y + 1) / (hi_y - lo_y + 1) for r in rows)
        return max(sx, sy) / len(rows)

    assert worst_dim_span(by_layout["zorder"]) < worst_dim_span(
        by_layout["naive"]
    )


def test_zorder_production_write_is_range_partitioned(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    z = ev.select(
        "event_id",
        _zval_col(
            (F.col("user_id") % 256), (F.dayofyear("ts") % 256).cast("bigint")
        ).alias("zval"),
    )
    laid = z.repartitionByRange(4, "zval").sortWithinPartitions("zval")
    # plan: a RangePartitioning exchange, not a single-partition window
    plan = laid._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # per-partition zval ranges are disjoint -> file min/max stats prune
    parts = (
        laid.select(F.spark_partition_id().alias("pid"), "zval")
        .groupBy("pid")
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo


def test_compaction_bins_respect_target(spark):
    plan = q166_compaction_plan(spark, SF_DIR).collect()
    assert plan
    files = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.date_trunc("day", "ts"), "event_type")
        .agg(F.sum(F.length("props") + 32).alias("sz"))
        .collect()
    )
    max_file = max(r.sz for r in files)
    assert sum(r.n_files for r in plan) == len(files)
    # exclusive-cumsum rule: a bin can exceed the target by at most the
    # file that crossed the boundary
    for r in plan:
        assert r.total_bytes <= Q166_TARGET + max_file


def test_cluster_representatives_one_keeper_per_cluster(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.corpus_quality import (
        q157_cluster_representatives,
    )

    out = q157_cluster_representatives(spark, SF_DIR)
    per = (
        out.groupBy("cluster_id")
        .agg(
            F.sum("is_kept").alias("kept"),
            F.count("*").alias("n"),
            F.max("cluster_size").alias("sz"),
        )
        .collect()
    )
    assert per
    for r in per:
        assert r.kept == 1
        assert r.n == r.sz
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n for r in per) == n_docs


def test_hll_estimate_within_error_envelope(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches import (
        q158_hll_sketch,
    )

    rows = q158_hll_sketch(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 1.04/sqrt(64) ~= 13% standard error; allow 4 sigma
        assert r.rel_err <= 0.52, (r.event_type, r.rel_err)
        assert r.hll_estimate > 0


def test_nucleus_sample_smallest_prefix(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.corpus_quality import (
        Q163_P,
        q163_quality_mass_sample,
    )

    rows = q163_quality_mass_sample(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept <= r.n_total
        # kept mass reaches the target share...
        assert r.kept_chars >= Q163_P * r.total_chars
