"""Value-level contracts for wave 4f (q174-q180): sketch set-op error
envelopes, PMI/collocation invariants, Neyman allocation feasibility,
backfill-gap soundness, dataset-card consistency, DQ-suite expectations,
and link-prediction non-edge guarantees.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_hll_setops_envelope(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches import (
        q174_hll_setops,
    )

    rows = q174_hll_setops(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # union of two sets is at least as big as either side
        assert r.est_union >= max(r.est_a, r.est_b) - 1e-6
        # inclusion-exclusion intersection: small sets, linear-counting
        # regime — generous 4-sigma-ish envelope (sigma ~ 1.04/8 per
        # sketch, three sketches compound)
        if r.n_exact_inter > 0:
            assert (
                abs(r.est_intersection - r.n_exact_inter)
                <= 0.75 * r.n_exact_inter + 5
            ), (r.type_a, r.type_b, r.est_intersection, r.n_exact_inter)


def test_pmi_pairs_canonical_and_supported(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.text_ir import (
        Q175_MIN_SUPPORT,
        q175_pmi_cooccurrence,
    )

    rows = q175_pmi_cooccurrence(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.ta < r.tb
        assert r.n_ab >= Q175_MIN_SUPPORT


def test_neyman_allocation_feasible(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.corpus_quality import (
        q176_neyman_allocation,
    )

    rows = q176_neyman_allocation(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.alloc <= r.n_h
        assert r.s_h >= 0


def test_backfill_gaps_are_truly_empty(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        q177_backfill_plan,
    )

    gaps = q177_backfill_plan(spark, SF_DIR).collect()
    assert gaps  # sf0.001 is sparse enough to have missing hours
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
    )
    observed = {(r.event_type, r.h) for r in ev.distinct().collect()}
    lo = min(h for _, h in observed)
    hi = max(h for _, h in observed)
    for g in gaps:
        assert g.n_hours == g.gap_end_hour - g.gap_start_hour + 1
        assert lo <= g.gap_start_hour <= g.gap_end_hour <= hi
        for h in range(g.gap_start_hour, g.gap_end_hour + 1):
            assert (g.event_type, h) not in observed
    # maximality: the hour on each side of a gap IS observed
    for g in gaps:
        if g.gap_start_hour > lo:
            assert (g.event_type, g.gap_start_hour - 1) in observed
        if g.gap_end_hour < hi:
            assert (g.event_type, g.gap_end_hour + 1) in observed


def test_dataset_card_consistent(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.reporting import (
        q178_dataset_card,
    )

    card = q178_dataset_card(spark, SF_DIR).first()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert card.n_docs == docs.count()
    assert card.n_sources == docs.select("source").distinct().count()
    assert 0.0 <= card.exact_dup_rate < 1.0
    assert 0.0 <= card.quality_pass_rate <= 1.0
    assert card.source_entropy > 0


def test_dq_constraints_clean_data(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.reporting import (
        q179_dq_constraints,
    )

    rows = {r.constraint_name: r.n_violations for r in
            q179_dq_constraints(spark, SF_DIR).collect()}
    assert len(rows) == 8
    # driver-generated tables satisfy every constraint
    assert all(v == 0 for v in rows.values()), rows


def test_link_prediction_proposes_only_non_edges(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.graph_metrics import (
        q168_triangle_count,
        q180_link_prediction,
    )

    preds = q180_link_prediction(spark, SF_DIR).collect()
    for r in preds:
        assert r.x < r.y
        assert r.common_neighbors >= 1
        assert r.adamic_adar > 0


def test_snapshot_diff_conservation(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.dataprep import (
        q171_changelog_materialize,
        q183_snapshot_diff,
    )

    rows = {r.verdict: r for r in q183_snapshot_diff(spark, SF_DIR).collect()}
    # snapshot B is the full-history materialization (cut beyond max ts)
    final_keys = q171_changelog_materialize(spark, SF_DIR).count()
    n_b = sum(
        r.n_keys for v, r in rows.items() if v in ("added", "changed", "unchanged")
    )
    assert n_b == final_keys
    assert all(r.n_keys > 0 for r in rows.values())


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution: a column added mid-stream is readable
    with mergeSchema and back-filled as NULL — the lakehouse contract a
    long-lived table relies on."""
    p = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id"), F.lit("v1").alias("tag")
    ).write.parquet(p, mode="overwrite")
    spark.range(5, 8).select(
        F.col("id"), F.lit("v2").alias("tag"), F.lit(1.5).alias("score")
    ).write.parquet(p, mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "tag", "score"}
    assert merged.count() == 8
    assert merged.filter(F.col("score").isNull()).count() == 5


def test_ivf_blocked_neardup_precision_and_recall(spark):
    """q184's pairs must all be TRUE near-dups (precision 1.0 — verify
    exact cosine for every emitted pair) and recover a reasonable share
    of the brute-force pair set (blocking recall floor)."""
    import itertools

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.analytics import (
        Q184_TAU,
        q184_semantic_dedup_ivf,
    )

    emb = {r.vec_id: r.embedding
           for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return d / (na * nb)

    truth = {
        (ia, ib)
        for ia, ib in itertools.combinations(sorted(emb), 2)
        if cos(emb[ia], emb[ib]) >= Q184_TAU
    }
    out = q184_semantic_dedup_ivf(spark, SF_DIR).collect()
    n_found = sum(r.n_pairs for r in out)
    assert n_found > 0
    # blocking can only DROP cross-bucket pairs, never invent pairs
    assert n_found <= len(truth)
    # recall floor: clustered blocking keeps a meaningful share
    assert n_found >= 0.2 * len(truth), (n_found, len(truth))
    for r in out:
        assert r.max_cosine >= Q184_TAU


def test_dup_span_coverage_interval_union(spark, tmp_path):
    """q225 semantics pinned on constructed docs: a single shared 5-gram
    covers exactly 5 tokens; overlapping shared windows merge via the
    gaps-and-islands union (a fully-duplicated doc covers ALL its
    tokens, not windows*5); a unique doc scores 0."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.corpus_quality import (
        q225_dup_span_coverage,
    )

    rows = [
        (0, "a b c d e f"),   # shares "a b c d e" with doc 1 -> 5 of 6
        (1, "a b c d e x"),   # same -> 5 of 6
        (2, "z y x w v u t"), # unique -> 0 of 7
        (3, "p q r s t u v"), # full dup of doc 4 -> 7 of 7 (union, not 15)
        (4, "p q r s t u v"),
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_frac)
        for r in q225_dup_span_coverage(spark, str(tmp_path)).collect()
    }
    assert got[0] == (6, 5, round(5 / 6, 6))
    assert got[1] == (6, 5, round(5 / 6, 6))
    assert got[2] == (7, 0, 0.0)
    assert got[3] == (7, 7, 1.0)
    assert got[4] == (7, 7, 1.0)
