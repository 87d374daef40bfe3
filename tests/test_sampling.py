"""Stratified sampling: determinism, per-stratum guarantees, plan shapes."""

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.sampling import (
    HASH_SPACE,
    fraction_threshold,
    stratified_sample,
    stratified_sample_exact,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.tables import load

    return load(spark, SF_DIR, "documents")


def test_fraction_sample_is_deterministic(docs):
    ids1 = sorted(r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.5}, 0.1).select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.5}, 0.1).select("doc_id").collect())
    assert ids1 == ids2 and len(ids1) > 0


def test_fraction_sample_rate_per_stratum(docs):
    """Observed rate within a loose binomial envelope per stratum."""
    out = (
        stratified_sample(docs, "lang", {"en": 0.5}, 0.1)
        .groupBy("lang")
        .count()
        .collect()
    )
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in out:
        target = 0.5 if r.lang == "en" else 0.1
        rate = r["count"] / totals[r.lang]
        assert abs(rate - target) < 0.15, (r.lang, rate, target)


def test_fraction_sample_no_shuffle(docs):
    plan = (
        stratified_sample(docs, "lang", {"en": 0.5}, 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_exact_sample_counts_and_limit_pushdown(docs):
    out = stratified_sample_exact(docs, "lang", 7)
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, total in totals.items():
        assert counts.get(lang, 0) == min(7, total)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # top-n below the exchange


def test_exact_sample_subset_of_larger_n(docs):
    small = {r.doc_id for r in stratified_sample_exact(docs, "lang", 5).select("doc_id").collect()}
    big = {r.doc_id for r in stratified_sample_exact(docs, "lang", 10).select("doc_id").collect()}
    assert small < big


def test_threshold_bounds():
    assert fraction_threshold(0.0) == 0
    assert fraction_threshold(1.0) == HASH_SPACE
    with pytest.raises(ValueError):
        fraction_threshold(1.5)


# ---------------------------------------------------------------------------
# mixture_sample (domain reweighting)
# ---------------------------------------------------------------------------
def test_mixture_budgets_integer_split():
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.sampling import (
        mixture_budgets,
    )

    b = mixture_budgets(["a", "b", "c"], {"a": 2}, 1, 1000)
    assert b == {"a": 500, "b": 250, "c": 250}


def test_mixture_sample_caps_and_rates(docs):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.sampling import (
        mixture_budgets,
        mixture_sample,
    )
    from pyspark.sql import functions as F

    sources = [f"src{i}" for i in range(20)]
    budgets = mixture_budgets(sources, {"src2": 12}, 1, 20_000)
    out = mixture_sample(docs, budgets)
    tok = F.size(F.split(F.col("text"), " "))
    got = {
        r.source: (r.n, r.toks)
        for r in out.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum(tok).alias("toks"))
        .collect()
    }
    full = {
        r.source: (r.n, r.toks)
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum(tok).alias("toks"))
        .collect()
    }
    # src2's budget exceeds its total tokens -> fraction caps at 1.0, all kept
    assert got["src2"] == full["src2"]
    # an unweighted source is genuinely downsampled near its budget
    n, toks = got["src0"]
    assert 0 < n < full["src0"][0]
    assert toks < full["src0"][1]


def test_mixture_sample_unknown_source_raises(docs):
    import pytest as _pytest

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.sampling import (
        mixture_sample,
    )

    with _pytest.raises(ValueError, match="no budget"):
        mixture_sample(docs, {"src0": 1000})


def test_hash_split_spark_duckdb_parity_and_fractions(spark):
    """hash_split / hash_split_sql are THE split contract (q96 produces
    it, q107 shards by it, q172 audits it, q203 re-keys it): the Spark
    expression and its SQL twin must assign every key identically, and
    the 60/20/20 design must hold in aggregate."""
    import duckdb

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.sampling import (
        hash_split,
        hash_split_sql,
    )

    from pyspark.sql import functions as F

    n = 2000
    got = {
        r["k"]: r["s"]
        for r in spark.range(n)
        .select(F.col("id").alias("k"), hash_split(F.col("id")).alias("s"))
        .collect()
    }
    duck = dict(
        duckdb.sql(
            f"SELECT k, {hash_split_sql('k')} AS s FROM range({n}) t(k)"
        ).fetchall()
    )
    assert got == duck
    from collections import Counter

    frac = Counter(got.values())
    assert abs(frac["train"] / n - 0.6) < 0.05
    assert abs(frac["val"] / n - 0.2) < 0.05
    assert abs(frac["test"] / n - 0.2) < 0.05
