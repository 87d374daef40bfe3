"""Sketch-property pins for q115 (Count-Min) and q116 (Bloom filter).

The registry oracles hash-check exact sketch contents at sf0.01; these
tests pin the two STRUCTURAL guarantees on hand fixtures: CMS never
underestimates, and a Bloom filter never produces a false negative.
"""

import pytest


def _route(spark, tables):
    """monkeypatch-able load(): route table name -> fixture DataFrame."""
    return lambda _s, _d, name: tables[name]


def test_cms_never_underestimates(spark, monkeypatch):
    import aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches as S

    docs = spark.createDataFrame(
        [(1, "table table hash join"), (2, "table scan window scan")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(S, "load", _route(spark, {"documents": docs}))
    rows = {r["term"]: r for r in S.q115_count_min_sketch(spark, "x").collect()}
    assert rows["table"]["exact"] == 3
    assert rows["scan"]["exact"] == 2
    assert rows["zzz_absent"]["exact"] == 0
    for r in rows.values():
        assert r["est"] >= r["exact"]  # CMS structural guarantee
        assert r["overestimate"] == r["est"] - r["exact"]


def test_bloom_no_false_negatives(spark, monkeypatch):
    import aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches as S

    # every even custkey has orders; odd keys probe as ghosts
    orders = spark.createDataFrame(
        [(k,) for k in range(0, 200, 2)], "o_custkey long"
    )
    cust = spark.createDataFrame(
        [(k, k % 5) for k in range(200)], "c_custkey long, c_nationkey int"
    )
    monkeypatch.setattr(S, "load", _route(spark, {"orders": orders, "customer": cust}))
    out = S.q116_bloom_join_filter(spark, "x").collect()
    assert sum(r["n_probes"] for r in out) == 200
    for r in out:
        # no false negatives: every true member passes the filter
        assert r["n_bloom_pass"] >= r["n_true"]
        assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_true"]
    # all even probes are true members (ghost-shifted odds are not)
    assert sum(r["n_true"] for r in out) == 100


def test_bloom_bit_determinism(spark):
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches import (
        Q116_WORDS,
        _bloom_bit,
    )

    df = spark.createDataFrame([(42,), (42,), (7,)], "k long")
    bits = [
        r["b"] for r in df.select(_bloom_bit(F.col("k"), 0).alias("b")).collect()
    ]
    assert bits[0] == bits[1]
    assert 0 <= bits[0] < Q116_WORDS * 32


def test_q126_sketch_within_bin_width_of_exact(spark):
    # the histogram read-off must land within one bin width of the exact
    # interpolated percentile (the sketch's error bound) — asserted here,
    # NOT inside the serving plan
    import __spark_entry__ as se
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches import (
        Q126_PS,
        Q126_W,
    )

    sf = "/root/testdata/sf0.001"
    est = {
        r.p: r.est
        for r in se.queries()["q126_histogram_quantiles"](spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    from pyspark.sql import functions as F

    exact = li.agg(
        *[
            F.expr(f"percentile(l_extendedprice, {p})").alias(f"p{i}")
            for i, p in enumerate(Q126_PS)
        ]
    ).collect()[0]
    for i, p in enumerate(Q126_PS):
        assert abs(est[p] - exact[f"p{i}"]) <= Q126_W


def test_q126_cumulative_window_is_bounded(spark):
    # the unpartitioned window must consume the HISTOGRAM (one row per
    # bin), never raw lineitem rows: its input aggregate keys on `bin`
    import __spark_entry__ as se

    df = se.queries()["q126_histogram_quantiles"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    win_input = plan.split("Window [")[-1]
    # between the window and the scan sits the bin aggregate (with a
    # map-side partial), so the window sorts histogram rows, not data rows
    assert "HashAggregate" in win_input.split("FileScan")[0]
    assert "partial_count" in win_input.split("FileScan")[0]


def test_hll_rho_integer_exact_at_power_of_two(spark):
    """The HLL register value must come from integer bit arithmetic: a
    float floor(log2(w)) rides a libm boundary at exact powers of two
    (JVM StrictMath vs DuckDB libm are different 1-ulp implementations),
    flipping rho by 1 on exactly the w values most likely to be register
    maxima. Pins rho = WBITS - floor(log2 w) for boundary w on BOTH the
    Spark expression and its DuckDB twin."""
    import duckdb

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.sketches import (
        _HLL_RHO_SQL,
        Q158_WBITS,
        _hll_rho,
    )

    cases = {0: Q158_WBITS + 1, 1: Q158_WBITS, 7: Q158_WBITS - 2,
             8: Q158_WBITS - 3, 512: Q158_WBITS - 9,
             (1 << 47): 1, (1 << 48) - 1: 1}
    df = spark.createDataFrame([(w,) for w in cases], "w long")
    got = {r["w"]: r["rho"] for r in df.select("w", _hll_rho().alias("rho")).collect()}
    assert got == cases
    vals = ", ".join(f"({w})" for w in cases)
    duck = dict(
        duckdb.sql(
            f"SELECT w, {_HLL_RHO_SQL} AS rho FROM (VALUES {vals}) t(w)"
        ).fetchall()
    )
    assert duck == cases
