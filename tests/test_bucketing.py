"""Bucketed co-located join: pre-bucketing both fact tables on the join
key removes the join-time shuffle entirely (SCALING.md's round-2 item for
q03-class fact-fact joins, demonstrated and plan-asserted here)."""

import shutil

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark):
    # warehouse.dir is a static conf; the session default (./spark-warehouse,
    # gitignored) is used and the tables dropped afterwards. Broadcast is
    # disabled so the planner picks the sort-merge join bucketing co-locates
    # (at sf0.001 both sides are broadcast-sized, which would hide the point).
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("orders_b")
        )
        (
            lineitem.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("lineitem_b")
        )
        joined = (
            spark.table("orders_b")
            .join(spark.table("lineitem_b"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join itself requires no Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # correctness unchanged vs direct join
        direct = (
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_load_serves_bucketed_layout(spark):
    """bench.py's layout step: after materialize_bucketed, the registry
    query q03 (fact-fact join) must read the bucketed tables through
    tables.load() and plan a join with NO exchange on either join key."""
    import __spark_entry__ as se
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.tables import (
        drop_bucketed,
        materialize_bucketed,
    )

    sf = "/root/testdata/sf0.001"
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        direct = sorted(map(tuple, se.queries()["q03_join_revenue"](spark, sf).collect()))
        materialize_bucketed(spark, sf, buckets=8)
        df = se.queries()["q03_join_revenue"](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert sorted(map(tuple, df.collect())) == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        drop_bucketed(spark, sf)
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_q199_bucketed_plan_has_no_join_exchange(spark):
    """q199 (VERDICT r4 #5): the registry query itself materializes the
    bucketed warehouse and its fact-fact join must plan with no Exchange
    on either join key — and still match the plain-parquet join values."""
    import __spark_entry__ as se
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.tables import (
        drop_bucketed,
    )

    sf = "/root/testdata/sf0.001"
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = se.queries()["q199_bucketed_join_revenue"](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        got = {r.o_orderpriority: (r.n_orders, r.n_lines, r.revenue) for r in df.collect()}
        orders = spark.read.parquet(f"{sf}/orders.parquet").filter("o_orderstatus <> 'F'")
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        import pyspark.sql.functions as F
        want = {
            r.o_orderpriority: (r.n_orders, r.n_lines, r.revenue)
            for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.countDistinct("o_orderkey").alias("n_orders"),
                F.count("*").cast("bigint").alias("n_lines"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            )
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        drop_bucketed(spark, sf)
        import shutil
        shutil.rmtree("spark-warehouse", ignore_errors=True)
