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
