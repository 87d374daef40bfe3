"""Distributed exact order-statistic selection.

Selecting the k-th smallest value of a column is the primitive behind
split-conformal calibration (q188), exact (non-interpolated) quantiles
and trimmed thresholds. The naive form — ``row_number()`` over a global
``ORDER BY`` — funnels every row through ONE task, a single-executor
sort that breaks at warehouse scale. This operator locates the k-th
element with a bounded histogram pass instead:

1. one aggregate for (count, min, max);
2. a B-bucket equi-width range histogram (the shuffle carries B rows);
3. the driver walks the B cumulative counts to find the bucket holding
   rank k (a B-sized list — O(1) driver memory);
4. only that bucket — expected n/B rows — is sorted for the
   within-bucket rank.

Exact for any distribution (the k-th smallest of a multiset does not
depend on tie order); adversarial skew only inflates the final bucket
sort back toward n, and the degenerate all-equal column short-circuits
at step 2 (mn == mx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_kth_smallest(
    df: DataFrame, col: str, k: int, buckets: int = 1024
) -> DataFrame:
    """One-row frame ``[col]`` holding the k-th smallest value (1-indexed,
    NULLs excluded); empty frame when k < 1 or k > count — mirroring the
    ``row_number() == k`` window idiom it replaces. ``df`` is scanned up
    to three times (stats, histogram, target bucket): persist or
    materialize upstream when the lineage is expensive.
    """
    spark = df.sparkSession
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    # Degenerate paths must carry the SAME schema as the main path (the
    # source column's type), not a hard-coded double.
    out_schema = vals.select(F.col("v").alias(col)).schema
    empty = spark.createDataFrame([], out_schema)
    if k < 1:
        return empty
    st = vals.agg(
        F.count("*").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx")
    ).first()
    if k > st["n"]:  # count(*) is 0 on empty input, never NULL
        return empty
    if st["mn"] == st["mx"]:  # all-equal: the k-th smallest IS that value
        return spark.createDataFrame([(st["mn"],)], out_schema)
    mn, mx = float(st["mn"]), float(st["mx"])
    width = (mx - mn) / buckets
    bkt = F.least(
        F.floor((F.col("v") - mn) / width).cast("int"), F.lit(buckets - 1)
    )
    hist = vals.groupBy(bkt.alias("bkt")).count().orderBy("bkt").collect()
    cum = 0
    target, rank_in = None, 0
    for row in hist:
        if cum + row["count"] >= k:
            target, rank_in = row["bkt"], k - cum
            break
        cum += row["count"]
    w = Window.orderBy("v")  # single task over ONE bucket (~n/B rows)
    return (
        vals.filter(bkt == target)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == rank_in)
        .select(F.col("v").alias(col))
    )
