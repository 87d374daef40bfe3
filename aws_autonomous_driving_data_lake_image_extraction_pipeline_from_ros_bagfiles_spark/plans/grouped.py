"""Grouped-map and split-reader queries (q51-q52)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register


# --------------------------------------------------------------------------
# q51 — grouped-map normalization (applyInPandas): per-label z-score of the
# first embedding component. The grouped-map pattern is the engine's
# designated escape hatch for per-group imperative logic (U-family); the
# oracle reproduces the same sample-std z-score in SQL, proving the pandas
# path computes exactly what the declarative form would.
# --------------------------------------------------------------------------
@register(
    "q51_grouped_zscore",
    oracle="""
    SELECT vec_id, label,
           round((CAST(embedding[1] AS DOUBLE) - avg(CAST(embedding[1] AS DOUBLE)) OVER (PARTITION BY label))
                 / stddev_samp(CAST(embedding[1] AS DOUBLE)) OVER (PARTITION BY label), 4) AS z
    FROM embeddings
    """,
)
def q51_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.element_at("embedding", 1).cast("double").alias("x")
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].astype("float64")
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame({"vec_id": pdf["vec_id"], "label": pdf["label"], "z": z.round(4)})

    return emb.groupBy("label").applyInPandas(zscore, schema="vec_id bigint, label int, z double")


# --------------------------------------------------------------------------
# q53 — salted skew-safe aggregation: two-phase (keys+salt partial, keys
# merge) groupBy over events, oracle-checked against the direct groupBy —
# proving the decomposition is exact for algebraic aggregates. At scale
# this is the pattern for a hot camera/user key whose group exceeds one
# task's memory; AQE handles join skew but not aggregation skew.
# --------------------------------------------------------------------------
@register(
    "q53_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(max(value), 3) AS max_value,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q53_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    events = load(spark, sf_dir, "events")
    out = salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "value"),
            "max_value": ("max", "value"),
            "sum_value": ("sum", "value"),
        },
        salt_n=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("max_value", 3).alias("max_value"),
        F.round("sum_value", 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# q52 — chunk-split bag decode (rows-only): the splittable reader driven as
# a query — write the fixture bag to a temp file, layout-scan, decode with
# one task per chunk, aggregate. Counts must match q32's sequential decode.
# --------------------------------------------------------------------------
@register("q52_bag_split_decode")
def q52_bag_split_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.rosbag_fixtures import build_demo_bag
    from ..sources.rosbag_split import read_bags_split

    work = tempfile.mkdtemp(prefix="bag_split_")
    try:
        path = os.path.join(work, "demo.bag")
        with open(path, "wb") as f:
            f.write(build_demo_bag(n_frames=8, top_level_connections=True))
        rec = read_bags_split(spark, [path])
        out = (
            rec.groupBy("topic", "msg_type")
            .agg(
                F.count("*").alias("n_msgs"),
                F.min("ros_time").alias("min_ros_time"),
                F.max("ros_time").alias("max_ros_time"),
            )
            .orderBy("topic")
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
