"""Loaders for the engine's canonical tables.

The driver's synthetic tables (TESTDATA.md) stand in for the reference's
data products: ``events`` plays the per-topic message stream (ts = ROS
time, event_type = topic, props = payload; reference bagstream.py:219-238),
``documents``/``embeddings`` back the beyond-reference dedup / similarity /
text operators.

All loads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown, column pruning and partition pruning — do not ``.cache()`` here;
at 100 TB the tables do not fit and caching defeats scan pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read the raw int64 nanos and convert to a real
        # TimestampType (micros) with integer division — `DIV` stays in the
        # bigint domain (a double roundtrip would lose precision at 1e18).
        # DuckDB performs the identical nanos->micros truncation, so oracle
        # comparisons agree.
        #
        # DELIBERATE session-wide conf change (there is no per-read option
        # for this legacy flag, and restoring it after load() would break
        # the lazily-executed scan): any later nanos-parquet read in the
        # session will also surface as bigint. Scoped alternatives don't
        # exist until Spark grows a reader option; documented here and in
        # the verify skill.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(table_path(sf_dir, name))
