"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the package; this module only adapts the registry
to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans import (
    ORACLES,
    QUERIES,
)

# Importing the query modules populates the registry.
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans import (  # noqa: F401
    analytics,
    corpus_quality,
    curation,
    data_selection,
    dataprep,
    evaluation,
    events_analytics,
    graph_metrics,
    grouped,
    layout,
    llm_ops,
    modeling,
    multimodal,
    nested,
    pipeline,
    privacy,
    relational,
    reporting,
    select_trainprep,
    sessions,
    sketches,
    temporal,
    text_ir,
    tpch,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full enrich pipeline producing the queryable wide
    detections table — detector labels -> explode -> max-pivot per label +
    VRU counts, keyed (day, camera). This is literally the reference's
    headline capability ("a table containing all detection results ...
    which can be queried to find images of interest", README.md:9-13),
    here as one declarative plan (q34) over sf0.001.
    """
    return QUERIES["q34_detections_e2e"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; non-SQL-expressible operators
    are intentionally absent (driver records a rows-only check)."""
    return dict(ORACLES)
