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


# Bucketed-layout registry: (applicationId, sf_dir, table) -> catalog table
# name. When a fact table has been materialized with a bucketed layout
# (the one-time ingest cost a 100 TB deployment pays once), load() serves
# the bucketed table and every equi-join/aggregate on the bucket key drops
# its Exchange. Reference analog: the per-topic/per-camera S3 prefix layout
# the pipeline writes (bagstream.py:251-252) IS a co-location scheme; Spark
# bucketing is the principled version.
_BUCKETED: dict[tuple[str, str, str], str] = {}

# The fact tables worth bucketing and their join keys.
DEFAULT_BUCKET_SPECS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def bucketed_table_name(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Catalog name for a bucketed materialization — unique per
    (application, exact sf_dir, table).

    The token carries an md5 of the RAW sf_dir: the readable ``\\W+``
    squash alone let distinct dirs ('sf0.1' vs 'sf0_1') collide onto one
    name, silently serving the wrong dataset (r8 review). The
    applicationId suffix makes the name — and its managed warehouse
    location — private to this session: the in-memory catalog never saw
    other processes' tables anyway (cross-session reuse never existed),
    and the previous reclaim of a name-colliding leftover directory
    rmtree'd what could be ANOTHER LIVE PROCESS's bucketed data (r8
    review). The warehouse itself is a per-process /tmp dir
    (session.py), swept at interpreter exit; crashed runs leave the
    whole pid-tagged dir behind, which
    session.sweep_stale_warehouses() (run by bench.py end-of-run)
    reclaims once the pid is dead (ADVICE r8).
    """
    import hashlib
    import re

    token = re.sub(r"\W+", "_", sf_dir.strip("/"))
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    app = re.sub(r"\W+", "_", spark.sparkContext.applicationId)
    return f"{name}_bkt_{token}_{digest}_{app}"


def materialize_bucketed(
    spark: SparkSession,
    sf_dir: str,
    specs: dict[str, str] | None = None,
    buckets: int | None = None,
) -> dict[str, str]:
    """One-time bucketed materialization of fact tables.

    Writes each table bucketBy(buckets, key).sortBy(key) into the session
    warehouse and registers it so subsequent :func:`load` calls serve the
    bucketed layout. Joins between tables bucketed on the same key count
    and aggregates on the bucket key then require NO shuffle — the layout
    cost is paid once at ingest, not per query, which is the point at
    100 TB. Returns {table: catalog_name}.
    """
    specs = specs or DEFAULT_BUCKET_SPECS
    buckets = buckets or spark.sparkContext.defaultParallelism
    app = spark.sparkContext.applicationId
    out: dict[str, str] = {}
    for name, key in specs.items():
        tbl = bucketed_table_name(spark, sf_dir, name)
        if not spark.catalog.tableExists(tbl):
            # _read_source, not a raw parquet read: events needs its ts
            # normalization BEFORE the bucketed write, or the persisted
            # table would serve the raw physical type (bigint nanos /
            # timestamp_ntz) to every later load() (r8 review). The
            # app-scoped table name cannot pre-exist on disk, so no
            # leftover-location reclaim is needed (see
            # bucketed_table_name).
            (
                _read_source(spark, sf_dir, name)
                .write.mode("overwrite")
                .bucketBy(buckets, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )
        _BUCKETED[(app, sf_dir, name)] = tbl
        out[name] = tbl
    return out


def registered_bucketed(spark: SparkSession, sf_dir: str) -> set:
    """Names currently routed to the bucketed layout for this sf_dir."""
    app = spark.sparkContext.applicationId
    return {name for (a, d, name) in _BUCKETED if a == app and d == sf_dir}


def deregister_bucketed(spark: SparkSession, sf_dir: str, names) -> None:
    """Remove registry entries so load() reverts to plain parquet WITHOUT
    dropping the catalog tables — the physical layout stays for reuse
    (materialize_bucketed finds the table and skips the rewrite). Used by
    callers that must not leave session-global routing behind (q199)."""
    app = spark.sparkContext.applicationId
    for name in names:
        _BUCKETED.pop((app, sf_dir, name), None)


def drop_bucketed(spark: SparkSession, sf_dir: str) -> None:
    """Deregister + drop this sf_dir's bucketed tables (test/bench cleanup)."""
    app = spark.sparkContext.applicationId
    for (a, d, name) in [k for k in _BUCKETED if k[0] == app and k[1] == sf_dir]:
        spark.sql(f"DROP TABLE IF EXISTS {_BUCKETED.pop((a, d, name))}")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    bucketed = _BUCKETED.get((spark.sparkContext.applicationId, sf_dir, name))
    if bucketed is not None:
        return spark.table(bucketed)
    return _read_source(spark, sf_dir, name)


def _read_source(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table from its parquet source with per-table normalization —
    shared by load() and materialize_bucketed() so a bucketed layout can
    never persist a different schema than the plain path serves."""
    if name == "events":
        # events.parquet's `ts` physical type has varied across testdata
        # generations (TIMESTAMP(NANOS) stored as int64 vs plain micros
        # TIMESTAMP without UTC adjustment). Normalize every generation to
        # TimestampType (micros, UTC session) so downstream plans and
        # oracles see one type:
        #   - nanos-as-bigint: integer `DIV 1000` stays in the bigint
        #     domain (a double roundtrip would lose precision at 1e18) and
        #     matches DuckDB's nanos->micros truncation;
        #   - TIMESTAMP_NTZ (micros, no tz): cast — value-preserving under
        #     the UTC session timezone, and DuckDB's TIMESTAMP is NTZ with
        #     the same wall-clock values.
        #
        # DELIBERATE session-wide conf change (there is no per-read option
        # for this legacy flag, and restoring it after load() would break
        # the lazily-executed scan): any later nanos-parquet read in the
        # session will also surface as bigint. Scoped alternatives don't
        # exist until Spark grows a reader option; documented here and in
        # the verify skill.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce an events frame's ``ts`` to TimestampType whatever the
    physical source type was (see load() for the per-generation rationale).
    Streaming readers that scan events.parquet directly need this too —
    their micro-batch frames carry the raw reader type."""
    ts_type = dict(df.dtypes).get("ts", "")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
