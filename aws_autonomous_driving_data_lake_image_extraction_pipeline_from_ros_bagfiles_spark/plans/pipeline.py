"""Reference-pipeline queries (SURVEY §3 entry points re-expressed).

q32/q33 run the real binary bag decoder and image kit on synthesized
fixtures (genuinely non-SQL-expressible -> rows-only checks); q34 runs the
full enrich pipeline (detector -> explode -> pivot-max -> counts) with the
SQL-expressible stub detector so the *entire* EP2 path is oracle-checked;
q35 proves the streaming max-upsert is batch-equivalent (its oracle is the
plain batch aggregation); q36 is the 60/20/20 split (A8).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.detections import detections_wide, explode_labels, stub_detector
from ..operators.frames import with_frame_filenames, with_frame_ids
from ..operators.images import decode_frames
from ..sources.rosbag import decode_bag_df
from ..sources.rosbag_fixtures import build_demo_bag
from ..sources.topic_views import image_view
from ..tables import load
from .registry import materialize, register

_DETECTION_VOCAB = ["Person", "Car", "Bicycle", "Truck", "Motorcycle"]


_DEMO_CACHE: dict[str, DataFrame] = {}


def _demo_records(spark: SparkSession) -> DataFrame:
    """Decoded demo-bag records, memoized per session — q32 and q33 share
    one decode instead of spinning the mapInPandas worker twice.

    Keyed by applicationId, which is unique per SparkContext — ``id(spark)``
    could be reused by a new session after the old one is GC'd, handing out
    a localCheckpointed DataFrame bound to a dead session."""
    key = spark.sparkContext.applicationId
    if key not in _DEMO_CACHE:
        blob = build_demo_bag(n_frames=8, bz2_chunk=True)
        bags = spark.createDataFrame(
            [("memory://demo-0.bag", bytearray(blob))], "path string, content binary"
        ).coalesce(1)  # one bag -> one task; don't fan 32 python workers for it
        _DEMO_CACHE.clear()
        _DEMO_CACHE[key] = decode_bag_df(bags).localCheckpoint(eager=True)
    return _DEMO_CACHE[key]


# --------------------------------------------------------------------------
# q32 — the scan/ETL entry point (EP1): bag bytes -> typed record counts.
# Exercises record framing, connection registry, plain + bz2 chunks, and
# all five payload decoders. Non-SQL-expressible -> rows-only check.
# --------------------------------------------------------------------------
@register("q32_bag_decode")
def q32_bag_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = _demo_records(spark)
    return (
        rec.groupBy("topic", "msg_type")
        .agg(
            F.count("*").alias("n_msgs"),
            F.min("ros_time").alias("min_ros_time"),
            F.max("ros_time").alias("max_ros_time"),
        )
        .orderBy("topic")
    )


# --------------------------------------------------------------------------
# q33 — frame table build (K2/A3): decode images, assign frame ids, render
# reference-style filenames, decode pixel buffers. Rows-only.
# --------------------------------------------------------------------------
@register("q33_frame_table")
def q33_frame_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import encode_frames_png

    rec = _demo_records(spark)
    frames = with_frame_filenames(with_frame_ids(image_view(rec), tiebreak="seq"))
    decoded = decode_frames(frames)
    pngs = encode_frames_png(decoded)
    stats = pngs.select(
        "topic", "ts", "seq", "img_width", "img_height",
        F.length("png").alias("png_bytes"),
        (F.substring("png", 1, 8) == F.lit(b"\x89PNG\r\n\x1a\n")).alias("png_ok"),
    )
    names = frames.select("topic", "seq", "frame_id", "img_file")
    return names.join(stats, ["topic", "seq"]).orderBy("frame_id")


# --------------------------------------------------------------------------
# q56 — the select/anonymize path (EP3: select-labelling-imgs) end-to-end:
# stub label docs -> JSON label sink + read-back (K5/S10) -> VRU exists
# gate (P6) -> pixel-region blur (F20/K8) -> curated stats. Rows-only
# (pixel transforms are not SQL-expressible); the VRU gate and blur
# behavior are value-asserted in tests/test_e2e_paths.py.
# --------------------------------------------------------------------------
@register("q56_select_anonymize")
def q56_select_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import blur_regions, decode_frames
    from ..sources.topic_views import image_view as iv

    frames = iv(_demo_records(spark))
    labeled = frames.select(
        "bag", "topic", "ts", "seq",
        F.when(
            F.col("seq") % 2 == 0,
            F.array(F.struct(F.lit("Person").alias("Name"), F.lit(99.0).alias("Confidence"))),
        )
        .otherwise(
            F.array(F.struct(F.lit("Tree").alias("Name"), F.lit(88.0).alias("Confidence")))
        )
        .alias("annotations"),
    )
    work = tempfile.mkdtemp(prefix="anon_")
    try:
        # K5: label documents persisted as JSON beside the frames, then
        # read back (S10) — the json round-trip the reference does via S3
        labeled.select("bag", "seq", F.to_json("annotations").alias("labels_json")).write.mode(
            "overwrite"
        ).json(f"{work}/labels")
        label_docs = spark.read.json(f"{work}/labels")
        vru_keys = label_docs.filter(
            F.exists(
                F.from_json("labels_json", "array<struct<Name:string,Confidence:double>>"),
                lambda a: a["Name"].isin("Person", "Bicycle", "Motorcycle"),
            )
        ).select("bag", "seq")
        selected = frames.join(F.broadcast(vru_keys), ["bag", "seq"], "left_semi")
        boxed = decode_frames(selected).withColumn(
            "boxes",
            F.array(
                F.struct(F.lit(1).alias("x1"), F.lit(1).alias("y1"),
                         F.lit(4).alias("x2"), F.lit(4).alias("y2")),
                F.struct(F.lit(5).alias("x1"), F.lit(2).alias("y1"),
                         F.lit(7).alias("x2"), F.lit(5).alias("y2")),
            ),
        )
        curated = blur_regions(boxed).select(
            "topic", "seq", F.length("pixels").alias("n_bytes")
        )
        return materialize(curated)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q34 — the enrich path (EP2) end-to-end with the stub detector, fully
# oracle-checked: detector labels -> explode -> groupBy(ts_key, camera) ->
# pivot max-confidence per label + VRU counts. This is the reference's
# DynamoDB detections table as one declarative plan.
# --------------------------------------------------------------------------
@register(
    "q34_detections_e2e",
    oracle="""
    WITH labels AS (
        SELECT strftime(ts, '%Y-%m-%d') AS ts_key, event_type AS camera,
               ['Person','Car','Bicycle','Truck','Motorcycle'][CAST(event_id % 5 AS INT) + 1] AS label,
               round(value, 3) AS confidence,
               CAST(event_id % 3 + 1 AS INT) AS n_instances
        FROM events
        UNION ALL
        SELECT strftime(ts, '%Y-%m-%d'), event_type,
               'Person', round(value / 2, 3), 1
        FROM events WHERE event_id % 3 = 0
    )
    SELECT ts_key, camera,
           round(max(confidence) FILTER (WHERE label = 'Person'), 3) AS Person,
           round(max(confidence) FILTER (WHERE label = 'Car'), 3) AS Car,
           round(max(confidence) FILTER (WHERE label = 'Bicycle'), 3) AS Bicycle,
           round(max(confidence) FILTER (WHERE label = 'Truck'), 3) AS Truck,
           round(max(confidence) FILTER (WHERE label = 'Motorcycle'), 3) AS Motorcycle,
           CAST(coalesce(sum(n_instances) FILTER (WHERE label = 'Person'), 0) AS BIGINT) AS ped_count,
           CAST(coalesce(sum(n_instances) FILTER (WHERE label IN ('Bicycle','Motorcycle','Motorbike','Bike')), 0) AS BIGINT) AS wheeler_count
    FROM labels
    GROUP BY 1, 2
    """,
)
def q34_detections_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    framed = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("ts_key"),
        F.col("event_type").alias("camera"),
        stub_detector(F.col("event_id"), F.col("value")).alias("labels"),
    )
    long_df = explode_labels(framed)
    return detections_wide(long_df, _DETECTION_VOCAB)


# --------------------------------------------------------------------------
# q59 — THE reference use-case, verbatim: "query [the detections table] to
# find images of interest such as images containing cars" (README.md:9-13).
# Composes q34's wide table: filter frames whose Car confidence clears a
# threshold, rank by confidence WITHIN each day partition. The rank window
# is partitioned by ts_key on purpose: a global `Window.orderBy` funnels
# every qualifying frame through ONE reducer task (a single-partition
# exchange — the classic scale-killer), while per-day ranking shuffles by
# ts_key and parallelizes with the data. At 100 TB this reads a detections
# table partitioned by ts_key — a pruned scan + per-partition window, no
# recompute of the enrich path and no global funnel. (For a true global
# top-k you'd use orderBy().limit(k) → TakeOrderedAndProject instead.)
# --------------------------------------------------------------------------
@register(
    "q59_find_images_with_cars",
    oracle="""
    WITH labels AS (
        SELECT strftime(ts, '%Y-%m-%d') AS ts_key, event_type AS camera,
               ['Person','Car','Bicycle','Truck','Motorcycle'][CAST(event_id % 5 AS INT) + 1] AS label,
               round(value, 3) AS confidence
        FROM events
        UNION ALL
        SELECT strftime(ts, '%Y-%m-%d'), event_type, 'Person', round(value / 2, 3)
        FROM events WHERE event_id % 3 = 0
    ),
    detections AS (
        SELECT ts_key, camera,
               round(max(confidence) FILTER (WHERE label = 'Car'), 3) AS Car
        FROM labels GROUP BY 1, 2
    )
    SELECT ts_key, camera, Car,
           CAST(row_number() OVER (PARTITION BY ts_key ORDER BY Car DESC, camera) AS INT) AS rk
    FROM detections
    WHERE Car IS NOT NULL AND Car >= 90
    """,
)
def q59_find_images_with_cars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    wide = q34_detections_e2e(spark, sf_dir)
    w = Window.partitionBy("ts_key").orderBy(F.desc("Car"), F.asc("camera"))
    return (
        wide.filter(F.col("Car").isNotNull() & (F.col("Car") >= 90))
        .select("ts_key", "camera", "Car", F.row_number().over(w).alias("rk"))
    )


# --------------------------------------------------------------------------
# q35 — streaming/batch equivalence (ST1-ST3): availableNow stream over the
# events parquet through the checkpointed foreachBatch max-upsert, then the
# compacted state. The oracle is the plain batch aggregation — passing
# means the incremental pipeline converges to batch semantics.
# --------------------------------------------------------------------------
@register(
    "q35_streaming_upsert",
    oracle="""
    SELECT user_id, event_type, round(max(value), 3) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q35_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.upsert import max_upsert_stream, read_upsert_state
    from ..tables import table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = table_path(sf_dir, "events")
    schema = spark.read.parquet(src).schema  # raw reader type for ts
    # (ts is timestamp[us] in the driver data; nanosAsLong stays set so a
    # nanos-written variant of the table degrades to bigint, which
    # normalize_event_ts also handles)
    work = tempfile.mkdtemp(prefix="stream_upsert_")
    try:
        # the streaming file source wants a directory (it is the landing
        # zone the reference's S3-event queue maps to) — stage the parquet
        # into one via symlink
        import os

        os.makedirs(f"{work}/in")
        # abspath: a relative SF dir would resolve against the symlink's
        # OWN directory under /tmp and dangle (stream ingests nothing,
        # read_upsert_state then raises)
        os.symlink(os.path.abspath(src), f"{work}/in/events.parquet")
        max_upsert_stream(
            spark,
            f"{work}/in",
            schema,
            state_dir=f"{work}/state",
            checkpoint_dir=f"{work}/ckpt",
            key_cols=["user_id", "event_type"],
            value_col="value",
        )
        final = read_upsert_state(spark, f"{work}/state", ["user_id", "event_type"], "max_value")
        # materialize before the temp dir disappears
        out = final.select(
            "user_id", "event_type", F.round("max_value", 3).alias("max_value")
        )
        out = materialize(out)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# q36 — deterministic 60/20/20 split (A8: ipynb cell 18 / im2rec.py:76-99).
# randomSplit's sampling is engine-specific -> rows-only check on the split
# cardinalities; determinism itself is asserted in tests (same seed ->
# same assignment).
# --------------------------------------------------------------------------
@register("q36_random_split")
def q36_random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    train, val, test = docs.randomSplit([0.6, 0.2, 0.2], seed=42)
    parts = [
        train.select(F.lit("train").alias("split"), "doc_id"),
        val.select(F.lit("val").alias("split"), "doc_id"),
        test.select(F.lit("test").alias("split"), "doc_id"),
    ]
    union = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return union.groupBy("split").agg(F.count("*").alias("n_docs")).orderBy("split")
