"""JSON / nested / array / time queries (SURVEY §2 M2 pack).

Covers the reference's schema-on-read JSON handling (F16; Rekognition label
documents, process-queue-sync.py:18-35), the VRU exists-predicate (P6,
select-labelling-imgs.py:36-55), positional array zips (J3/F23, ipynb cell
13), bbox arithmetic (F12-F15), ROS-time packing (F1), and the tumbling
window the reference only had implicitly via frame_duration (ST6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bbox import bbox_normalize
from ..functions.timeutil import ros_time_pack, ros_time_to_iso
from ..tables import load
from .registry import register


# --------------------------------------------------------------------------
# q16 — JSON field extraction (F16: json.loads of event payloads).
# get_json_object is codegen'd JSON path evaluation — no Python, pushes the
# props column alone through the scan.
# --------------------------------------------------------------------------
@register(
    "q16_json_extract",
    oracle="""
    SELECT event_type,
           CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def q16_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    raw = F.get_json_object("props", "$.k")
    k = raw.cast("bigint")
    return events.groupBy("event_type").agg(
        # count the RAW extraction, matching the oracle's
        # count(json_extract_string(...)): a non-numeric k value is
        # "present" for n_with_k even though its bigint cast is NULL
        F.count(raw).alias("n_with_k"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


# --------------------------------------------------------------------------
# q17 — exists predicate over an array (P6: the VRU gate — does any
# annotation name fall in the qualifying set?). Tokenization + higher-order
# `exists` stays entirely in codegen; at 100 TB this is a pure scan+filter
# with no shuffle.
# --------------------------------------------------------------------------
@register(
    "q17_exists_predicate",
    oracle="""
    SELECT doc_id, lang,
           CAST(list_has_any(string_split(text, ' '), ['join', 'merge']) AS INT) AS has_join_family,
           CAST(list_has_any(string_split(text, ' '), ['window']) AS INT) AS has_window
    FROM documents
    WHERE list_has_any(string_split(text, ' '), ['join', 'merge', 'window'])
    """,
)
def q17_exists_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    has = lambda *words: F.arrays_overlap(toks, F.array(*[F.lit(w) for w in words]))  # noqa: E731
    return (
        docs.filter(has("join", "merge", "window"))
        .select(
            "doc_id",
            "lang",
            has("join", "merge").cast("int").alias("has_join_family"),
            F.exists(toks, lambda t: t == "window").cast("int").alias("has_window"),
        )
    )


# --------------------------------------------------------------------------
# q18 — positional array access + zip (J3/F23: confidence[i] zipped onto
# annotations[i]). Dot product of two slices of the embedding via
# zip_with + aggregate — the exact pattern the similarity operators use.
# Elements cast to double BEFORE multiply/accumulate on both sides so the
# float32 -> float64 widening happens at the same point.
# --------------------------------------------------------------------------
@register(
    "q18_array_zip_dot",
    oracle="""
    SELECT vec_id, label,
           round(CAST(embedding[1] AS DOUBLE) * CAST(embedding[5] AS DOUBLE)
               + CAST(embedding[2] AS DOUBLE) * CAST(embedding[6] AS DOUBLE)
               + CAST(embedding[3] AS DOUBLE) * CAST(embedding[7] AS DOUBLE)
               + CAST(embedding[4] AS DOUBLE) * CAST(embedding[8] AS DOUBLE), 6) AS dot_head
    FROM embeddings
    """,
)
def q18_array_zip_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = F.slice("embedding", 1, 4)
    b = F.slice("embedding", 5, 4)
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    return emb.select("vec_id", "label", F.round(dot, 6).alias("dot_head"))


# --------------------------------------------------------------------------
# q19 — bbox arithmetic (F12-F15): synthesize deterministic pixel boxes
# from part columns, normalize to ratios and convert to corners — the
# Ground-Truth LST math (ipynb cell 19) as pure column expressions.
# --------------------------------------------------------------------------
@register(
    "q19_bbox_math",
    oracle="""
    SELECT p_partkey,
           round(CAST(p_partkey % 700 AS DOUBLE) / 800, 6) AS xmin,
           round(CAST(p_partkey % 500 AS DOUBLE) / 600, 6) AS ymin,
           round((CAST(p_partkey % 700 AS DOUBLE) + p_size) / 800, 6) AS xmax,
           round((CAST(p_partkey % 500 AS DOUBLE) + p_size) / 600, 6) AS ymax
    FROM part
    WHERE p_size >= 10
    """,
)
def q19_bbox_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    box = bbox_normalize(
        (F.col("p_partkey") % 700).cast("double"),
        (F.col("p_partkey") % 500).cast("double"),
        F.col("p_size").cast("double"),
        F.col("p_size").cast("double"),
        F.lit(800.0),
        F.lit(600.0),
    )
    return part.select(
        "p_partkey",
        F.round(box["xmin"], 6).alias("xmin"),
        F.round(box["ymin"], 6).alias("ymin"),
        F.round(box["xmax"], 6).alias("xmax"),
        F.round(box["ymax"], 6).alias("ymax"),
    )


# --------------------------------------------------------------------------
# q20 — ROS-time pack/decode roundtrip (F1: (nsec<<32)|sec wire format,
# bagstream.py:212-223). Bit ops + timestamp_micros stay in codegen.
# --------------------------------------------------------------------------
@register(
    "q20_ros_time_roundtrip",
    oracle="""
    WITH packed AS (
        SELECT event_id,
               (((epoch_us(ts) % 1000000) * 1000) << 32) | (epoch_us(ts) // 1000000) AS ros_time
        FROM events
    )
    SELECT event_id,
           ros_time,
           strftime(make_timestamp((ros_time & 4294967295) * 1000000
                                   + (ros_time >> 32) // 1000),
                    '%Y-%m-%dT%H:%M:%S.%f') AS iso
    FROM packed
    """,
)
def q20_ros_time_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    packed = ros_time_pack(F.col("ts"))
    return events.select(
        "event_id",
        packed.alias("ros_time"),
        ros_time_to_iso(packed).alias("iso"),
    )


# --------------------------------------------------------------------------
# q21 — tumbling event-time window (ST6: the reference's implicit
# frame_duration bucketing become a real window). window() is a plain
# projection + groupBy — one shuffle on (bucket, type).
# --------------------------------------------------------------------------
@register(
    "q21_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
