"""Typed per-topic views over the long-format decoded record table.

The reference writes one CSV per connection with a schema inferred from
``msg.__slots__`` (lazy header, bagstream.py:324-342) and five fixed
hand-written schemas (:379-384). Spark's analog of that "dynamic schema"
problem (SURVEY §7.3): keep the decode output in ONE long DataFrame with a
JSON payload column, then carve typed views with fixed ``from_json``
schemas per message type — schema discovery is a metadata pass over
``msg_type``, not a second data scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ros_time_to_iso, ros_time_unpack_ts

PAYLOAD_SCHEMAS = {
    "nav_msgs/Odometry": (
        "pos_x double, pos_y double, pos_z double, "
        "ori_x double, ori_y double, ori_z double, ori_w double, "
        "lin_x double, lin_y double, lin_z double"
    ),
    "sensor_msgs/LaserScan": (
        "angle_min double, angle_max double, angle_increment double, "
        "time_increment double, scan_time double, range_min double, range_max double"
    ),
    "geometry_msgs/Wrench": (
        "force_x double, force_y double, force_z double, "
        "torque_x double, torque_y double, torque_z double"
    ),
    "std_msgs/String": "data string",
}


def with_time_columns(records: DataFrame) -> DataFrame:
    """Add decoded ts/iso columns (F1: bagstream.py:212-216)."""
    return records.withColumn("ts", ros_time_unpack_ts(F.col("ros_time"))).withColumn(
        "iso", ros_time_to_iso(F.col("ros_time"))
    )


def topic_view(records: DataFrame, msg_type: str) -> DataFrame:
    """Typed view for one message type: filter + from_json + flatten.

    The msg_type filter lands before the JSON parse, so Catalyst skips
    deserializing other connections' payloads — the optional pushdown the
    reference hints at via `topics_to_extract` (SURVEY §4.2 note).
    """
    schema = PAYLOAD_SCHEMAS.get(msg_type)
    base = with_time_columns(records.filter(F.col("msg_type") == msg_type))
    if schema is None:
        return base
    parsed = base.withColumn("p", F.from_json("payload_json", schema))
    return parsed.select("bag", "topic", "ts", "iso", "seq", "frame_id", "p.*")


def image_view(records: DataFrame) -> DataFrame:
    """Frames table (B2 image schema): binary + typed metadata columns —
    the multimodal-column layout (binary payload, queryable metadata)."""
    return with_time_columns(
        records.filter(F.col("msg_type") == "sensor_msgs/Image")
    ).select(
        "bag", "topic", "ts", "iso", "seq",
        "img_encoding", "img_width", "img_height", "img_data",
    )
