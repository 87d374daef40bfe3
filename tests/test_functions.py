"""Unit tests for the scalar function kit (F4-F9, F22, P4 router)."""

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.functions.paths import (
    basename,
    camera_from_dir,
    dirname,
    extension_rewrite,
    frame_index,
    key_root,
    normalize_label,
    sanitize_name,
    strip_bucket_arn,
)


def test_path_algebra(spark):
    df = spark.createDataFrame(
        [("front01/image_raw-2020-12-16T23_32_19.969307-0002.png",
          "arn:aws:s3:::my-bucket", "some name!w/chars", "Mobile Phone")],
        "key string, arn string, raw string, label string",
    )
    r = df.select(
        basename(F.col("key")).alias("base"),
        dirname(F.col("key")).alias("dir"),
        key_root(F.col("key"), 1).alias("root"),
        camera_from_dir(key_root(F.col("key"), 1)).alias("camera"),
        frame_index(basename(F.col("key"))).alias("idx"),
        extension_rewrite(F.col("key"), "png", "json").alias("json_key"),
        strip_bucket_arn(F.col("arn")).alias("bucket"),
        sanitize_name(F.col("raw"), 8).alias("clean"),
        normalize_label(F.col("label")).alias("attr"),
    ).first()
    assert r.base == "image_raw-2020-12-16T23_32_19.969307-0002.png"
    assert r.dir == "front01"
    assert r.root == "front01"
    assert r.camera == "front"
    assert r.idx == 2020  # first digit run, as in the reference's regex (F9)
    assert r.json_key.endswith("-0002.json")
    assert r.bucket == "my-bucket"
    assert r.clean == "somename"
    assert r.attr == "Mobile_Phone"


def test_mp4_vs_bag_router(spark):
    """P4/S8: suffix router as when/otherwise (s3batch.py:57-61)."""
    df = spark.createDataFrame(
        [("a/run1.bag",), ("b/cam.mp4",), ("c/notes.txt",)], "key string"
    )
    routed = df.select(
        "key",
        F.when(F.col("key").endswith(".mp4"), "job_queue")
        .when(F.col("key").endswith(".bag"), "bag_queue")
        .otherwise("reject")
        .alias("route"),
    )
    assert {r.key: r.route for r in routed.collect()} == {
        "a/run1.bag": "bag_queue",
        "b/cam.mp4": "job_queue",
        "c/notes.txt": "reject",
    }


def test_ros_time_pack_integer_exact_edges(spark):
    """ros_time_pack must agree with the q20 oracle's integer arithmetic
    ((epoch_us % 1e6) * 1000 << 32 | epoch_us // 1e6) at the edge the
    float path got wrong: far-future micros where double rounding could
    shift sec by 1 before the truncating cast. Pre-epoch stamps are OUT
    of the contract's domain on both engines (DuckDB refuses to
    left-shift the negative nsec with an Out of Range error — loud, not
    divergent), so the parity sweep covers epoch..int64-ns-max."""
    import datetime as dt

    import duckdb

    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.functions.timeutil import (
        ros_time_pack,
    )

    stamps = [
        dt.datetime(1970, 1, 1, 0, 0, 0, 0),
        dt.datetime(1970, 1, 1, 0, 0, 0, 999999),       # max nsec field
        dt.datetime(2024, 1, 30, 23, 57, 12, 194062),   # fixture-like
        dt.datetime(2262, 4, 11, 23, 47, 16, 854775),   # near int64-ns max
    ]
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    got = [
        r["p"]
        for r in df.select(ros_time_pack(F.col("ts")).alias("p")).collect()
    ]
    want = [
        duckdb.sql(
            f"SELECT ((epoch_us(TIMESTAMP '{t}') % 1000000) * 1000 << 32)"
            f" | (epoch_us(TIMESTAMP '{t}') // 1000000)"
        ).fetchone()[0]
        for t in stamps
    ]
    assert got == want

    # Out-of-domain parity (r8): a pre-epoch stamp must fail LOUDLY on
    # Spark too (assert_true guard), matching DuckDB's Out of Range on
    # the negative shift — not silently pack a negative nsec field.
    import pytest
    from pyspark.errors import SparkRuntimeException

    pre = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 59, 59, 500000),)], "ts timestamp"
    )
    with pytest.raises(SparkRuntimeException, match="pre-epoch"):
        pre.select(ros_time_pack(F.col("ts")).alias("p")).collect()

    # NULL stamps stay NULL-propagating (not a guard failure) — matching
    # the oracle's NULL row (r8 round-diff review)
    nul = spark.createDataFrame([(None,)], "ts timestamp")
    assert nul.select(ros_time_pack(F.col("ts")).alias("p")).first()["p"] is None
