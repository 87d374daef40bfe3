"""ROS-time and timestamp helpers (SURVEY §2.8 F1, F3, F11).

The reference packs ROS time as a 64-bit int ``(nsec << 32) | sec`` and
formats it as an ISO string with ``:`` replaced by ``_`` for S3-key safety
(reference service/app/bagstream.py:212-216, 222-223); the enrich Lambda
parses the string back out of the filename at query time
(reference infrastructure/process-queue-sync/process-queue-sync.py:38-44).

All helpers are Catalyst column expressions — bit ops, ``timestamp_micros``
and ``date_format`` stay inside whole-stage codegen, so the 100 TB scan
never leaves the JVM for a timestamp decode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ISO_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def ros_time_pack(ts: Column) -> Column:
    """Timestamp -> 64-bit ROS time ``(nsec << 32) | sec``.

    Matches the wire layout decoded at bagstream.py:222-223. Microsecond
    precision (parquet timestamps are micros); nsec = micros*1000 < 2^30 so
    the shifted value fits a signed 64-bit int.

    EXACT integer arithmetic for the seconds split: the previous float
    ``epoch_us / 1e6`` + truncating cast loses to double rounding once
    epoch_us outgrows the 2^53 mantissa headroom (a quotient sitting one
    micro below a whole second can round UP before the cast, shifting sec
    by 1 where the oracle's integer ``//`` doesn't). Remainder-then-
    subtract in the integer/decimal domain is truncation-exact at every
    magnitude and matches DuckDB's sign-of-dividend ``%`` / truncating
    ``//`` pre-epoch as well.
    """
    epoch_us = F.unix_micros(ts)
    # Pre-epoch stamps are out of domain (ROS time is unsigned sec/nsec):
    # a negative remainder would pack a negative nsec field that Spark's
    # shiftleft silently accepts while DuckDB's negative shift errors
    # loudly (r8 review). Fail the SAME way on both engines. NULL stamps
    # stay NULL-propagating (assert_true(NULL) would THROW, diverging
    # from the oracle's NULL row — r8 round-diff review).
    guard = F.assert_true(
        epoch_us.isNull() | (epoch_us >= F.lit(0)),
        F.lit("ros_time_pack: pre-epoch timestamp is outside the ROS time domain"),
    )
    rem = epoch_us % F.lit(1_000_000)  # sign-of-dividend, as DuckDB's %
    sec = (
        (epoch_us - rem).cast("decimal(20,0)") / F.lit(1_000_000)
    ).cast("bigint")
    packed = F.shiftleft(rem * F.lit(1000), 32).bitwiseOR(sec)
    return F.when(guard.isNull(), packed)  # guard is always NULL when it passes


def ros_time_unpack_ts(packed: Column) -> Column:
    """64-bit ROS time -> TimestampType (microsecond precision).

    ``sec = t & 0xFFFFFFFF``; ``us = (t >> 32) / 1000`` — the exact decode
    at bagstream.py:212-216.
    """
    sec = packed.bitwiseAND(F.lit(0xFFFFFFFF))
    micros = (F.shiftright(packed, 32) / F.lit(1000)).cast("bigint")
    return F.timestamp_micros(sec * F.lit(1_000_000) + micros)


def ros_time_to_iso(packed: Column) -> Column:
    """64-bit ROS time -> ISO-8601 string (microseconds, no zone)."""
    return F.date_format(ros_time_unpack_ts(packed), _ISO_US)


def iso_for_path(ts: Column) -> Column:
    """ISO string with ``:`` -> ``_`` (S3-key-safe; bagstream.py:216)."""
    return F.translate(F.date_format(ts, _ISO_US), ":", "_")


def iso_from_path(s: Column) -> Column:
    """Inverse of :func:`iso_for_path` -> TimestampType.

    Mirrors process-queue-sync.py:38-44 (``_`` -> ``:`` then fromisoformat).
    """
    return F.to_timestamp(F.translate(s, "_", ":"), _ISO_US)


def now_iso() -> Column:
    """Current time as ISO string (F11; process-queue-sync.py:167)."""
    return F.date_format(F.current_timestamp(), _ISO_US)
