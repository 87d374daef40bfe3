"""Privacy-preserving release (q167): differentially-private counts via
the Laplace mechanism with DETERMINISTIC hash-seeded noise.

Publishing per-(event_type, day) activity counts from a user-event
table is the canonical DP use case. The mechanism is textbook Laplace
with sensitivity 1: noise ~ Lap(1/eps) added to every cell, negatives
clamped to 0.

Guarantee granularity — EVENT-level DP, not user-level: sensitivity 1
means neighboring datasets differ by ONE EVENT row. A user contributing
m events to a cell moves it by m, which Lap(1/eps) does not mask;
user-level DP requires bounding each user's contribution first (clamp
events-per-user-per-cell to c and cells-per-user to g, then calibrate
noise to sensitivity c*g — the standard contribution-bounding
preprocessing, one extra per-user rank window before the cell rollup).
The released table here protects single events, the common granularity
for activity telemetry.

Determinism (what makes this oracle-checkable): the uniform draw is not
an RNG but an md5 hash of the cell key + a fixed release salt — u =
md5-bits/2^48 in (0,1) — pushed through the Laplace inverse CDF
(-1/eps * sign(u-1/2) * ln(1-2|u-1/2|)). Both engines compute identical
doubles, so the released table is reproducible bit-for-bit: the
"seeded release" pattern real DP deployments use for audit replays.

Scale shape: one map-side-combinable groupBy to the cell level; the
noise is a per-row column expression over the (tiny) aggregate — no
Python, no RNG service, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

Q167_EPS = 0.5
Q167_SALT = "release-2024w1"
_TWO48 = 281_474_976_710_656  # 2^48


@register(
    "q167_dp_count_release",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             count(*) AS true_count
      FROM events GROUP BY 1, 2
    ),
    noised AS (
      SELECT event_type, day, true_count,
             CAST('0x' || substr(md5(event_type || '|' || day ||
                                     '|{Q167_SALT}'), 1, 12) AS BIGINT)
                 * 1.0 / {_TWO48} AS u
      FROM cells
    ),
    lap AS (
      SELECT event_type, day, true_count,
             round(-(1.0 / {Q167_EPS}) * sign(u - 0.5)
                   * ln(1 - 2 * abs(u - 0.5))) AS noise
      FROM noised
    )
    SELECT event_type, day,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(noise AS BIGINT) AS noise,
           CAST(greatest(0, true_count + noise) AS BIGINT) AS released_count
    FROM lap
    """,
)
def q167_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.count("*").alias("true_count"))
    # null-PROPAGATING concat (F.concat, not concat_ws): the oracle's ||
    # nullifies the whole hash input when a key is NULL, so a NULL
    # event_type must yield NULL noise on the Spark side too — concat_ws
    # would silently skip the null and hash "day|salt" into real noise,
    # a guaranteed hash-gate mismatch on the first fixture with null keys
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_type"),
                        F.lit("|"),
                        F.col("day"),
                        F.lit("|" + Q167_SALT),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        * F.lit(1.0)
        / _TWO48
    )
    noise = F.round(
        -(1.0 / Q167_EPS)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return cells.select(
        "event_type",
        "day",
        F.col("true_count").cast("bigint").alias("true_count"),
        noise.cast("bigint").alias("noise"),
        F.greatest(F.lit(0), F.col("true_count") + noise)
        .cast("bigint")
        .alias("released_count"),
    )
