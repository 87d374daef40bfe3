"""Property-based tests (hypothesis): invariants that hold for ALL inputs,
not just the fixtures — the codec round-trip, decoder failure containment,
and the salted-aggregation ≡ plain-aggregation equivalence the skew
mitigation depends on.

Spark-backed properties cap ``max_examples`` (each example is a job) and
disable deadlines; the pure-Python codec properties run at full default
example counts.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.functions.png import (
    decode_png,
    encode_png,
)


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_exact(w, h, channels, seed):
    """encode → decode is pixel-exact for every size/channel/content —
    including the adversarial flat and high-entropy rows the adaptive
    filter heuristic chooses differently on."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=h * w * channels, dtype=np.uint8).tobytes()
    out, ow, oh, oc = decode_png(encode_png(pixels, w, h, channels))
    assert (ow, oh, oc) == (w, h, channels)
    assert out == pixels


@given(
    cut=st.integers(0, 200),
    flip_at=st.integers(0, 199),
    flip_to=st.integers(0, 255),
)
@settings(max_examples=60, deadline=None)
def test_png_decoder_contains_corruption(cut, flip_at, flip_to):
    """Truncation or byte corruption NEVER hangs or returns silently-wrong
    dimensions: the decoder either raises a clean error or round-trips the
    original pixels exactly (a flipped byte in unconsumed padding or a
    same-value flip is legitimately survivable)."""
    import struct
    import zlib

    pixels = bytes(range(48)) * 2  # 8x4 RGB
    good = encode_png(pixels, 8, 4, 3)
    truncated = good[: min(cut, len(good))]
    corrupted = bytearray(good)
    corrupted[flip_at % len(good)] = flip_to

    for blob in (bytes(truncated), bytes(corrupted)):
        try:
            out, w, h, c = decode_png(blob)
        except (ValueError, zlib.error, struct.error, IndexError):
            continue  # clean, typed failure
        assert (w, h, c) == (8, 4, 3) and out == pixels


@pytest.mark.parametrize("salt_n", [1, 4, 16])
def test_salted_agg_equivalence_random(spark, salt_n):
    """salted_agg must be bit-identical to the plain groupBy for algebraic
    aggregates on randomized skewed data (one hot key + uniform tail)."""
    import random

    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.skew import (
        salted_agg,
    )

    rng = random.Random(salt_n)
    rows = [("hot", rng.randint(0, 5), float(rng.randint(0, 100))) for _ in range(400)]
    rows += [(f"k{rng.randint(0, 30)}", rng.randint(0, 5), float(rng.randint(0, 100))) for _ in range(200)]
    df = spark.createDataFrame(rows, "k string, a int, v double")

    aggs = {"mx": ("max", "v"), "mn": ("min", "a"), "sm": ("sum", "v"), "ct": ("count", "a")}
    got = {
        r.k: (r.mx, r.mn, r.sm, r.ct)
        for r in salted_agg(df, ["k"], aggs, salt_n=salt_n).collect()
    }
    want = {
        r.k: (r.mx, r.mn, r.sm, r.ct)
        for r in df.groupBy("k")
        .agg(
            F.max("v").alias("mx"),
            F.min("a").alias("mn"),
            F.sum("v").alias("sm"),
            F.count("a").alias("ct"),
        )
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# FastSS completeness (q123's core claim): any two strings at levenshtein
# distance <= 1 MUST share a member of their deletion neighborhoods
# {s} ∪ {s minus one char}. Candidate generation built on that key can
# then never miss a true pair — only the verify filter decides.
# ---------------------------------------------------------------------------
@st.composite
def _edit_pair(draw):
    s = draw(st.text(alphabet="abcde", min_size=1, max_size=12))
    op = draw(st.sampled_from(["sub", "ins", "del", "eq"]))
    if op == "eq":
        return s, s
    i = draw(st.integers(0, max(len(s) - 1, 0)))
    c = draw(st.sampled_from("abcde"))
    if op == "sub":
        return s, s[:i] + c + s[i + 1 :]
    if op == "ins":
        j = draw(st.integers(0, len(s)))
        return s, s[:j] + c + s[j:]
    return s, s[:i] + s[i + 1 :]  # del (may produce empty string)


def _deletion_neighborhood(s: str) -> set:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@given(_edit_pair())
@settings(max_examples=300, deadline=None)
def test_fastss_deletion_neighborhood_complete(pair):
    a, b = pair
    # pairs constructed above are always at distance <= 1
    assert _deletion_neighborhood(a) & _deletion_neighborhood(b)


# ---------------------------------------------------------------- lsh_blocking


@given(n=st.integers(1, 10**7), target=st.sampled_from([16, 64, 256]))
@settings(max_examples=200, deadline=None)
def test_lsh_width_rule_contract(n, target):
    """For every corpus size: the chosen width satisfies the bound it
    promises (2^k * target >= n) unless clamped at MAX_BITS, and never
    overshoots (k-1 would violate the bound)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators import (
        lsh_blocking as L,
    )

    k = L.n_block_bits(n, target=target)
    assert 1 <= k <= L.MAX_BITS
    if (1 << L.MAX_BITS) * target >= n:
        assert (1 << k) * target >= n          # the promised bound
        if k > 1:
            assert (1 << (k - 1)) * target < n  # minimality
    else:
        assert k == L.MAX_BITS                  # clamp regime


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_lsh_prefix_consistency(seed):
    """Band keys are PREFIX-consistent across widths: vectors sharing a
    k-bit key also share every (k-1)-bit key — the invariant that makes
    a stored index width-monotone (coarsening never splits a bucket)."""
    import numpy as np

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators import (
        lsh_blocking as L,
    )

    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(8, L.DIM))
    planes = [np.array(L.plane(0, i), dtype=float) for i in range(6)]

    def key(v, nbits):
        k = 0
        for i in range(nbits):
            k = k * 2 + (1 if float(v @ planes[i]) >= 0 else 0)
        return k

    for v in vecs:
        for nbits in range(2, 7):
            assert key(v, nbits) >> 1 == key(v, nbits - 1)
