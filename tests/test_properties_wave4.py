"""Property-based tests for the wave-4 operators: invariants over
generated inputs, not just the driver fixtures.

Spark-backed properties cap ``max_examples`` (each example is a job) and
disable deadlines; the pure-logic properties (Morton interleave,
waterfilling closed form, Poisson CDF table) run fast and wide.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# -------------------------------------------------------------------------
# Morton/Z-order interleave: bijective on 8-bit x 8-bit, order-preserving
# on each axis when the other is fixed.
# -------------------------------------------------------------------------
def _zval_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(st.integers(0, 255), st.integers(0, 255))
def test_zval_bijective(x, y):
    z = _zval_py(x, y)
    # decode by de-interleaving
    dx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (dx, dy) == (x, y)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(0, 255), st.integers(0, 255))
def test_zval_column_matches_python(spark, x, y):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.layout import (
        _zval_col,
    )

    row = (
        spark.range(1)
        .select(
            _zval_col(F.lit(x).cast("bigint"), F.lit(y).cast("bigint")).alias(
                "z"
            )
        )
        .first()
    )
    assert row.z == _zval_py(x, y)


# -------------------------------------------------------------------------
# Waterfilling closed form == iterative reference for ANY availability
# profile: sum(alloc) = budget, alloc <= available, uncapped sources sit
# at one common level.
# -------------------------------------------------------------------------
def _waterfill_ref(avail: list[int], budget: float) -> list[float]:
    """Iterative reference: raise the water level until the budget is
    spent; capped sources freeze at their availability."""
    n = len(avail)
    alloc = [0.0] * n
    active = list(range(n))
    remaining = budget
    while active:
        level = remaining / len(active)
        capped = [i for i in active if avail[i] <= level]
        if not capped:
            for i in active:
                alloc[i] = level
            return alloc
        for i in capped:
            alloc[i] = float(avail[i])
            remaining -= avail[i]
            active.remove(i)
    return alloc


def _waterfill_closed(avail: list[int], share: float) -> list[float]:
    """The q173 closed form (sorted prefix scan) in plain Python."""
    budget = share * sum(avail)
    order = sorted(range(len(avail)), key=lambda i: (avail[i], i))
    n = len(avail)
    prefix = 0
    water = None
    for k, i in enumerate(order, start=1):
        level = (budget - prefix) / (n - k + 1)
        if level <= avail[i]:
            if water is None or level > water:
                water = level
        prefix += avail[i]
    return [min(float(a), water) for a in avail]


@given(
    st.lists(st.integers(1, 10_000), min_size=2, max_size=20),
    st.floats(0.05, 0.95),
)
def test_waterfill_closed_form_equals_iterative(avail, share):
    budget = share * sum(avail)
    got = _waterfill_closed(avail, share)
    ref = _waterfill_ref(avail, budget)
    assert abs(sum(got) - budget) < 1e-6 * max(1.0, budget)
    for g, r, a in zip(got, ref, avail):
        assert abs(g - r) < 1e-6 * max(1.0, a)
        assert g <= a + 1e-9


# -------------------------------------------------------------------------
# 2-D skyline window formulation == brute-force dominance for ANY point
# set (including ties and duplicates).
# -------------------------------------------------------------------------
def _skyline_window(points):
    out = []
    for i, (p, s) in enumerate(points):
        best_cheaper = max(
            (s2 for p2, s2 in points if p2 < p), default=None
        )
        best_same = max(s2 for p2, s2 in points if p2 == p)
        if (best_cheaper is None or s > best_cheaper) and s >= best_same:
            out.append((p, s))
    return sorted(set(out))


def _skyline_brute(points):
    out = []
    for p, s in points:
        dominated = any(
            p2 <= p and s2 >= s and (p2 < p or s2 > s) for p2, s2 in points
        )
        if not dominated:
            out.append((p, s))
    return sorted(set(out))


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_window_equals_bruteforce(points):
    assert _skyline_window(points) == _skyline_brute(points)


# -------------------------------------------------------------------------
# Poisson(1) inverse-CDF table used by the bootstrap: the constants ARE
# the CDF of Poisson(1), monotone, and the induced weights have mean ~1.
# -------------------------------------------------------------------------
def test_poisson_cdf_table_is_correct():
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        _POISSON_CDF,
    )

    acc = 0.0
    for k, c in enumerate(_POISSON_CDF):
        acc += math.exp(-1) / math.factorial(k)
        assert abs(c - acc) < 1e-12
    assert all(a < b for a, b in zip(_POISSON_CDF, _POISSON_CDF[1:]))


@given(st.floats(0.0, 0.999999))
def test_poisson_inverse_cdf_maps_uniform_to_count(u):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        _POISSON_CDF,
    )

    k = next((i for i, c in enumerate(_POISSON_CDF) if u < c), 7)
    assert 0 <= k <= 7
    if k > 0 and k < 7:
        assert _POISSON_CDF[k - 1] <= u < _POISSON_CDF[k]


# -------------------------------------------------------------------------
# Mutual-kNN graph: degree bound holds for ANY cosine structure — every
# node keeps at most K neighbors, so wedge fan-out is bounded.
# -------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15), st.floats(0.3, 1.0)),
        min_size=1,
        max_size=60,
    )
)
def test_mutual_knn_degree_bound(raw_edges):
    K = 3
    # canonicalize: u < v, dedup keeping max cosine
    pairs = {}
    for u, v, c in raw_edges:
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        pairs[key] = max(pairs.get(key, 0.0), round(c, 6))
    neigh = {}
    for (u, v), c in pairs.items():
        neigh.setdefault(u, []).append((-c, v))
        neigh.setdefault(v, []).append((-c, u))
    kept = {u: {v for _, v in sorted(ns)[:K]} for u, ns in neigh.items()}
    edges = {
        (u, v)
        for (u, v) in pairs
        if v in kept.get(u, ()) and u in kept.get(v, ())
    }
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert all(d <= K for d in deg.values())
