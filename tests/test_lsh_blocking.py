"""Contracts for operators/lsh_blocking.py — the corpus-scaled hyperplane
blocking that became the default block-key recipe for the similarity-graph
family in r5 (q42/q109/q168/q180).

Pinned here:
- the width rule (smallest k with 2^k * target >= N) and its clamp,
- plane determinism,
- the structural recall guarantee (identical vectors always collide),
- cross-engine parity: Spark band keys == the DuckDB oracle CTE's band
  keys on the real sf0.001 embeddings (the property every consumer's
  hash-match rests on),
- the scale contract: block count grows with N, so max block size stays
  bounded while the corpus grows.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators import (
    lsh_blocking as L,
)

SF_DIR = "/root/testdata/sf0.001"


def test_n_block_bits_rule():
    # smallest k with 2^k * 64 >= N
    assert L.n_block_bits(1) == 1
    assert L.n_block_bits(128) == 1
    assert L.n_block_bits(129) == 2
    assert L.n_block_bits(500) == 3
    assert L.n_block_bits(2000) == 5
    assert L.n_block_bits(20000) == 9
    # clamp at MAX_BITS
    assert L.n_block_bits(10**9) == L.MAX_BITS
    # monotone non-decreasing in N
    widths = [L.n_block_bits(n) for n in range(1, 5000, 37)]
    assert widths == sorted(widths)


def test_plane_deterministic_rademacher():
    p1 = L.plane(0, 0)
    p2 = L.plane(0, 0)
    assert p1 == p2
    assert set(p1) <= {-1, 1}
    assert len(p1) == L.DIM
    # distinct (band, bit) give distinct planes
    assert L.plane(0, 0) != L.plane(1, 0)
    assert L.plane(0, 0) != L.plane(0, 1)


def test_identical_vectors_always_candidates(spark):
    rows = [
        (1, [0.5] * 8 + [0.0] * 56),
        (2, [0.5] * 8 + [0.0] * 56),  # identical to 1 -> same signature
        (3, [-1.0] * 64),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = {
        (r.id_a, r.id_b)
        for r in L.scaled_candidate_pairs(emb, nbits=4).collect()
    }
    assert (1, 2) in cand


def test_band_keys_match_duckdb_oracle(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    nbits = L.n_block_bits(n)
    got = {
        (r.vec_id, r.band): r.band_key
        for r in L.band_keys(emb, nbits).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    sql = f"""
    WITH {L.nbits_param_sql("embeddings")},
    {L.band_keys_sql("embeddings")}
    SELECT vec_id, band, band_key FROM lsh_bands
    """
    want = {(v, b): k for v, b, k in con.execute(sql).fetchall()}
    assert got == want
    # and the dynamic-nbits rule agreed with the driver-side one
    dyn = con.execute(
        f"WITH {L.nbits_param_sql('embeddings')} SELECT nbits FROM lsh_params"
    ).fetchone()[0]
    assert dyn == nbits


def test_block_count_scales_with_corpus(spark):
    # same generator, two corpus sizes: the bigger corpus must get more
    # blocks and its max block must NOT grow ~linearly (the fixed-block
    # failure mode this module replaces)
    import hashlib

    def fake(n):
        rows = []
        for i in range(n):
            h = hashlib.md5(f"v{i}".encode()).digest()
            vec = [((h[j % 16] + i * (j + 1)) % 255) / 127.0 - 1.0 for j in range(64)]
            rows.append((i, vec))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    sizes = {}
    for n in (256, 2048):
        emb = fake(n)
        nbits = L.n_block_bits(n)
        cells = L.cell_keys(emb, nbits).groupBy("cell").count().collect()
        sizes[n] = (len(cells), max(r["count"] for r in cells))
    assert sizes[2048][0] > sizes[256][0]  # more blocks at bigger N
    # max block size bounded: grows far slower than the 8x corpus growth
    assert sizes[2048][1] < sizes[256][1] * 4


def test_bucket_flood_guard_caps_degenerate_data(spark):
    """Adversarial shape: many byte-identical vectors flood one bucket in
    every band. The cap drops the flooded buckets (no pairs from them);
    uncapped keeps them (quadratic pairs) — the q68-style guard, vector
    edition."""
    clones = [(i, [1.0] * 64) for i in range(12)]
    other = [(100, [-1.0] * 64)]
    emb = spark.createDataFrame(
        clones + other, "vec_id long, embedding array<float>"
    )
    uncapped = L.scaled_candidate_pairs(emb, nbits=4).count()
    assert uncapped >= 66  # 12 clones -> all 66 clone pairs collide
    capped = L.scaled_candidate_pairs(emb, nbits=4, max_bucket_size=4)
    assert capped.count() == 0  # flooded buckets dropped entirely


def test_cell_keys_single_assignment(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cells = L.cell_keys(emb, nbits=3)
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    nc = cells.select("cell").distinct().count()
    assert 1 <= nc <= 8  # 3 bits -> at most 8 cells


def test_band_keys_raises_on_dim_mismatch(spark):
    """A vector whose length != the plane width must fail LOUDLY: before
    the guard, zip_with null-padded the plane, the dot fold went NULL,
    every bit read 0 and ALL rows collided in band_key 0 — a silent
    quadratic blowup plus oracle divergence (DuckDB's list_sum skips the
    null products and computes real keys)."""
    import pytest
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.lsh_blocking import (
        band_keys,
        cell_key_col,
    )

    bad = spark.createDataFrame(
        [(0, [0.1] * 128)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="embedding length 128 != plane dim 64"):
        band_keys(bad, nbits=4).collect()
    with pytest.raises(Exception, match="embedding length 128 != plane dim 64"):
        bad.select(cell_key_col(F.col("embedding"), 4)).collect()
