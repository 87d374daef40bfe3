"""Sequence packing: greedy semantics, determinism, efficiency audit."""

import pytest
from pyspark.sql import Row

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.packing import (
    pack_sequences,
    packing_efficiency,
)


@pytest.fixture(scope="module")
def shard(spark):
    rows = [
        Row(source="a", doc_id=1, tok=100),
        Row(source="a", doc_id=2, tok=100),
        Row(source="a", doc_id=3, tok=60),   # 100+100+60 > 256 -> new bin
        Row(source="a", doc_id=4, tok=300),  # oversized: own bin
        Row(source="a", doc_id=5, tok=10),
        Row(source="b", doc_id=6, tok=256),  # exactly capacity fits
        Row(source="b", doc_id=7, tok=1),
    ]
    return spark.createDataFrame(rows)


def test_greedy_fill_and_oversize(shard):
    out = {r.doc_id: r for r in pack_sequences(shard, 256).collect()}
    assert (out[1].bin, out[1].pos, out[1].bin_fill) == (0, 0, 100)
    assert (out[2].bin, out[2].pos, out[2].bin_fill) == (0, 1, 200)
    assert (out[3].bin, out[3].pos, out[3].bin_fill) == (1, 0, 60)
    assert (out[4].bin, out[4].pos, out[4].bin_fill) == (2, 0, 300)
    # after an oversized bin, the next doc opens a fresh bin
    assert (out[5].bin, out[5].pos) == (3, 0)
    # groups are independent; exact-capacity doc fills its bin
    assert (out[6].bin, out[6].bin_fill) == (0, 256)
    assert (out[7].bin, out[7].pos) == (1, 0)


def test_packing_invariant_under_partitioning(shard):
    base = sorted(map(tuple, pack_sequences(shard, 256).collect()))
    scrambled = sorted(
        map(tuple, pack_sequences(shard.orderBy("tok").repartition(7), 256).collect())
    )
    assert base == scrambled


def test_efficiency_audit(shard):
    packed = pack_sequences(shard, 256)
    eff = {r.source: r for r in packing_efficiency(packed, 256).collect()}
    # source a: bins fills are 200, 60, 300, 10 -> 4 bins
    assert eff["a"].n_bins == 4
    assert eff["a"].tok_packed == 570
    # wasted only counts under-capacity bins: (256-200)+(256-60)+(256-10)
    assert eff["a"].tok_wasted == 56 + 196 + 246
    assert eff["b"].tok_wasted == 255


def test_bad_capacity(shard):
    with pytest.raises(ValueError):
        pack_sequences(shard, 0)
