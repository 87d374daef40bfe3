"""Greedy sequence packing: bin documents into fixed token-capacity
context windows for training-batch preparation.

Packing is inherently sequential WITHIN a shard (bin state depends on
every prior doc), but shards are independent — so the Spark shape is
``groupBy(shard).applyInPandas`` with a per-group linear scan: one
shuffle on the shard key, then each shard packs in parallel,
Arrow-batched. Determinism: docs are packed in ascending id order
inside each shard regardless of arrival order, so output is stable
under any partitioning. At 100 TB, shards (source, date, or a hash
prefix) keep every group driver-free and bounded.

Semantics (the standard greedy fill): walk docs in order, keep adding
to the current bin while the bin's fill + the doc's tokens stay within
capacity; otherwise open a new bin. An oversized doc (tokens >
capacity) occupies its own bin — never silently truncated.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    capacity: int,
    group_col: str = "source",
    token_col: str = "tok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign (bin, pos, bin_fill) per doc within each group.

    bin is 0-based per group; pos is the doc's 0-based slot in its bin;
    bin_fill is the bin's running token total after this doc.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")

    # derive group/id field types from the input — the previous
    # hard-coded "string"/"bigint" broke any caller with an int shard
    # key or string doc id (r8 review); token_col is cast below, so its
    # output type is always bigint
    schema = StructType(
        [
            df.schema[group_col],
            df.schema[id_col],
            StructField(token_col, LongType()),
            StructField("bin", LongType()),
            StructField("pos", LongType()),
            StructField("bin_fill", LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, poss, fills = [], [], []
        cur_bin, fill, pos = -1, 0, 0
        for tok in pdf[token_col]:
            if cur_bin < 0 or fill + tok > capacity:
                cur_bin += 1
                fill, pos = int(tok), 0
            else:
                fill += int(tok)
                pos += 1
            bins.append(cur_bin)
            poss.append(pos)
            fills.append(fill)
        out = pdf[[group_col, id_col, token_col]].copy()
        out["bin"] = bins
        out["pos"] = poss
        out["bin_fill"] = fills
        return out

    cols = df.select(
        F.col(group_col), F.col(id_col), F.col(token_col).cast("bigint")
    )
    return cols.groupBy(group_col).applyInPandas(_pack, schema=schema)


def packing_efficiency(packed: DataFrame, capacity: int, group_col: str = "source") -> DataFrame:
    """Per-group packing audit: bins used, mean fill ratio, wasted tokens."""
    per_bin = packed.groupBy(group_col, "bin").agg(F.max("bin_fill").alias("fill"))
    return per_bin.groupBy(group_col).agg(
        F.count("*").alias("n_bins"),
        F.sum("fill").cast("bigint").alias("tok_packed"),
        F.sum(
            F.when(F.col("fill") < capacity, F.lit(capacity) - F.col("fill")).otherwise(0)
        )
        .cast("bigint")
        .alias("tok_wasted"),
    )
