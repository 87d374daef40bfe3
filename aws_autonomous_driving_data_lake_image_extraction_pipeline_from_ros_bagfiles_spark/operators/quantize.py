"""Symmetric int8 embedding quantization.

A 100 TB embedding store at float32 is 4 bytes/dim; int8 cuts it 4x
(plus one float scale per vector), which is the difference between an
ANN index fitting in cluster memory or not. Per-vector symmetric
max-scaling: scale = max|x| / 127, q_i = floor(x_i/scale + 0.5).
The explicit floor(+0.5) half-up form is used instead of round() so
any re-implementation (the DuckDB oracle, a C++ serving stack) can
reproduce codes bit-for-bit — round() half-even vs half-away varies
by engine.

All pure array expressions over one projection — no shuffle, no UDF.
Floats are cast float32 -> double BEFORE any arithmetic (the repo's
cross-engine float rule), and error sums fold left-to-right.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Adds qvec (array<bigint> in [-127,127]) and scale (double).

    A zero vector quantizes to all-zero codes with scale 0.
    """
    v = _as_double(F.col(vec_col))
    mx = F.array_max(F.transform(v, F.abs))
    scale = mx / F.lit(127.0)
    qvec = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("bigint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("bigint")))
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        qvec.alias("qvec"),
        scale.alias("scale"),
    )


def dequant_error(quantized: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Mean absolute reconstruction error per vector (double).

    err = sum_i |q_i * scale - x_i| / dim, folded left-to-right.
    """
    v = _as_double(F.col(vec_col))
    diffs = F.zip_with(
        F.col("qvec"), v, lambda q, x: F.abs(q.cast("double") * F.col("scale") - x)
    )
    mae = F.aggregate(diffs, F.lit(0.0), lambda a, x: a + x) / F.size(v)
    return quantized.withColumn("mae", mae)
