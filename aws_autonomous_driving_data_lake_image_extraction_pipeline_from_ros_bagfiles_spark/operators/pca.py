"""Distributed PCA (top principal component) via power iteration.

The 100 TB-scale decomposition every embedding pipeline eventually needs
(dimensionality reduction before ANN, whitening, drift monitoring) has a
classic two-phase shape that fits Spark exactly:

1. **Distributed gram matrix** ``G = X^T X`` — one pass over the corpus.
   ``posexplode`` the vectors and self-join per ``vec_id``: the join
   output feeds a map-side-combined ``groupBy(i, j) . sum`` in the same
   stage, so the shuffle carries at most d^2 partial rows per partition
   (d = 64 here), never the corpus. G's size is O(d^2), independent of
   row count.
2. **Driver-side power iteration** on the d x d matrix — microseconds of
   pure-Python float math, then the resulting direction is broadcast
   back as a literal for the distributed projection pass.

Determinism contract (what lets q114 be value-hash oracled against
DuckDB): the gram sums accumulate as ``DECIMAL(38, 18)`` — decimal
addition is EXACT and order-independent, so partial-aggregation order
(Spark) vs sequential scan (DuckDB) cannot perturb G by even an ulp.
The per-product ``double -> decimal`` cast is a single deterministic
rounding of identical IEEE doubles on both engines. Iterations then run
strictly left-to-right (plain Python accumulation here, ``list_sum``
scans there) over bit-identical inputs, so every iterate — and the
final projection — matches bit-for-bit with no rounding tricks inside
the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gram_matrix(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(i, j, g) — exact-decimal X^T X entries as doubles, 1-based dims."""
    ex = emb.select(
        F.col(id_col).alias("_id"), F.posexplode(vec_col).alias("p", "x")
    ).select("_id", (F.col("p") + 1).alias("p"), F.col("x").cast("double").alias("x"))
    a = ex.select("_id", F.col("p").alias("i"), F.col("x").alias("xa"))
    b = ex.select("_id", F.col("p").alias("j"), F.col("x").alias("xb"))
    return (
        a.join(b, "_id")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(38,18)"))
            .cast("double")
            .alias("g")
        )
    )


def power_iteration(g_rows: list[tuple[int, int, float]], dim: int, iters: int) -> list[float]:
    """Dominant eigenvector of the (1-based-indexed) gram entries.

    Plain-Python left-to-right accumulation — deliberately NOT numpy,
    whose pairwise/SIMD summation would diverge from the oracle's
    sequential ``list_sum`` at the last ulp. Start vector: uniform
    1/sqrt(dim), all-positive.
    """
    G = [[0.0] * dim for _ in range(dim)]
    for i, j, g in g_rows:
        if g is None:
            # a NULL gram entry means the upstream decimal sum overflowed
            # or the input was empty — name it, don't TypeError mid-loop
            raise ValueError(f"gram entry ({i},{j}) is NULL — degenerate input")
        G[i - 1][j - 1] = g
    v = [1.0 / float(dim) ** 0.5] * dim
    for _ in range(iters):
        w = []
        for i in range(dim):
            acc = 0.0
            row = G[i]
            for k in range(dim):
                acc += row[k] * v[k]
            w.append(acc)
        nrm_acc = 0.0
        for x in w:
            nrm_acc += x * x
        nrm = nrm_acc**0.5
        if nrm == 0.0:
            # all-zero gram (empty table / all-zero vectors): there is no
            # dominant eigenvector — fail with the cause, not a
            # ZeroDivisionError deep in driver code (r8 review)
            raise ValueError(
                "gram matrix is all zeros (empty or all-zero embeddings);"
                " power iteration has no dominant eigenvector"
            )
        v = [x / nrm for x in w]
    return v


def project(emb: DataFrame, v: list[float], vec_col: str = "embedding") -> Column:
    """Left-to-right fold of <x, v> — matches list_sum's scan order."""
    lit_v = F.array(*[F.lit(float(x)) for x in v])
    prods = F.zip_with(F.col(vec_col), lit_v, lambda x, w: x.cast("double") * w)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
