"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- :func:`cosine_topk` — brute-force scan against a (small) query set. The
  query side is broadcast; the corpus is scanned once; the dot product is
  a codegen'd ``zip_with``+``aggregate`` fold in float64. At 100 TB this is
  the *correct* baseline when the query set is small: one pass, no index.
- :func:`bucketed_topk` — IVF-style pruning: restrict the scan to the
  query's coarse bucket (here the ``label`` column stands in for a k-means
  cell id; in production the bucket id comes from a trained quantizer).
  Bucket pruning turns the scan into a partition-pruned read when the
  corpus is written partitioned by bucket — the 100 TB path.

Float discipline: elements are cast float32 -> float64 *before* any
multiply/accumulate and folds run strictly left-to-right, so results are
bit-stable and reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not NaN) for a zero-norm operand: 0/0 is NaN in the JVM and
    Spark orders NaN ABOVE every double, so one all-zeros embedding would
    rank first in every desc-ordered top-k, silently displacing a real
    neighbor. DuckDB's 0/0 is already NULL, so the guard also keeps
    oracle parity on degenerate vectors (desc ordering puts NULLS LAST
    on both engines)."""
    den = norm(a) * norm(b)
    return F.when(den != 0.0, dot(a, b) / den)


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k corpus rows by cosine against a single-row query DataFrame.

    ``query`` must have one row with column ``qe`` (the query vector) —
    broadcast so the scan side never shuffles; top-k is a global
    ``orderBy().limit()`` which Spark executes as per-partition top-k +
    driver merge (TakeOrderedAndProject), not a full sort.
    """
    joined = corpus.crossJoin(F.broadcast(query))
    sim = cosine(F.col(vec_col), F.col("qe"))
    return (
        joined.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def bucketed_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    bucket_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style top-k: scan only the query's coarse bucket.

    ``query``: one row with ``qe`` (vector) and ``qbucket``. With the
    corpus laid out ``partitionBy(bucket)``, Catalyst prunes every other
    partition from the scan — at 1000 buckets that is a 99.9% I/O cut for
    ~the usual small recall loss (probe more buckets to trade back).
    """
    joined = corpus.crossJoin(F.broadcast(query)).filter(
        F.col(bucket_col) == F.col("qbucket")
    )
    sim = cosine(F.col(vec_col), F.col("qe"))
    return (
        joined.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
