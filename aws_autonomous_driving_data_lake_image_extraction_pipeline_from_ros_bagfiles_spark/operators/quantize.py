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
    """Adds qvec (array<bigint> in [-127,127]) and scale (double);
    every other input column passes through unchanged (r8 review — the
    previous projection silently dropped caller metadata columns).
    Raises if the input already carries a qvec/scale column: withColumn
    would silently OVERWRITE caller metadata of those names.

    A zero vector quantizes to all-zero codes with scale 0.
    """
    taken = {"qvec", "scale"} & set(df.columns)
    if taken:
        raise ValueError(
            f"quantize_int8: input already has column(s) {sorted(taken)} —"
            " rename them upstream; the quantizer writes qvec and scale"
        )
    v = _as_double(F.col(vec_col))
    mx = F.array_max(F.transform(v, F.abs))
    scale = mx / F.lit(127.0)
    qvec = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("bigint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("bigint")))
    return df.withColumn("qvec", qvec).withColumn("scale", scale)


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


def normalize(vec: Column) -> Column:
    """Unit-normalize (float64). Zero vectors stay zero."""
    v = _as_double(vec)
    nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)


def quantized_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    expand: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage retrieval: int8 shortlist, float64 rerank.

    The production ANN serving pattern — vectors are unit-normalized,
    then int8-quantized; stage 1 scores every corpus vector with the
    INTEGER dot product of its codes against the (broadcast) quantized
    query, descaled by the two per-vector scales so the approximation
    tracks cosine, and shortlists k*expand candidates via
    TakeOrderedAndProject (per-partition top-k + driver merge, no full
    sort, no shuffle); stage 2 reranks only the shortlist with exact
    float64 cosine. At 100 TB stage 1 reads 1/4 the bytes of a float
    scan and the rerank touches k*expand rows total.

    The integer dot product is exact in both engines and the descale is
    a product of exact ints with two doubles, so the shortlist — and
    hence the final ranking — is deterministic (ties break on id).
    Returns (id, ip, cos): the raw integer score and reranked cosine.

    CONTRACT (same as similarity.cosine_topk): ``query`` must be ONE row
    carrying the raw vector in a ``qe`` column. The crossJoin fan-out and
    the global limit are single-query shapes — a multi-row query frame
    would mispair codes with raw vectors and mix queries in one top-k;
    fan multi-query workloads through ann_ivf.ivf_topk_batch instead.
    """
    from .similarity import cosine

    if "qe" not in query.columns:
        raise ValueError(
            "quantized_topk: query frame must carry the raw query vector"
            f" in a 'qe' column (got {query.columns}); it must also be a"
            " single row — see docstring"
        )
    # explicit projection: carrying arbitrary corpus metadata into the
    # crossJoin would both widen the shuffle and let a corpus column
    # named 'qe' shadow the query vector (r8 round-diff review)
    normed = corpus.select(id_col, vec_col).withColumn(
        vec_col, normalize(F.col(vec_col))
    )
    qc = quantize_int8(normed, vec_col, id_col)
    qn = query.select(
        F.col(id_col), normalize(F.col("qe")).alias(vec_col), F.col("qe")
    )
    qq = quantize_int8(qn, vec_col, id_col).select(
        F.col("qvec").alias("qq_codes"), F.col("scale").alias("qq_scale")
    )
    qq = qq.crossJoin(F.broadcast(qn.select("qe")))
    joined = qc.crossJoin(F.broadcast(qq))
    ip = F.aggregate(
        F.zip_with("qvec", "qq_codes", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    approx = F.col("ip").cast("double") * F.col("scale") * F.col("qq_scale")
    shortlist = (
        joined.select(
            F.col(id_col), F.col(vec_col), F.col("qe"), F.col("scale"),
            F.col("qq_scale"), ip.alias("ip"),
        )
        .select(F.col(id_col), F.col(vec_col), F.col("qe"), "ip", approx.alias("approx"))
        .orderBy(F.desc("approx"), F.asc(id_col))
        .limit(k * expand)
    )
    return (
        shortlist.select(
            F.col(id_col), "ip", cosine(F.col(vec_col), F.col("qe")).alias("cos")
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
