"""Deterministic stratified sampling for training-data curation.

Two variants over an arbitrary stratum column:

- fraction-per-stratum (`stratified_sample`): keep a row iff a 60-bit
  md5-derived uniform hash of its id falls under the stratum's
  threshold. Pure scan-side filter — NO shuffle, no RNG state; the same
  row is kept on every run, on any cluster size, and the expected rate
  per stratum is exact in distribution. This is the 100 TB shape:
  sampling a petabyte corpus must not shuffle it.

- exact-count-per-stratum (`stratified_sample_exact`): the
  min(n, |stratum|) rows with the smallest hash per stratum via a
  rank window — ONE shuffle on the stratum key, and Spark's
  WindowGroupLimit pushes the per-group top-n below the exchange so
  only ~n rows per stratum per map task survive the shuffle.

Hashing follows the repo convention (md5 → first 15 hex chars → 60-bit
int) so a DuckDB oracle replicates membership bit-for-bit. A salt
decorrelates the sample from other md5-keyed operators (dedup keeps
min-doc_id; without a salt, sampling would systematically prefer the
same rows dedup prefers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS


def uniform_hash(col: Column, salt: str = "strat") -> Column:
    """Deterministic 60-bit uniform hash of a column (repo md5 convention)."""
    s = F.concat(F.lit(salt + "|"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def hash_split(key: Column) -> Column:
    """60/20/20 train/val/test assignment: md5(key) 60-bit hash mod 10.

    This IS the repo's split contract: q96 produces it over doc_id, q107
    writes RecordIO shards by it, q172 audits cross-split leakage against
    it, and q203 re-keys it on cluster ids — the leakage audit only
    audits THE split if every consumer derives it from this one
    expression. Keep in lockstep with :func:`hash_split_sql`.
    """
    b = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        )
        % 10
    )
    return F.when(b < 6, "train").when(b < 8, "val").otherwise("test")


def hash_split_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`hash_split` for oracle texts (the hash
    expression repeats per branch; oracle-side CSE makes that free)."""
    b = (
        f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % 10"
    )
    return (
        f"CASE WHEN {b} < 6 THEN 'train' "
        f"WHEN {b} < 8 THEN 'val' ELSE 'test' END"
    )


def fraction_threshold(fraction: float) -> int:
    """Integer keep-threshold for a fraction — computed driver-side so the
    oracle can embed the identical literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of [0,1]: {fraction}")
    return int(fraction * HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum Bernoulli sample, deterministic in `id_col`. No shuffle."""
    hv = uniform_hash(F.col(id_col), salt)
    thr = F.lit(fraction_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(fraction_threshold(frac))).otherwise(thr)
    return df.filter(hv < thr)


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: smallest hashes win.

    Tie-break on id for full determinism; one shuffle on the stratum key,
    top-n pushed below the exchange by WindowGroupLimit.
    """
    hv = uniform_hash(F.col(id_col), salt)
    w = Window.partitionBy(stratum_col).orderBy(hv.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def mixture_budgets(
    sources: list[str],
    weights: dict[str, int],
    default_weight: int,
    total_budget: int,
) -> dict[str, int]:
    """Integer per-source token budgets from mixture weights.

    Pure integer arithmetic (total * w // sum_w) so any re-implementation
    (including a SQL oracle) reproduces the budgets exactly.
    """
    k = sum(weights.get(s, default_weight) for s in sources)
    return {s: total_budget * weights.get(s, default_weight) // k for s in sources}


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "source",
    token_count_col: Column | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample each domain toward its token budget (domain reweighting).

    Per-source keep fraction = min(1, budget_s / tokens_s); rows are then
    kept by the deterministic hash filter. The only data-dependent input
    is the per-source token total — a |sources|-row aggregate collected
    to the driver to derive thresholds (planning over a tiny rollup, the
    legitimate driver-side step even at 100 TB; the corpus itself is
    filtered scan-side, no shuffle). Budget_s / tokens_s is a single
    int/int IEEE division so an oracle reproduces thresholds exactly.
    """
    tok = token_count_col if token_count_col is not None else F.size(F.split(F.col("text"), " "))
    with_tok = df.withColumn("__tok", tok)
    totals = {
        r[stratum_col]: r["tok_total"]
        for r in with_tok.groupBy(stratum_col)
        .agg(F.sum("__tok").alias("tok_total"))
        .collect()
    }
    unknown = set(totals) - set(budgets)
    if unknown:
        # repr-sort: a NULL stratum (None) mixed with strings would make
        # sorted() raise a bare TypeError instead of naming the sources
        raise ValueError(
            f"no budget for sources: {sorted(unknown, key=repr)}"
        )
    degenerate = {s for s, t in totals.items() if not t}  # 0 or all-NULL
    if degenerate:
        # budget/0 has no defined keep fraction; a silent keep-all or
        # drop-all would both misreport the mixture — fail naming them
        raise ValueError(
            "zero/NULL token total for sources:"
            f" {sorted(degenerate, key=repr)} — drop them upstream or fix"
            " token_count_col"
        )
    thresholds = {
        s: fraction_threshold(min(1.0, budgets[s] / totals[s])) for s in totals
    }
    hv = uniform_hash(F.col(id_col), salt)
    thr: Column = F.lit(-1)
    for s in sorted(thresholds):
        thr = F.when(F.col(stratum_col) == s, F.lit(thresholds[s])).otherwise(thr)
    return with_tok.filter(hv < thr).drop("__tok")
