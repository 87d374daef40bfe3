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
