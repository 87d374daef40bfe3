"""Dataset-card reporting (q178): the one-row corpus summary a data
release ships (HuggingFace dataset-card / Datasheets-for-Datasets
numbers), composed from the engine's own curation primitives.

Every statistic is a tiny independent aggregate (count, distinct-md5,
rule gate, per-source entropy) crossJoin-assembled into one wide row —
the report costs a handful of map-side-combined passes over the corpus
and shuffles only scalars. At 100 TB each sub-aggregate is the same
linear scan it is here; nothing in the assembly step grows with data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# reuse the q159 gate thresholds so the card's quality number matches the
# curation dashboard
from .corpus_quality import (
    Q159_MWL_HI,
    Q159_MWL_LO,
    Q159_STOP_MIN,
    Q159_STOPWORDS,
    Q159_TTR_MIN,
    Q159_WC_HI,
    Q159_WC_LO,
    _STOP_SQL,
)


@register(
    "q178_dataset_card",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, lang, n_chars,
                      string_split(text, ' ') AS w,
                      md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
               FROM documents),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(len(w)) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             round(avg(len(w)), 2) AS mean_doc_tokens,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_fp
      FROM t
    ),
    gate AS (
      SELECT CAST(sum(CAST(
                 len(w) BETWEEN {Q159_WC_LO} AND {Q159_WC_HI}
                 AND list_sum(list_transform(w, x -> length(x))) * 1.0
                     / len(w) BETWEEN {Q159_MWL_LO} AND {Q159_MWL_HI}
                 AND len(list_distinct(w)) * 1.0 / len(w) >= {Q159_TTR_MIN}
                 AND len(list_distinct(list_filter(w,
                         x -> x IN ({_STOP_SQL})))) >= {Q159_STOP_MIN}
                 AS INT)) AS BIGINT) AS n_quality_pass
      FROM t
    ),
    mix AS (
      -- source-mixture entropy (nats): diversity headline number
      SELECT round(-sum(p * ln(p)), 6) AS source_entropy
      FROM (SELECT count(*) * 1.0 / (SELECT count(*) FROM t) AS p
            FROM t GROUP BY source)
    )
    SELECT base.n_docs, base.n_sources, base.n_langs, base.n_tokens,
           base.n_chars, base.mean_doc_tokens,
           round(1.0 - base.n_unique_fp * 1.0 / base.n_docs, 6)
               AS exact_dup_rate,
           round(gate.n_quality_pass * 1.0 / base.n_docs, 6)
               AS quality_pass_rate,
           mix.source_entropy
    FROM base CROSS JOIN gate CROSS JOIN mix
    """,
)
def q178_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import text_fingerprint

    docs = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    wc = F.size(w)
    mwl = (
        F.aggregate(F.transform(w, F.length), F.lit(0), lambda a, x: a + x)
        * F.lit(1.0)
        / wc
    )
    ttr = F.size(F.array_distinct(w)) * F.lit(1.0) / wc
    n_stop = F.size(
        F.array_distinct(F.filter(w, lambda x: x.isin(*Q159_STOPWORDS)))
    )
    passes = (
        wc.between(Q159_WC_LO, Q159_WC_HI)
        & mwl.between(Q159_MWL_LO, Q159_MWL_HI)
        & (ttr >= Q159_TTR_MIN)
        & (n_stop >= Q159_STOP_MIN)
    )
    base = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(wc).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.round(F.avg(wc), 2).alias("mean_doc_tokens"),
        F.countDistinct(text_fingerprint(F.col("text")))
        .cast("bigint")
        .alias("n_unique_fp"),
    )
    gate = docs.agg(
        F.sum(passes.cast("int")).cast("bigint").alias("n_quality_pass")
    )
    n_total = docs.agg(F.count("*").alias("nt"))
    mix = (
        docs.groupBy("source")
        .agg(F.count("*").alias("ns"))
        .crossJoin(F.broadcast(n_total))
        .select((F.col("ns") * F.lit(1.0) / F.col("nt")).alias("p"))
        .agg(F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("source_entropy"))
    )
    return (
        base.crossJoin(gate)
        .crossJoin(mix)
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "n_tokens",
            "n_chars",
            "mean_doc_tokens",
            F.round(
                1.0 - F.col("n_unique_fp") * F.lit(1.0) / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            F.round(
                F.col("n_quality_pass") * F.lit(1.0) / F.col("n_docs"), 6
            ).alias("quality_pass_rate"),
            "source_entropy",
        )
    )
