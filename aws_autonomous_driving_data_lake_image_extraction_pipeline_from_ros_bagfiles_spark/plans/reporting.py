"""Dataset-card reporting and governance gates (q178-q179): the
one-row corpus summary a data release ships (HuggingFace dataset-card / Datasheets-for-Datasets
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
    # ONE corpus scan for every scalar statistic (the gate sum rides the
    # same aggregate as the base stats — it was a second full scan), and
    # the entropy's total comes from a window over the |sources|-sized
    # grouped frame, not a third scan of documents (r7 review)
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
        F.sum(passes.cast("int")).cast("bigint").alias("n_quality_pass"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    mix = (
        docs.groupBy("source")
        .agg(F.count("*").alias("ns"))
        .select(
            (F.col("ns") * F.lit(1.0) / F.sum("ns").over(wall)).alias("p")
        )
        .agg(F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("source_entropy"))
    )
    return (
        base.crossJoin(mix)
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


# --------------------------------------------------------------------------
# q179 — declarative data-quality constraint suite (dbt-tests /
# Deequ-style): one row per constraint with its violation count over the
# warehouse tables — uniqueness, not-null, accepted values, referential
# integrity, and range checks. Each check is an independent
# map-side-combinable aggregate (the FK check is a broadcast anti-join);
# the union of one-row frames costs nothing. This is the gate a
# production pipeline runs before publishing a partition.
# --------------------------------------------------------------------------
Q179_TS_LO = "2023-01-01"
Q179_TS_HI = "2026-01-01"


@register(
    "q179_dq_constraints",
    oracle=f"""
    SELECT 'events.event_id.unique' AS constraint_name,
           CAST((SELECT count(*) - count(DISTINCT event_id) FROM events)
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'events.user_id.not_null',
           CAST((SELECT count(*) FROM events WHERE user_id IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'events.event_type.accepted_values',
           CAST((SELECT count(*) FROM events WHERE event_type NOT IN
                 ('click', 'view', 'signup', 'purchase', 'error'))
                AS BIGINT)
    UNION ALL
    SELECT 'events.ts.range',
           CAST((SELECT count(*) FROM events
                 WHERE ts < TIMESTAMP '{Q179_TS_LO}'
                    OR ts >= TIMESTAMP '{Q179_TS_HI}') AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey.fk_customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_orderkey.fk_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_quantity.positive',
           CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
                AS BIGINT)
    UNION ALL
    SELECT 'documents.doc_id.unique',
           CAST((SELECT count(*) - count(DISTINCT doc_id) FROM documents)
                AS BIGINT)
    """,
)
def q179_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    docs = load(spark, sf_dir, "documents")

    # ONE aggregate pass per table, unpivoted to constraint rows — the
    # previous one-agg-per-check form rescanned events 4x and lineitem
    # 2x for checks that fold into the same scan (r7 review). The oracle
    # keeps the per-check scalar-subquery form (its CSE makes that free);
    # values are identical.
    def unpivot(agg: DataFrame, names_cols: list[tuple[str, str]]) -> DataFrame:
        pairs = ", ".join(f"'{n}', {c}" for n, c in names_cols)
        return agg.select(
            F.expr(
                f"stack({len(names_cols)}, {pairs})"
                " AS (constraint_name, n)"
            )
        ).select(
            "constraint_name", F.col("n").cast("bigint").alias("n_violations")
        )

    ev_checks = unpivot(
        ev.agg(
            (F.count("*") - F.countDistinct("event_id")).alias("uniq"),
            F.sum(F.col("user_id").isNull().cast("int")).alias("nn"),
            F.sum(
                (
                    ~F.col("event_type").isin(
                        "click", "view", "signup", "purchase", "error"
                    )
                ).cast("int")
            ).alias("acc"),
            F.sum(
                (
                    (F.col("ts") < F.lit(Q179_TS_LO).cast("timestamp"))
                    | (F.col("ts") >= F.lit(Q179_TS_HI).cast("timestamp"))
                ).cast("int")
            ).alias("rng"),
        ),
        [
            ("events.event_id.unique", "uniq"),
            ("events.user_id.not_null", "nn"),
            ("events.event_type.accepted_values", "acc"),
            ("events.ts.range", "rng"),
        ],
    )
    fk_orders = unpivot(
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        ).agg(F.count("*").alias("fk")),
        [("orders.o_custkey.fk_customer", "fk")],
    )
    # one lineitem pass: the FK check rides a left join against the
    # unique o_orderkey side (same shuffle as the anti-join) so the
    # quantity check shares the scan
    li_checks = unpivot(
        lineitem.select("l_orderkey", "l_quantity")
        .join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.lit(1).alias("__hit"),
            ),
            "l_orderkey",
            "left",
        )
        .agg(
            F.sum(F.col("__hit").isNull().cast("int")).alias("fk"),
            F.sum((F.col("l_quantity") <= 0).cast("int")).alias("pos"),
        ),
        [
            ("lineitem.l_orderkey.fk_orders", "fk"),
            ("lineitem.l_quantity.positive", "pos"),
        ],
    )
    doc_checks = unpivot(
        docs.agg((F.count("*") - F.countDistinct("doc_id")).alias("uniq")),
        [("documents.doc_id.unique", "uniq")],
    )
    return ev_checks.unionAll(fk_orders).unionAll(li_checks).unionAll(doc_checks)
