"""Benchmark-contamination detection for training corpora.

Before training, every corpus must be checked for n-gram overlap with
evaluation benchmarks — a contaminated doc inflates eval scores. The
standard method (e.g. GPT-3 appendix C / PaLM): build the set of
distinct word n-grams in the benchmark, then flag any training doc
containing one.

Scale shape: the benchmark side is tiny relative to a 100 TB corpus, so
its distinct-gram set is BROADCAST; the training corpus streams through
a map-side hash semi-join — the corpus gram stream is never shuffled.
Only the per-doc hit aggregation shuffles, and it carries one row per
(doc, matched gram), which contamination keeps rare by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import ngrams_all_from_tokens, tokens


def benchmark_grams(bench: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Distinct word n-grams of the benchmark set: (gram)."""
    return (
        bench.select(tokens(F.col(text_col)).alias("__toks"))
        .select(F.explode(ngrams_all_from_tokens(F.col("__toks"), n)).alias("gram"))
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-doc contamination: (id, n_hits, n_grams_hit) for docs sharing
    at least one n-gram with the benchmark.

    n_hits counts gram OCCURRENCES in the doc (a doc repeating a leaked
    gram scores higher); n_grams_hit counts distinct matched grams.
    Set broadcast_bench=False only if the benchmark is too large to
    broadcast — the join then shuffles both sides on the gram.
    """
    grams = benchmark_grams(bench, n, text_col)
    if broadcast_bench:
        grams = F.broadcast(grams)
    train_grams = train.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(ngrams_all_from_tokens(F.col("__toks"), n)).alias("gram"),
    )
    return (
        train_grams.join(grams, "gram", "inner")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("gram").alias("n_grams_hit"),
        )
    )
