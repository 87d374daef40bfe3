"""Text-analysis operators for training-data curation.

All pure column expressions (no Python UDFs): language ID by stopword
voting, quality stats (token counts / lengths / type-token ratio),
regex token counting, and content fingerprinting. Each is a single
scan-side projection — they compose into one pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import text_fingerprint, tokens

# Deterministic stopword vote table. Tie-break: first max in alphabetical
# lang order. (On real corpora these are per-language stopword lists; the
# mechanism — count hits per language, argmax — is identical.)
LANG_KEYWORDS: dict[str, tuple[str, ...]] = {
    "de": ("hash", "key", "window", "batch"),
    "en": ("the", "a", "order", "table", "row"),
    "es": ("slow", "agg", "merge", "value"),
    "fr": ("scan", "data", "query", "column"),
    "zh": ("join", "small", "customer", "line"),
}

# BPE-ish tokenizer: letter runs, digit runs, single punctuation.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)

    def _score(words: tuple[str, ...]) -> Column:
        # closure, not a lambda default arg — PySpark infers HOF arity
        # from the Python signature
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    return {lang: _score(words) for lang, words in LANG_KEYWORDS.items()}


def lang_id(text: Column) -> Column:
    """Predicted language code: argmax stopword hits, alphabetical tie-break."""
    scores = lang_scores(text)
    mx = F.greatest(*scores.values())
    expr = None
    for lang in sorted(scores):
        cond = scores[lang] == mx
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token count, mean token length, TTR."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        F.round(total_len.cast("double") / n, 6).alias("avg_token_len"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias("type_token_ratio"),
    )


def token_count(text: Column) -> Column:
    """Sub-word-ish token count via regex extraction (codegen regex)."""
    # idx=0 = whole match (Spark defaults to capture group 1; DuckDB to 0)
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("bigint")


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), text_fingerprint(F.col(text_col)).alias("fp"))
