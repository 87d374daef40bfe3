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


def ngrams_all_from_tokens(toks: Column, n: int) -> Column:
    """Non-distinct word n-grams from a token-array column (repetition
    analysis needs multiplicity, unlike dedup's distinct shingle sets).
    Delegates to dedup.grams_from_tokens — ONE gram builder in the repo;
    its perf contract (materialized array attribute, never an inline
    split(...)) applies here verbatim.
    """
    from .dedup import grams_from_tokens

    return grams_from_tokens(toks, n)


def ngrams_all(text: Column, n: int) -> Column:
    """Inline-tokenizer variant — for one-off array use only; exploding
    callers should tokenize in their own projection first (perf contract
    on ngrams_all_from_tokens)."""
    return ngrams_all_from_tokens(tokens(text), n)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    - top_word_frac: most frequent word's share of all tokens
    - dup_word_frac: share of tokens belonging to words occurring >= 2x
    - top_2gram_frac: most frequent 2-gram's share of all 2-grams

    Machine-generated / boilerplate text scores high on all three; the
    scalar quality features (q49) cannot see this — repetition needs
    per-term multiplicities. Shape: explode -> two-level aggregate, so
    the heavy first level (doc_id, term) is map-side combinable and the
    shuffle carries one row per distinct term per doc, never the corpus
    body. Explode+groupBy is deliberate: a HOF-over-array form would be
    interpreted (non-codegen) and Catalyst's project-collapsing would
    re-inline the gram build into every aggregate (see BENCH_NOTES).
    """
    words = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    ws = (
        words.groupBy(id_col, "t")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tok"),
            F.max("c").alias("top_word_c"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_word_mass"),
        )
    )
    grams = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(ngrams_all_from_tokens(F.col("__toks"), 2)).alias("g"),
    )
    gs = (
        grams.groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_2gram"), F.max("c").alias("top_2gram_c"))
    )
    out = ws.join(gs, id_col, "left")
    n_tok = F.col("n_tok").cast("double")
    n2 = F.coalesce(F.col("n_2gram"), F.lit(0)).cast("double")
    return out.select(
        F.col(id_col),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        (F.col("top_word_c") / n_tok).alias("top_word_frac"),
        (F.col("dup_word_mass") / n_tok).alias("dup_word_frac"),
        F.when(n2 > 0, F.coalesce(F.col("top_2gram_c"), F.lit(0)) / n2)
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac"),
    )
