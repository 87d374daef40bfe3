"""PII detection and redaction for training-data curation.

A corpus headed into model training must be scrubbed of personally
identifiable information. This operator detects and masks the standard
structured-PII categories (email, SSN, phone, IPv4, credit-card) with
pure codegen regex expressions — `regexp_count` for per-category tallies
and chained `regexp_replace` for masking. No UDFs: at 100 TB this is a
single scan-side projection that stays inside whole-stage codegen, and
the regexes are written in the common Java-regex / RE2 subset (character
classes, bounded repetition, `\\b` word boundaries — no lookaround, no
backreferences) so a DuckDB oracle replicates the behavior exactly.

Category order matters: masking is applied sequentially in PII_PATTERNS
order, so an earlier category consumes text before a later pattern sees
it. Counts are computed on the ORIGINAL text per category, independently
— a substring matched by two categories is counted by both (documented
trade; keeps each count meaningful on its own).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (category, pattern, mask) — ordered; the common Java/RE2 regex subset.
# Email first (its local part may contain digits that other patterns
# could nibble), then the longest digit shapes down to the shortest.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("credit_card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts on the given text column (bigint)."""
    return {
        cat: F.regexp_count(text, F.lit(pat)).cast("bigint")
        for cat, pat, _ in PII_PATTERNS
    }


def redact(text: Column) -> Column:
    """Mask every PII category, applied in PII_PATTERNS order."""
    out = text
    for _, pat, mask in PII_PATTERNS:
        out = F.regexp_replace(out, pat, mask)
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub a corpus: redacted text + per-category counts + total.

    One narrow projection — no shuffle, no UDF; safe to chain in front
    of any downstream curation step at full corpus scale.
    """
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        redact(F.col(text_col)).alias("redacted"),
        *[c.alias(f"n_{cat}") for cat, c in counts.items()],
        total.alias("n_pii"),
    )
