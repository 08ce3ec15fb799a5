"""Text-analysis operators for training-data pipelines.

Beyond the reference's own surface (per the build brief): language-ID,
quality scoring, token counting, fingerprinting — each a pure relational
expression (no Python UDFs, whole-stage codegen end to end) so Catalyst
can fuse them with the scan and each has an exact DuckDB oracle.

Scale note: every function here is a narrow projection — at 100 TB these
run at scan speed with full column pruning; nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import (
    fingerprint,
    normalized_text,
    token_count,
    tokens,
)

# Tiny per-language stopword inventories (public common-word lists).
# Deterministic language-ID: argmax of distinct-stopword hits with a fixed
# priority order for ties (en > de > fr > es > it).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für", "von"),
    "fr": ("le", "la", "et", "les", "des", "est", "pour", "dans", "que", "une"),
    "es": ("el", "la", "que", "de", "los", "por", "con", "una", "para", "es"),
    "it": ("il", "la", "che", "di", "per", "con", "una", "sono", "del", "non"),
}
LANG_ORDER = ("en", "de", "fr", "es", "it")

PUNCT_CLASS = r"[.,!?;:]"


def _words_lower(text_col) -> Column:
    return tokens(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col))


def lang_hits(text_col, lang: str) -> Column:
    """Distinct stopword hits for one language (array_intersect is
    distinct-semantics in both Spark and DuckDB's list_intersect)."""
    return F.size(
        F.array_intersect(
            _words_lower(text_col), F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        )
    )


def lang_id(text_col) -> Column:
    """Argmax language with deterministic tie-break: scan LANG_ORDER and
    pick the first language achieving the max hit count ('und' if zero)."""
    hits = {lg: lang_hits(text_col, lg) for lg in LANG_ORDER}
    best = F.greatest(*[hits[lg] for lg in LANG_ORDER])
    expr = F.lit("und")
    # build right-to-left so earlier languages win ties
    for lg in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (hits[lg] == best), F.lit(lg)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratio features — the usual
    web-corpus quality signals, all codegen-friendly.

    Ratios are exact rational values of integer counts (deterministic
    across engines; division order fixed)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_CLASS), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    n_stop_en = lang_hits(text_col, "en")
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        n_punct.cast("int").alias("n_punct"),
        n_digit.cast("int").alias("n_digit"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(
            n_chars / F.greatest(n_tok, F.lit(1)), 6
        ).alias("avg_token_len"),
        n_stop_en.cast("int").alias("n_stopwords_en"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", lang_id(text_col))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fp", fingerprint(text_col)).withColumn(
        "norm_text", normalized_text(text_col)
    )
