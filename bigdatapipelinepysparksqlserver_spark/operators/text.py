"""Text-analysis operators over a documents corpus — token counting,
quality scoring, fingerprinting, language scoring.

All native Catalyst string/regex expressions (JVM-side, codegen'd). The
regex dialect is kept to the intersection of Java regex (Spark) and RE2
(DuckDB) so every operator stays oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# word-ish tokens: letter runs, digit runs, or single punctuation — a
# BPE-ish pre-tokenization regex (shared verbatim with the DuckDB oracle).
TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS_REGEX = r"\b(the|a|an|and|or|of|to|in|is|it)\b"


def _ws_token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document token counts: whitespace tokens + regex (BPE-ish) tokens."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        _ws_token_count(text).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0)).alias(
            "regex_tokens"
        ),
    )


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + composite score.

    Features: length, whitespace-token count, alpha ratio, punctuation
    ratio, stopword ratio, mean word length. Composite =
    0.4*alpha + 0.3*stopword + 0.3*min(tokens/64, 1), rounded to 6dp.
    Pure arithmetic over regexp counts → bit-identical across engines when
    the expression shape is mirrored.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = _ws_token_count(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("double")
    stops = F.size(F.regexp_extract_all(F.lower(text), F.lit(STOPWORDS_REGEX), 0)).cast(
        "double"
    )
    alpha_ratio = alpha / n_chars.cast("double")
    punct_ratio = punct / n_chars.cast("double")
    stop_ratio = stops / toks
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * F.least(toks / F.lit(64.0), F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        toks.cast("bigint").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalization fingerprint: md5 of lowercased, punctuation-stripped,
    whitespace-collapsed text — catches trivially-reformatted duplicates
    that exact hashing misses."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", ""), r" +", " "
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(norm.cast("binary")).alias("fingerprint"),
    )


# language marker words (shared with oracle); scores are marker-hit counts
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|in|to)\b",
    "es": r"\b(el|la|de|que|y|en)\b",
    "fr": r"\b(le|la|les|de|et|est)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
}


def language_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-marker language scores + argmax prediction.

    Deterministic tie-break: highest count wins, ties resolved by language
    code order (de < en < es < fr) via greatest+case chain; all-zero → 'und'.
    """
    low = F.lower(F.col(text_col))
    counts = {
        lang: F.size(F.regexp_extract_all(low, F.lit(rx), 0)) for lang, rx in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # alphabetical tie-break
        pred = pred.when(counts[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col),
        *[counts[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
        pred.alias("predicted_lang"),
    )
