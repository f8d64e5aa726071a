"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All hot-path operators are Catalyst-native column expressions (JVM-side,
whole-stage codegen) — no per-row Python. They operate on any DataFrame
with a text column (the driver testdata's ``documents`` table, or the
transcript ``text`` column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "quality_metrics",
    "language_id",
    "fingerprint",
]

# Compact closed-class marker words per language for the n-gram/stopword
# language-ID heuristic. Deliberately small: these are the highest-frequency
# function words, which is what a ratio heuristic needs.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "que", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (word-chunks of <=4 chars ~ GPT-style token granularity)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.withColumn(
        "n_tokens",
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
            F.size(words)
        ),
    ).withColumn(
        "n_subwords",
        # ceil(len(word)/4) summed over words: cheap deterministic proxy
        F.aggregate(
            words,
            F.lit(0),
            lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
        ),
    )


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / uppercase / stopword-ratio features
    (the standard pre-training quality filters), all as column math."""
    t = F.col(text_col)
    n_chars = F.length(t)
    stripped = {
        "punct": F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", "")),
        "digits": F.length(F.regexp_replace(t, r"[^0-9]", "")),
        "upper": F.length(F.regexp_replace(t, r"[^A-Z]", "")),
        "spaces": F.length(F.regexp_replace(t, r"[^ ]", "")),
    }
    en = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    words = _words(t)
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_punct", stripped["punct"])
        .withColumn("n_digits", stripped["digits"])
        .withColumn("n_upper", stripped["upper"])
        .withColumn("n_words", F.size(words))
        .withColumn(
            "stopword_hits", F.size(F.array_intersect(words, en))
        )
    )
    return out.withColumn(
        "quality_score",
        # crude composite in [0,1]: penalize punct/digit-heavy, reward
        # stopword coverage (fluent prose) and mid-range length
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                + F.col("stopword_hits") / (F.col("n_words") + F.lit(1))
                - F.col("n_punct") / (F.col("n_chars") + F.lit(1))
                - F.col("n_digits") / (F.col("n_chars") + F.lit(1)),
            ),
        ),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID over a fixed marker vocabulary.
    Pure array intersection — no UDF, fully codegen'd."""
    words = _words(F.col(text_col))
    hit_cols = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        hit_cols.append(
            F.size(F.array_intersect(words, arr)).alias(f"hits_{lang}")
        )
    tmp = df.select("*", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in _LANG_MARKERS])
    lang_expr = F.lit("unknown")
    # reversed so earlier languages win ties (en first)
    for lang in reversed(list(_LANG_MARKERS)):
        lang_expr = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(lang_expr)
    return tmp.withColumn("lang_pred", lang_expr).drop(
        *[f"hits_{lang}" for lang in _LANG_MARKERS]
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint: xxhash64 of the whitespace-normalized,
    lowercased text (document-level rolling-hash analogue, JVM-side)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(norm))
