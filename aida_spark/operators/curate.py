"""Corpus curation: the composite training-data filter a pre-training
pipeline runs over raw documents — exact dedup, quality gates, language
filter, optional near-dup removal — emitting every document with a
keep/drop decision and the reason (auditable curation, not silent drops).

All gates except MinHash are Catalyst column math; the output is one row
per input document so the decision table can be joined back or used as a
filter mask at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import language_id, quality_metrics

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_quality: float = 0.3,
    allowed_langs: tuple = ("en",),
    near_dup_threshold: float = 0.0,
) -> DataFrame:
    """Returns (id, keep boolean, reason string). Drop precedence:
    exact_dup > too_short > too_long > low_quality > wrong_lang > near_dup.
    Exact dedup keeps the smallest id of each duplicate group."""
    base = quality_metrics(language_id(docs), text_col)

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    w = Window.partitionBy(F.md5(norm)).orderBy(F.col(id_col))
    base = base.withColumn("_dup_rank", F.row_number().over(w))

    reason = (
        F.when(F.col("_dup_rank") > 1, "exact_dup")
        .when(F.col("n_chars") < min_chars, "too_short")
        .when(F.col("n_chars") > max_chars, "too_long")
        .when(F.col("quality_score") < min_quality, "low_quality")
        .when(~F.col("lang_pred").isin(*allowed_langs), "wrong_lang")
    )
    out = base.select(
        F.col(id_col).alias("id"),
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason").isNull()).select(
        "id", "keep", F.coalesce(F.col("reason"), F.lit("kept")).alias("reason")
    )

    if near_dup_threshold > 0.0:
        from .dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            docs, id_col=id_col, text_col=text_col,
            jaccard_threshold=near_dup_threshold,
        )
        # drop the higher id of each near-dup pair (if still kept)
        near_dups = pairs.select(F.col("id_b").alias("id")).distinct()
        out = (
            out.join(near_dups.withColumn("_nd", F.lit(True)), "id", "left")
            .withColumn(
                "reason",
                F.when(
                    F.col("keep") & F.col("_nd").isNotNull(), "near_dup"
                ).otherwise(F.col("reason")),
            )
            .withColumn("keep", F.col("reason") == "kept")
            .drop("_nd")
        )
    return out
