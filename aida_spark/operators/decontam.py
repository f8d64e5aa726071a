"""Training-data decontamination: flag corpus documents sharing long
word n-grams with an evaluation/test set (the standard 8-13-gram overlap
rule used for pretraining-corpus hygiene).

Scale shape: the corpus side explodes into distinct (doc, ngram-hash)
rows in one narrow pass (JVM-side xxhash64 — no Python); the eval side
is tiny by construction and broadcasts; overlap is a broadcast equi-join
followed by a partial-aggregated count. The corpus is scanned once and
never shuffles on anything wider than (doc_id, eval_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_hashes", "find_contaminated"]


def ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """xxhash64 of each word n-gram of the lowercased text: (id, gram).
    Documents shorter than n words produce no rows. ``distinct=False``
    skips the global dedup shuffle — callers that count with
    ``countDistinct`` downstream don't need it."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    out = (
        df.select(
            F.col(id_col).alias("id"),
            words.alias("w"),
        )
        .filter(F.size("w") >= n)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("w"), i + 1, n))
                    ),
                )
            ).alias("gram"),
        )
    )
    return out.dropDuplicates(["id", "gram"]) if distinct else out


def find_contaminated(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_matches: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """(doc_id, eval_id, n_matched_grams) for every corpus document that
    shares >= ``min_matches`` distinct word ``n``-grams with an eval
    document. Emitting the pair (not just the doc) keeps the audit trail:
    which benchmark item leaked, matched how strongly.

    Shuffle shape: the corpus side is NOT pre-deduped — a global
    (id, gram) distinct would shuffle every corpus gram; instead the
    broadcast join filters first (matches are rare by construction) and
    ``countDistinct`` dedups only the surviving grams. The only shuffle
    carries matched (doc_id, eval_id, gram) rows."""
    c = ngram_hashes(corpus, id_col, text_col, n, distinct=False
                     ).withColumnRenamed("id", "doc_id")
    e = ngram_hashes(eval_df, eval_id_col, eval_text_col, n).withColumnRenamed(
        "id", "eval_id"
    )
    return (
        c.join(F.broadcast(e), "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.countDistinct("gram").alias("n_matched_grams"))
        .filter(F.col("n_matched_grams") >= min_matches)
    )
