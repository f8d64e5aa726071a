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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_hashes", "find_contaminated", "find_contaminated_fuzzy"]


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


def find_contaminated_fuzzy(
    corpus: DataFrame,
    eval_df: DataFrame,
    jaccard_threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Paraphrase-robust decontamination: (doc_id, eval_id, jaccard) for
    corpus documents whose EXACT char-``shingle_k``-gram Jaccard with an
    eval document reaches ``jaccard_threshold`` — catching light edits
    the exact-n-gram rule (:func:`find_contaminated`) misses (reworded
    benchmark items share few verbatim 8-grams but keep high shingle
    overlap).

    Scale shape mirrors the exact path: the corpus is banded ONCE with
    the same seeded MinHash as ``dedup.minhash_lsh_pairs``; the eval
    side is tiny by construction, so its banded buckets BROADCAST and
    the join filters the corpus stream first — only corpus rows landing
    in an eval bucket survive to the shuffle. The banding only
    *proposes*: every reported pair is verified with the exact
    distinct-shingle Jaccard of the normalized texts, so near-threshold
    MinHash estimate bias cannot misclassify. No exact-dedup pre-pass:
    a corpus with many copies of a leaked eval item genuinely owes one
    output row per copy (the audit trail IS the point), and the
    broadcast filter bounds everything else.
    """
    from pyspark import StorageLevel
    from pyspark.sql.types import DoubleType

    from .dedup import minhash_signatures

    rows_per_band = num_perm // bands

    def _banded(df: DataFrame, ic: str, tc: str, out_id: str) -> DataFrame:
        norm = F.regexp_replace(F.lower(F.trim(F.col(tc))), r"\s+", " ")
        base = df.select(F.col(ic).alias("id"), norm.alias("norm"))
        sigs = minhash_signatures(
            base, id_col="id", text_col="norm",
            num_perm=num_perm, shingle_k=shingle_k,
        )
        banded = sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.slice(
                                    F.col("signature"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ).cast("string")
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(
            F.col("id").alias(out_id), F.col("bb.band"), F.col("bb.bucket")
        )
        return base.withColumnRenamed("id", out_id), banded

    c_texts, c_banded = _banded(corpus, id_col, text_col, "doc_id")
    e_texts, e_banded = _banded(eval_df, eval_id_col, eval_text_col, "eval_id")
    c_texts = c_texts.persist(StorageLevel.MEMORY_AND_DISK)

    cand = (
        c_banded.join(F.broadcast(e_banded), ["band", "bucket"])
        .select("doc_id", "eval_id")
        .dropDuplicates(["doc_id", "eval_id"])
    )

    @F.pandas_udf(DoubleType())
    def exact_jaccard(na: pd.Series, nb: pd.Series) -> pd.Series:
        k = shingle_k
        out = np.empty(len(na), dtype=np.float64)
        for i, (x, y) in enumerate(zip(na, nb)):
            gx = {x[j : j + k] for j in range(max(len(x) - k + 1, 1))}
            gy = {y[j : j + k] for j in range(max(len(y) - k + 1, 1))}
            inter = len(gx & gy)
            out[i] = inter / (len(gx) + len(gy) - inter)
        return pd.Series(out)

    result = (
        cand.join(c_texts.withColumnRenamed("norm", "norm_c"), "doc_id")
        .join(
            F.broadcast(e_texts.withColumnRenamed("norm", "norm_e")),
            "eval_id",
        )
        .withColumn(
            "jaccard", exact_jaccard(F.col("norm_c"), F.col("norm_e"))
        )
        .filter(F.col("jaccard") >= F.lit(float(jaccard_threshold)))
        .select("doc_id", "eval_id", "jaccard")
    )
    from .dedup import _finalize

    return _finalize(result, c_texts)
