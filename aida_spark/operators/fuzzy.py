"""Fuzzy candidate lookup (C5/C6): trigram-similarity matching of mention
keys against dictionary names, for mentions with no exact dictionary hit.

The reference backs this with pg_trgm (`DataAccessSQL.
getEntitiesForMentionByFuzzyMatching:170-206`: ``mention % 'x' AND
similarity(...) >= minSim``) or a MinHash-LSH prefilter over all
dictionary names (`EntityLookup.java:69-81,209-233`, ``mpi/lsh/LSH.java``).

Spark-first re-expression: both sides explode into padded character
trigrams; candidates meet in an equi-join on the trigram; similarity =
trigram-set Jaccard (pg_trgm's similarity measure). The dictionary-side
trigram index is computed once and reused — at scale it is the
partitioned inverted index the LSH variant approximates. Rare trigrams
dominate the join selectivity; hot trigrams (``' th'``) are bounded by a
document-frequency cap, the classic positional-filter trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_name_trigram_index", "fuzzy_match", "fuzzy_match_lsh"]


def _gram_rows(df: DataFrame, key_col: str, out_key: str) -> DataFrame:
    """Explode padded lowercase character trigrams (distinct per string);
    pg_trgm pads with two leading and one trailing space."""
    padded = f"concat('  ', lower(`{key_col}`), ' ')"
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({padded}) - 2, 1)), "
            f"i -> substring({padded}, i, 3))"
        )
    )
    return (
        df.select(F.col(key_col).alias(out_key), grams.alias("grams"))
        .withColumn("n_grams", F.size("grams"))
        .select(out_key, "n_grams", F.explode("grams").alias("gram"))
    )


def build_name_trigram_index(
    dictionary_names: DataFrame, name_col: str = "mention", max_gram_df: int = 0
) -> DataFrame:
    """(name, n_grams, gram) inverted index over dictionary names; persist
    and reuse across queries. ``max_gram_df`` > 0 drops ultra-common
    trigrams from the index (join-skew cap; exact similarity is still
    computed from n_grams so recall only is affected)."""
    idx = _gram_rows(dictionary_names.select(name_col).distinct(), name_col, "name")
    if max_gram_df > 0:
        df_counts = idx.groupBy("gram").count()
        idx = idx.join(
            F.broadcast(df_counts.filter(F.col("count") <= max_gram_df)),
            "gram",
            "left_semi",
        )
    return idx


def fuzzy_match(
    unmatched_keys: DataFrame,
    name_index: DataFrame,
    min_similarity: float = 0.5,
    key_col: str = "mention_key",
) -> DataFrame:
    """(mention_key, name, sim) for trigram Jaccard >= min_similarity."""
    q = _gram_rows(unmatched_keys.select(key_col).distinct(), key_col, "qkey")
    q = q.withColumnRenamed("n_grams", "q_n")
    isec = (
        q.join(name_index, "gram")
        .groupBy("qkey", "name", "q_n", "n_grams")
        .agg(F.count(F.lit(1)).alias("isec"))
    )
    sim = F.col("isec") / (F.col("q_n") + F.col("n_grams") - F.col("isec"))
    return (
        isec.withColumn("sim", sim)
        .filter(F.col("sim") >= min_similarity)
        .filter(F.col("qkey") != F.col("name"))
        .select(F.col("qkey").alias(key_col), F.col("name"), F.col("sim"))
    )


def _trigram_array(col_name: str):
    padded = f"concat('  ', lower(`{col_name}`), ' ')"
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({padded}) - 2, 1)), "
            f"i -> substring({padded}, i, 3))"
        )
    )


def fuzzy_match_lsh(
    unmatched_keys: DataFrame,
    dictionary_names: DataFrame,
    min_similarity: float = 0.5,
    key_col: str = "mention_key",
    name_col: str = "mention",
    num_perm: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """C6: MinHash-LSH prefilter over dictionary names + exact trigram
    verify — the scale path when the name list is too large for the full
    trigram inverted index. Mirrors the reference's design: char-4-gram
    MinHash banding to propose candidates (EntityLookup.java:69-81,
    mpi/lsh/LSH.java:44-110), then trigram similarity as the exact check
    (EntityLookup.java:209-233).

    Both sides hash to (band, band_hash) buckets; candidates meet in an
    equi-join on the bucket; the verify step is Catalyst array math.
    Recall is bounded by the banding (tune num_perm/bands); precision is
    exact after the verify.
    """
    from .dedup import minhash_signatures

    rows_per_band = num_perm // bands

    def banded(df: DataFrame, id_col: str, out: str) -> DataFrame:
        sigs = minhash_signatures(
            df.select(F.col(id_col)).distinct(),
            id_col=id_col,
            text_col=id_col,
            num_perm=num_perm,
            shingle_k=shingle_k,
        ).withColumnRenamed("id", out)
        return sigs.select(
            out,
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
        ).select(out, F.col("bb.band"), F.col("bb.bucket"))

    q = banded(unmatched_keys, key_col, "qkey")
    n = banded(dictionary_names, name_col, "name")
    cand = (
        q.join(n, ["band", "bucket"])
        .select("qkey", "name")
        .dropDuplicates(["qkey", "name"])
        .filter(F.col("qkey") != F.col("name"))
    )
    # exact trigram-Jaccard verify, Catalyst array math
    cand = cand.withColumn("q_grams", _trigram_array("qkey")).withColumn(
        "n_grams_arr", _trigram_array("name")
    )
    isec = F.size(F.array_intersect("q_grams", "n_grams_arr"))
    union = F.size(F.array_union("q_grams", "n_grams_arr"))
    return (
        cand.withColumn("sim", isec / union)
        .filter(F.col("sim") >= min_similarity)
        .select(F.col("qkey").alias(key_col), "name", "sim")
    )
