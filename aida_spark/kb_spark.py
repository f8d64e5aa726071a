"""Spark-side knowledge-base ETL: raw repository tables -> per-entity
payload bundles, computed entirely with Catalyst-native joins, window
functions and column math (no Python UDFs).

This is the Spark re-expression of the reference's weight pipeline
(SURVEY.md §2.4): K1 top-N-per-entity window, K2 keyphrase->token
expansion join, K3 IDF, K4 4-cell MI, K8 word expansion — all as columns,
so the optimizer gets pushdown/pruning for free and the expensive per-row
math runs in whole-stage codegen.

Reference anchors: DataAccessSQLCache.java:171-197 (the windowed top-N
query), KeyphrasesContext.java:301-326 (IDF), WeightComputation.java:102-220
(MI), DataAccessForTesting.java:301-334 (which weights feed the fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["mi_expr", "idf_expr", "build_entity_bundles", "load_kb_tables"]


def _log2(col):
    return F.log(col) / F.log(F.lit(2.0))


def mi_expr(a, b, ab, total):
    """4-cell mutual information as a Catalyst column expression with the
    reference's zero-cell flooring (WeightComputation.computeMI).

    a = entity superdoc size, b = keyword doc frequency, ab = co-occurrence
    count, total = collection size. All inputs are numeric columns/literals.
    """
    a = a.cast("double")
    b = b.cast("double")
    ab = ab.cast("double")
    total = total.cast("double")

    def floor_zero(x):
        return F.when(x == 0.0, 1.0 / total).otherwise(x / total)

    p_d = floor_zero(a)
    p_nd = floor_zero(total - a)
    p_k = floor_zero(b)
    p_nk = floor_zero(total - b)

    p_dk = F.when(ab == 0.0, 1.0).otherwise(ab) / total
    p_ndk = F.when((b - ab) <= 0.0, 1.0).otherwise(b - ab) / total
    p_dnk = F.when((a - ab) == 0.0, 1.0).otherwise(a - ab) / total
    p_ndnk = (
        F.when((total - (a + b - ab)) == 0.0, 1.0).otherwise(total - (a + b - ab))
        / total
    )

    score = (
        p_dk * _log2(p_dk / (p_d * p_k))
        + p_ndk * _log2(p_ndk / (p_nd * p_k))
        + p_dnk * _log2(p_dnk / (p_d * p_nk))
        + p_ndnk * _log2(p_ndnk / (p_nd * p_nk))
    )
    # F.log returns NULL (not NaN) for non-positive args (e.g. a-ab < 0 on
    # inconsistent counts); the reference zeroes NaN (KeyphrasesContext), so
    # map both NaN and NULL to 0.0 or the NULL would poison the MI total.
    return F.coalesce(F.when(F.isnan(score), 0.0).otherwise(score), F.lit(0.0))


def idf_expr(df_col, collection_size: int):
    """Keyword IDF = log2(collectionSize / df) with Java *integer* division
    (KeyphrasesContext.java:309) — floor() replicates the truncation."""
    return _log2(F.floor(F.lit(collection_size) / df_col.cast("long")).cast("double"))


def load_kb_tables(spark: SparkSession, tables: dict) -> dict[str, DataFrame]:
    """Accepts a dict of pandas DataFrames (fixtures.kb_tables()) or paths
    and returns Spark DataFrames."""
    out = {}
    for name, t in tables.items():
        if isinstance(t, DataFrame):
            out[name] = t
        elif isinstance(t, str):
            out[name] = spark.read.parquet(t)
        else:
            out[name] = spark.createDataFrame(t)
    return out


def build_entity_bundles(
    kb: dict[str, DataFrame],
    collection_size: int,
    min_keyphrase_weight: float = 0.0,
    max_keyphrases_per_entity: int | None = None,
) -> DataFrame:
    """entity keyphrase/keyword payload, token grain (all scalar columns):

      (entity, kp, position, token, expanded, mi, idf, inlinks_csv)

    Plan shape at scale: one shuffle (the entity-keyword co-occurrence
    aggregation); all dimension joins broadcast; the MI/IDF math is
    codegen'd column arithmetic. The optional top-N filter is the K1
    window — expressed as row_number() so Spark can push the rank limit.
    """
    ekp = kb["entity_keyphrases"]  # entity, keyphrase, count

    # Optional K1 pruning: weight floor + top-N per entity by NPMI weight.
    if min_keyphrase_weight > 0.0 or max_keyphrases_per_entity:
        ec = kb["entity_counts"].withColumnRenamed("count", "e_count")
        kpc = kb["keyphrase_counts"].withColumnRenamed("count", "kp_df")
        joint = (
            ekp.join(F.broadcast(ec), "entity")
            .join(F.broadcast(kpc), "keyphrase")
        )
        # NPMI = ln(p(ab)/(p(a)p(b))) / -ln p(ab); ab==0 -> -1
        pab = F.col("count") / F.lit(collection_size)
        pa = F.col("e_count") / F.lit(collection_size)
        pb = F.col("kp_df") / F.lit(collection_size)
        npmi = F.when(
            F.col("count") == 0, F.lit(-1.0)
        ).otherwise(F.log(pab / (pa * pb)) / -F.log(pab))
        joint = joint.withColumn("kp_weight", npmi)
        if min_keyphrase_weight > 0.0:
            joint = joint.filter(F.col("kp_weight") > min_keyphrase_weight)
        if max_keyphrases_per_entity:
            w = Window.partitionBy("entity").orderBy(
                F.desc("kp_weight"), F.asc("keyphrase")
            )
            joint = joint.withColumn("rn", F.row_number().over(w)).filter(
                F.col("rn") <= max_keyphrases_per_entity
            )
        ekp = joint.select("entity", "keyphrase", "count")

    kpt = kb["keyphrase_tokens"]  # keyphrase, token, position
    kwc = kb["keyword_counts"].withColumnRenamed("count", "kw_df")
    ec = kb["entity_counts"].withColumnRenamed("count", "e_count")
    kpdf = kb["keyphrase_counts"].withColumnRenamed("count", "kp_df")
    wexp = kb["word_expansion"]  # word(id), expansion(id)

    # (entity, keyphrase, token): keyword-level rows
    ekt = (
        ekp.join(kpt, "keyphrase")
        .join(F.broadcast(kwc), F.col("token") == F.col("keyword"), "left")
        .drop("keyword")
        .join(F.broadcast(ec), "entity")
        .join(F.broadcast(kpdf), "keyphrase", "left")
        .join(
            F.broadcast(wexp), F.col("token") == F.col("word"), "left"
        )
        .drop("word")
    )

    # entity-keyword co-occurrence = sum of co-counts over the entity's
    # keyphrases containing the token (DataAccessForTesting:486-509)
    e_kw = ekt.groupBy("entity", "token").agg(F.sum("count").alias("ekw_count"))
    ekt = ekt.join(e_kw, ["entity", "token"])

    ekt = ekt.withColumn(
        "mi",
        mi_expr(
            F.col("e_count"),
            F.coalesce(F.col("kw_df"), F.lit(0)),
            F.col("ekw_count"),
            F.lit(collection_size),
        ),
    ).withColumn(
        "idf",
        F.when(
            F.col("kw_df").isNull() | (F.col("kw_df") <= 0), F.lit(0.0)
        ).otherwise(idf_expr(F.col("kw_df"), collection_size)),
    )

    # Flat token-grain payload: one scalar row per (entity, keyphrase,
    # token). Deliberately NO nested struct columns — they are rebuilt
    # into per-entity dicts inside the solver UDF. (Nested
    # array<struct<...>> columns crash pyarrow's cogroup arrow->pandas
    # path in this environment, and flat rows also avoid the two
    # collect_list shuffles an array assembly would need.)
    inl = kb["entity_inlinks"].select(
        "entity",
        F.concat_ws(
            ",", F.transform(F.sort_array(F.col("inlinks")), lambda x: x.cast("string"))
        ).alias("inlinks_csv"),
    )
    if "entity_types" in kb:
        types = kb["entity_types"].select(
            "entity", F.concat_ws(",", F.col("types")).alias("types_csv")
        )
        inl = inl.join(F.broadcast(types), "entity", "full").select(
            "entity",
            F.coalesce(F.col("inlinks_csv"), F.lit("")).alias("inlinks_csv"),
            F.coalesce(F.col("types_csv"), F.lit("")).alias("types_csv"),
        )
    else:
        inl = inl.withColumn("types_csv", F.lit(""))
    flat = (
        ekt.join(F.broadcast(inl), "entity", "left")
        .select(
            "entity",
            F.col("keyphrase").alias("kp"),
            "position",
            "token",
            F.coalesce(F.col("expansion"), F.lit(0)).alias("expanded"),
            "mi",
            "idf",
            # raw unit counts ride along so the solver can run count-based
            # measures (M4 unit LMs) without a second KB pass: entity-kp
            # co-count, kp doc-frequency, keyword doc-frequency, superdoc size
            F.col("count").cast("long").alias("kp_count"),
            F.coalesce(F.col("kp_df"), F.lit(0)).cast("long").alias("kp_df"),
            F.coalesce(F.col("kw_df"), F.lit(0)).cast("long").alias("kw_df"),
            F.col("e_count").cast("long").alias("e_count"),
            F.coalesce(F.col("inlinks_csv"), F.lit("")).alias("inlinks_csv"),
            F.coalesce(F.col("types_csv"), F.lit("")).alias("types_csv"),
        )
    )
    # entities with inlinks but no keyphrases still need a payload row
    kp_less = (
        inl.join(ekp.select("entity").distinct(), "entity", "left_anti")
        .select(
            "entity",
            F.lit(None).cast("long").alias("kp"),
            F.lit(None).cast("long").alias("position"),
            F.lit(None).cast("long").alias("token"),
            F.lit(0).cast("long").alias("expanded"),
            F.lit(None).cast("double").alias("mi"),
            F.lit(None).cast("double").alias("idf"),
            F.lit(None).cast("long").alias("kp_count"),
            F.lit(None).cast("long").alias("kp_df"),
            F.lit(None).cast("long").alias("kw_df"),
            F.lit(None).cast("long").alias("e_count"),
            F.col("inlinks_csv"),
            F.col("types_csv"),
        )
    )
    return flat.unionByName(kp_less)
