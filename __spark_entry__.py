"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the full AIDA-style KG-construction pipeline
  (mention spotting -> candidate join -> per-conversation CocktailParty
  coherence solve -> triples) over transcripts synthesized from
  /root/testdata/sf0.001/documents.parquet plus the reference golden
  conversation.
- ``queries()``: one entry per implemented operator family (SURVEY.md §2 +
  the training-data operators), each runnable at any sf dir.
- ``oracle_sql()``: DuckDB-equivalent SQL. Fixture-driven AIDA queries use
  literal VALUES oracles (their golden outputs are pinned to the reference
  JUnit values); operators whose exact float semantics can't be reproduced
  in DuckDB omit the oracle (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

_PIPELINES: dict = {}
_SHIPPED: set = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """The driver supplies its own SparkSession; make sure executors can
    import aida_spark regardless of that session's working directory."""
    if id(spark) not in _SHIPPED:
        try:
            from aida_spark.session import ship_package

            ship_package(spark)
        except Exception:
            pass  # already shipped or local import works via cwd
        _SHIPPED.add(id(spark))


def _pipeline(
    spark: SparkSession, technique: str = "graph", max_turns_per_chunk: int = 0
):
    from aida_spark.core.disambiguate import DisambiguationConfig
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.fixtures import kb_tables

    _ensure_shipped(spark)
    key = (id(spark), technique, max_turns_per_chunk)
    if key not in _PIPELINES:
        cfg = PipelineConfig(
            disambiguation=DisambiguationConfig(technique=technique),
            max_turns_per_chunk=max_turns_per_chunk,
        )
        _PIPELINES[key] = AidaPipeline(spark, kb_tables(), cfg)
    return _PIPELINES[key]


def _golden_df(spark: SparkSession) -> DataFrame:
    from aida_spark.fixtures import golden_transcript

    return spark.createDataFrame(golden_transcript())


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples from transcripts (documents as single-turn
    conversations + the golden fixture conversation + synthetic multi-turn
    conversations over the fixture universe)."""
    from aida_spark.fixtures import golden_transcript, synth_transcripts
    import pandas as pd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_turns = docs.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    local = pd.concat([golden_transcript(), synth_transcripts(20, 6, seed=1)])
    transcripts = doc_turns.unionByName(
        spark.createDataFrame(local).withColumn(
            "turn_idx", F.col("turn_idx").cast("int")
        )
    )
    return _pipeline(spark).run(transcripts)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_aida_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pipeline(spark)
        .run(_golden_df(spark))
        .select("subj", "pred", "obj")
        .orderBy("subj")
    )


def _q_aida_prior_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pipeline(spark, technique="prior")
        .run(_golden_df(spark))
        .select("subj", "pred", "obj")
        .orderBy("subj")
    )


def _q_aida_prior_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIOR technique via the fully Catalyst-native fast path (window
    argmax, no Python solver) — same oracle as the UDF-based variant."""
    p = _pipeline(spark)
    return (
        p.triples(p.prior_only_assignments(_golden_df(spark)))
        .select("subj", "pred", "obj")
        .orderBy("subj")
    )


def _q_aida_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 chunking + O3 reconciliation end-to-end: the golden sentence as a
    two-turn conversation solved at max_turns_per_chunk=1 — each turn is an
    independent chunk, reconciled by surface form, and must reproduce the
    reference GRAPH entities per turn."""
    from aida_spark.fixtures import GOLDEN_SENTENCE
    import datetime
    import pandas as pd

    epoch = datetime.datetime(2026, 1, 1)
    two_turn = pd.DataFrame(
        [
            ("t1", 0, "user", GOLDEN_SENTENCE, "", epoch),
            ("t1", 1, "assistant", GOLDEN_SENTENCE, "", epoch),
        ],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    return (
        _pipeline(spark, max_turns_per_chunk=1)
        .run(spark.createDataFrame(two_turn))
        .select("subj", "pred", "obj")
        .orderBy("subj")
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aida_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs)


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(words))
        .cast("long")
        .alias("n_tokens"),
    )


def _q_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("long").alias("n_punct"),
        F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("long").alias("n_digits"),
        F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("long").alias("n_upper"),
    )


def _q_word_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 5)
    )


def _q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn"))
    )


def _q_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return counts.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("user_id", "event_type", "n", "rnk")


def _q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aida_spark.operators.knn import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN, recall-gated by the oracle: with enough independent hash
    tables the LSH result must EQUAL the exact cosine top-k (the oracle is
    the same SQL as knn_bruteforce), i.e. driver-verified recall = 1.0."""
    from aida_spark.operators.knn import lsh_bucketed_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    # params sized for full recall on this corpus: true top-5 cosines go
    # as low as ~0.3 (theta ~72deg, per-plane collision p ~0.6), so with 2
    # planes x 32 tables the per-neighbor miss probability is
    # (1 - 0.6^2)^32 ~ 1e-6 — the oracle equality IS the recall gate.
    return lsh_bucketed_topk(
        emb, queries, k=5, n_planes=2, n_tables=32
    ).select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN machinery gate: with n_probe == n_centroids every cell is
    probed, so the centroid-assignment + inverted-list join + exact rerank
    must reproduce the exact cosine top-k (the oracle). The recall/probe
    tradeoff at partial probing is pinned separately in pytest
    (test_ivf_partial_probe_recall) — this driver entry proves the
    distributed plumbing is lossless."""
    from aida_spark.operators.knn import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(
        emb, queries, k=5, n_centroids=16, n_probe=16, dim=64
    ).select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified with EXACT shingle Jaccard — the
    oracle recomputes the exact pair set in SQL, so the driver checks both
    precision and recall of the banding at this threshold."""
    from aida_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, jaccard_threshold=0.9).select("id_a", "id_b")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aida_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash(docs)


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded hamming-join near-dup pairs. The oracle is a pinned
    VALUES table (the operator is fully deterministic: seeded token hash,
    pigeonhole banding, exact popcount verify) — a determinism/regression
    gate in the spirit of the aida_* golden oracles, since the crc32-based
    hash itself is not ANSI-SQL-expressible."""
    from aida_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs, max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aida_spark.operators.textops import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        language_id(docs)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with synthetic PII planted for every 7th
    doc (the raw corpus has none) — counts and redacted-length per doc,
    mirrored exactly in the DuckDB oracle."""
    from aida_spark.operators.textops import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1 or 555-123-4567"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return redact_pii(planted).select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.length("text_redacted").cast("long").alias("redacted_len"),
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source training-mix sampling: 100% of src0, 50%
    of src1, 10% of everything else — decided by a Knuth multiplicative
    hash of doc_id, so the oracle reproduces the exact row set."""
    from aida_spark.operators.textops import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(
        docs, {"src0": 1.0, "src1": 0.5}, default_fraction=0.1
    ).select("doc_id", "source")


def _q_orders_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join (orders -> customer -> nation -> region) with a
    count aggregate; the dims broadcast, the fact scans once."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def _q_part_type_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x part join, distinct-agg per part type."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


def _q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream table: a new session
    starts after >30 min of inactivity per user (lag + running sum —
    the standard batch-windowing idiom)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        events.withColumn("new_session", new_session)
        .withColumn(
            "session_no",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("long"),
        )
        .select("event_id", "user_id", "session_no")
    )


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection over the corpus plus planted EXACT
    duplicates (vec_id < 20 copied to +100000) and planted NEAR duplicates
    (last element replaced with 0.5, +200000 — cosines 0.74-0.99, of which
    about half clear the 0.9 threshold): the LSH self-join must recover
    every pair the oracle's exact all-pairs cosine finds — including the
    near-identical-but-not-equal ones — and the exact verify must exclude
    the sub-threshold perturbed pairs on both sides identically."""
    from aida_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    head = base.filter(F.col("vec_id") < 20)
    exact_copies = head.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"), "embedding"
    )
    perturbed = head.select(
        (F.col("vec_id") + F.lit(200000)).alias("vec_id"),
        F.concat(
            F.slice(F.col("embedding"), 1, 63), F.array(F.lit(0.5))
        ).alias("embedding"),
    )
    allv = base.unionByName(exact_copies).unionByName(perturbed)
    return embedding_near_dups(
        allv, threshold=0.9, n_planes=4, n_tables=16, dim=64
    ).select("id_a", "id_b")


def _q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data curation decisions (dedup/quality/lang),
    drop reasons aggregated."""
    from aida_spark.operators.curate import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        curate_corpus(docs, min_chars=100, min_quality=0.3)
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing demo: documents bytes as opaque media payloads
    through the (stubbed) decode operator."""
    from aida_spark.operators.multimodal import decode_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )
    return decode_media(media)


def _q_media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real (stdlib) media decoding under the driver oracle: deterministic
    WAV and PGM/PPM payloads synthesized in-process, decoded with
    decoder='real' — STRICT mode, no fake fallback possible — and the
    decoded channel/rate/duration/dimension/feature values pinned in the
    oracle (the payload construction is seeded and bit-stable)."""
    import io
    import wave

    from aida_spark.operators.multimodal import decode_media

    def _wav(ch: int, rate: int, frames: int, blip: bytes) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(blip * ch * frames)
        return buf.getvalue()

    payloads = [
        (1, "audio", _wav(2, 8000, 4000, b"\x01\x02"), "audio/wav"),
        (2, "audio", _wav(1, 16000, 24000, b"\x7f\x00"), "audio/wav"),
        (3, "image", b"P5\n6 4\n255\n" + bytes(range(24)),
         "image/x-portable-graymap"),
        (4, "image", b"P6\n2 2\n255\n" + bytes(range(12)),
         "image/x-portable-pixmap"),
    ]
    df = spark.createDataFrame(
        [(i, k, bytearray(c), m) for i, k, c, m in payloads],
        "media_id long, kind string, content binary, mime string",
    )
    return decode_media(df, decoder="real").select(
        "media_id",
        "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "feature_hash",
    )


def _shipped(fn):
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "aida_triples_golden": _shipped(_q_aida_triples),
        "aida_prior_only_golden": _shipped(_q_aida_prior_only),
        "aida_prior_fast_golden": _shipped(_q_aida_prior_fast),
        "aida_triples_chunked": _shipped(_q_aida_chunked),
        "dedup_exact": _shipped(_q_dedup_exact),
        "doc_token_count": _shipped(_q_token_count),
        "doc_quality_counts": _shipped(_q_quality_counts),
        "word_doc_freq": _shipped(_q_word_doc_freq),
        "topk_orders_per_customer": _shipped(_q_topk_orders),
        "user_event_counts": _shipped(_q_user_event_counts),
        "knn_bruteforce": _shipped(_q_knn_bruteforce),
        "knn_lsh": _shipped(_q_knn_lsh),
        "knn_ivf": _shipped(_q_knn_ivf),
        "minhash_lsh_pairs": _shipped(_q_minhash_pairs),
        "simhash": _shipped(_q_simhash),
        "simhash_pairs": _shipped(_q_simhash_pairs),
        "lang_id_counts": _shipped(_q_lang_id),
        "event_sessions": _shipped(_q_event_sessions),
        "curate_corpus": _shipped(_q_curate_corpus),
        "embedding_near_dups": _shipped(_q_embedding_near_dups),
        "redact_pii": _shipped(_q_redact_pii),
        "stratified_sample": _shipped(_q_stratified_sample),
        "orders_per_region": _shipped(_q_orders_per_region),
        "part_type_supplier_counts": _shipped(_q_part_type_supplier_counts),
        "media_decode": _shipped(_q_media_decode),
        "media_decode_real": _shipped(_q_media_decode_real),
    }


def oracle_sql() -> dict[str, str]:
    return {
        # fixture-pinned goldens (reference JUnit outputs)
        "aida_triples_golden": """
            SELECT * FROM (VALUES
                ('t1/0/17', 'linksTo', 'Kashmir_(song)'),
                ('t1/0/28', 'linksTo', 'Knebworth_Festival'),
                ('t1/0/5',  'linksTo', 'Jimmy_Page')
            ) AS t(subj, pred, obj)
        """,
        "aida_prior_only_golden": """
            SELECT * FROM (VALUES
                ('t1/0/17', 'linksTo', 'Kashmir'),
                ('t1/0/28', 'linksTo', 'Knebworth_Festival'),
                ('t1/0/5',  'linksTo', 'Larry_Page')
            ) AS t(subj, pred, obj)
        """,
        "aida_prior_fast_golden": """
            SELECT * FROM (VALUES
                ('t1/0/17', 'linksTo', 'Kashmir'),
                ('t1/0/28', 'linksTo', 'Knebworth_Festival'),
                ('t1/0/5',  'linksTo', 'Larry_Page')
            ) AS t(subj, pred, obj)
        """,
        "aida_triples_chunked": """
            SELECT * FROM (VALUES
                ('t1/0/17', 'linksTo', 'Kashmir_(song)'),
                ('t1/0/28', 'linksTo', 'Knebworth_Festival'),
                ('t1/0/5',  'linksTo', 'Jimmy_Page'),
                ('t1/1/17', 'linksTo', 'Kashmir_(song)'),
                ('t1/1/28', 'linksTo', 'Knebworth_Festival'),
                ('t1/1/5',  'linksTo', 'Jimmy_Page')
            ) AS t(subj, pred, obj)
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS text_hash,
                   COUNT(*) AS n_dups,
                   MIN(doc_id) AS keep_id
            FROM documents
            GROUP BY 1
        """,
        "doc_token_count": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "doc_quality_counts": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                   length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
            FROM documents
        """,
        "word_doc_freq": """
            SELECT word, COUNT(DISTINCT doc_id) AS df
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
                FROM documents
            )
            WHERE word <> ''
            GROUP BY word
            HAVING COUNT(DISTINCT doc_id) >= 5
        """,
        "topk_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "user_event_counts": """
            SELECT user_id, event_type, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n DESC, event_type ASC
                   ) AS rnk
            FROM (
                SELECT user_id, event_type, COUNT(*) AS n
                FROM events GROUP BY user_id, event_type
            )
        """,
        "knn_bruteforce": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               b.embedding::DOUBLE[], q.embedding::DOUBLE[]
                           ) DESC, b.vec_id ASC
                       ) AS rank
                FROM embeddings b, embeddings q
                WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        "redact_pii": """
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN
                           text || ' contact user' || doc_id ||
                           '@example.com at 10.0.' || (doc_id % 256) ||
                           '.1 or 555-123-4567'
                       ELSE text END AS text
                FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS n_email,
                   len(regexp_extract_all(text,
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                       AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS n_phone,
                   length(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                       '<IPV4>', 'g'),
                       '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b',
                       '<PHONE>', 'g')) AS redacted_len
            FROM planted
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE ((doc_id % 1000003) * 2654435761) % 10000 <
                  CASE WHEN source = 'src0' THEN 10000
                       WHEN source = 'src1' THEN 5000
                       ELSE 1000 END
        """,
        "orders_per_region": """
            SELECT r_name,
                   COUNT(*) AS n_orders,
                   COUNT(DISTINCT o_custkey) AS n_customers
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "part_type_supplier_counts": """
            SELECT p_type,
                   COUNT(*) AS n_items,
                   COUNT(DISTINCT l_suppkey) AS n_suppliers
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type
        """,
        "event_sessions": """
            SELECT event_id, user_id,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_no
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) > 1800
                            OR LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) IS NULL
                       THEN 1 ELSE 0 END AS new_session
                FROM events
            )
        """,
        # knn_lsh is recall-gated: with 32 independent hash tables over 500
        # vectors the LSH candidates cover the true top-k, so the result
        # must EQUAL the exact cosine top-k (same SQL as knn_bruteforce).
        "knn_lsh": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               b.embedding::DOUBLE[], q.embedding::DOUBLE[]
                           ) DESC, b.vec_id ASC
                       ) AS rank
                FROM embeddings b, embeddings q
                WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        # knn_ivf probes all cells -> must equal exact top-k (see query doc)
        "knn_ivf": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               b.embedding::DOUBLE[], q.embedding::DOUBLE[]
                           ) DESC, b.vec_id ASC
                       ) AS rank
                FROM embeddings b, embeddings q
                WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        # minhash_lsh_pairs reports only exact-shingle-Jaccard-verified
        # pairs over exact-dup representatives; the oracle recomputes the
        # full exact pair set, checking banding precision AND recall.
        "minhash_lsh_pairs": """
            WITH norm AS (
                SELECT doc_id AS id,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
                FROM documents
            ), reps AS (
                SELECT min(id) AS id, min(s) AS s FROM norm GROUP BY md5(s)
            ), grams AS (
                SELECT DISTINCT id, substring(s, i, 5) AS g
                FROM reps, unnest(generate_series(1, greatest(len(s)-4, 1))) AS t(i)
            ), sizes AS (
                SELECT id, count(*) AS n FROM grams GROUP BY id
            ), isec AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
                FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b
            FROM isec
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9
        """,
        "simhash_pairs": """
            SELECT * FROM (VALUES
                (8, 245, 2),
                (12, 350, 3),
                (18, 341, 3),
                (31, 383, 2),
                (44, 446, 2),
                (45, 267, 3),
                (45, 413, 2),
                (49, 267, 3),
                (49, 413, 2),
                (58, 293, 3),
                (61, 185, 2),
                (70, 447, 3),
                (70, 493, 2),
                (72, 377, 2),
                (73, 266, 3),
                (92, 450, 2),
                (98, 290, 3),
                (107, 387, 1),
                (120, 332, 3),
                (128, 197, 3),
                (166, 323, 1),
                (217, 463, 2),
                (228, 363, 3),
                (267, 413, 1),
                (285, 301, 1),
                (310, 389, 1),
                (317, 403, 3),
                (318, 386, 3),
                (393, 420, 2),
                (434, 466, 3),
                (435, 486, 2),
                (447, 493, 3),
                (458, 462, 1)
            ) AS t(id_a, id_b, hamming)
        """,
        "lang_id_counts": """
            WITH h AS (
                SELECT doc_id,
                    len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
                        ['the','and','of','to','in','is','that','it','was','for'])) AS h_en,
                    len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
                        ['der','die','und','das','ist','nicht','ein','mit','von','zu'])) AS h_de,
                    len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
                        ['le','la','et','les','des','est','que','une','dans','pour'])) AS h_fr,
                    len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
                        ['el','la','los','que','de','es','una','por','con','para'])) AS h_es
                FROM documents
            )
            SELECT lang_pred, COUNT(*) AS n FROM (
                SELECT CASE
                    WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                    WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                    WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                    WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                    ELSE 'es' END AS lang_pred
                FROM h
            ) GROUP BY lang_pred
        """,
        "curate_corpus": """
            WITH words AS (
                SELECT doc_id, text,
                       string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM documents
            ), feats AS (
                SELECT doc_id,
                    length(text) AS n_chars,
                    length(regexp_replace(text,
                        '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
                    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                    len(w) AS n_words,
                    len(list_intersect(w,
                        ['the','and','of','to','in','is','that','it','was','for'])) AS stop_hits,
                    len(list_intersect(w,
                        ['der','die','und','das','ist','nicht','ein','mit','von','zu'])) AS h_de,
                    len(list_intersect(w,
                        ['le','la','et','les','des','est','que','une','dans','pour'])) AS h_fr,
                    len(list_intersect(w,
                        ['el','la','los','que','de','es','una','por','con','para'])) AS h_es,
                    ROW_NUMBER() OVER (
                        PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                        '\\s+', ' ', 'g'))
                        ORDER BY doc_id
                    ) AS dup_rank
                FROM words
            ), scored AS (
                SELECT doc_id, n_chars, dup_rank,
                    greatest(0.0, least(1.0,
                        0.5 + stop_hits / (n_words + 1)
                            - n_punct / (n_chars + 1)
                            - n_digits / (n_chars + 1))) AS quality_score,
                    CASE
                        WHEN greatest(stop_hits, h_de, h_fr, h_es) = 0 THEN 'unknown'
                        WHEN stop_hits = greatest(stop_hits, h_de, h_fr, h_es) THEN 'en'
                        WHEN h_de = greatest(stop_hits, h_de, h_fr, h_es) THEN 'de'
                        WHEN h_fr = greatest(stop_hits, h_de, h_fr, h_es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
                FROM feats
            )
            SELECT reason, COUNT(*) AS n FROM (
                SELECT CASE
                    WHEN dup_rank > 1 THEN 'exact_dup'
                    WHEN n_chars < 100 THEN 'too_short'
                    WHEN n_chars > 100000 THEN 'too_long'
                    WHEN quality_score < 0.3 THEN 'low_quality'
                    WHEN lang_pred NOT IN ('en') THEN 'wrong_lang'
                    ELSE 'kept' END AS reason
                FROM scored
            ) GROUP BY reason
        """,
        # embedding_near_dups: exact all-pairs cosine over the corpus plus
        # the planted duplicates — the LSH path must find every such pair.
        "embedding_near_dups": """
            WITH allv AS (
                SELECT vec_id, embedding::DOUBLE[] AS embedding
                FROM embeddings
                UNION ALL
                SELECT vec_id + 100000 AS vec_id, embedding::DOUBLE[]
                FROM embeddings WHERE vec_id < 20
                UNION ALL
                SELECT vec_id + 200000 AS vec_id,
                       list_concat(embedding[1:63]::DOUBLE[], [0.5]::DOUBLE[])
                FROM embeddings WHERE vec_id < 20
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM allv a, allv b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.9
        """,
        "media_decode_real": """
            SELECT * FROM (VALUES
                (1, 'audio', 2, 8000, 500, 865444394653941182),
                (2, 'audio', 1, 16000, 1500, 2328940674978471881),
                (3, 'image', 6, 4, 0, 7678575031778961098),
                (4, 'image', 2, 2, 0, 8719913294472408751)
            ) AS t(media_id, kind, width, height, duration_ms, feature_hash)
        """,
        # simhash / media_decode: hash-mixing / binary-decode semantics not
        # reproducible in ANSI SQL -> rows-only checks.
    }
