"""The distributed KG-construction pipeline: Iceberg/Parquet transcripts
-> mention spotting -> candidate join -> per-conversation coherence solve
-> (subj, pred, obj) triples.

Stage plan (SURVEY.md §3.1 "Spark shape") and its scale rationale:

  A. spot      mapInPandas over turns (narrow, no shuffle): tokenize +
               dictionary max-match -> distinct (conv_id, mention_key).
  B. candidates mention_key join dictionary (+rank filter pushed into the
               join, C2) — broadcast when the dictionary fits, else a
               shuffle-hash join; AQE skew-join handles hot keys ("Page").
  C. payload   candidates join per-entity bundles (K1-K8 precomputed by
               kb_spark.build_entity_bundles) — shuffle keyed by entity.
  D. solve     cogroup (transcripts, payload) by conv_id ->
               applyInPandas: rebuild the conversation document
               deterministically, run the exact CocktailParty solver from
               aida_spark.core. The only per-conversation Python; graphs
               are <= ~5 x #mentions nodes.
  E. triples   projection only (assignments are already unique per
               mention — no dedup shuffle).

Exactly two data-sized shuffles: B's join fan-out and D's conv_id fan-in.
Word-level dictionaries (word_ids, expansions, stopwords, mention keys)
are Spark broadcasts — the analogue of the reference's whole-table
preloads (DataAccessCache.java:46-110).

Long conversations are chunked into bounded windows of turns (P9,
FixedLengthDocumentChunker) and reconciled by surface form afterwards
(O3, ResultsReconciler) so a single mega-conversation cannot skew a task.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .core.disambiguate import DisambiguationConfig, disambiguate_document
from .core.kb import KBData, OOKBE
from .core.text import SpottedMention, conflate, parse_markup, spot_mentions, tokenize
from .kb_spark import build_entity_bundles, load_kb_tables

__all__ = ["PipelineConfig", "AidaPipeline", "run_pipeline"]


@dataclass
class PipelineConfig:
    disambiguation: DisambiguationConfig = field(default_factory=DisambiguationConfig)
    collection_size: int = 2_651_987
    # K1 keyphrase pruning — the pipeline DEFAULT is the reference's
    # *Fast* preset (README.md:147,361-362: weight floor 0.002, top-1000
    # per entity, ~5x speedup, "little loss in accuracy"), NOT the
    # reference's default CocktailParty preset (which does no pruning).
    # This is a deliberate divergence for the 100-TB design point:
    # without a cap, hot entities (1000s of keyphrases) x hot mentions
    # explode the stage-C payload shuffle. Consequence: on a KB with
    # sub-floor keyphrases the default pipeline output can differ from
    # the unpruned core path — pinned by
    # test_fast_pruning_default_diverges_and_full_matches_core, and set
    # both to 0.0/None for exact reference-default ("Full") parity.
    min_keyphrase_weight: float = 0.002
    max_keyphrases_per_entity: int | None = 1000
    # P9 chunking: split conversations longer than this many turns into
    # bounded windows, reconciled by surface form afterwards (O3); 0 = off.
    # DEFAULT ON since r4 — the reference always runs a chunker
    # (Preparator.java:106-123; its FixedLengthDocumentChunker unit is 10
    # *sentences*, AidaConfig.java:154), and an unbounded conversation is
    # the last unbounded input of the solve stage: solver cost/memory are
    # superlinear in mentions (measured, tools/bench_chunking.py: a
    # SINGLE 5k-turn conversation unchunked = 112 s / 3.6 GB worker peak
    # vs 15 s / 180 MB at 512). 256 measured against 128/512/1024 on a
    # 100k-turn mega-conversation: bit-identical triples at every
    # setting, flat ~360 MB worker peak for 128-512, and per-conversation
    # straggler wall 118 s vs 220 s (512) / 410 s (1024); 128 is ~2x
    # faster still but halves the coherence-graph context for no further
    # memory win. Conversations at or under the bound are untouched.
    max_turns_per_chunk: int = 256
    # force a shuffle join for the dictionary (for very large dictionaries);
    # by default Spark broadcasts when under autoBroadcastJoinThreshold
    broadcast_dictionary: bool = True
    # salt hot mention keys over this many buckets before the candidate
    # join; 0 = rely on AQE skew handling
    mention_key_salt: int = 0
    emit_ookbe: bool = False
    # C5 fuzzy fallback: mentions with no exact dictionary hit are matched
    # against dictionary names by trigram Jaccard >= this; 0 disables
    fuzzy_min_sim: float = 0.0
    # "trigram" = exact inverted-index join (C5); "lsh" = MinHash-LSH
    # prefilter + trigram verify (C6, for very large dictionaries)
    fuzzy_method: str = "trigram"
    # Ship spotted SPANS from stage A through the cogroup instead of
    # re-spotting in stage D (VERDICT r3 #7 experiment). The solver must
    # re-tokenize either way (it needs token ids for context scoring), so
    # this trades the stage-D dictionary max-match CPU against shipping
    # ~6 ints + surface per mention occurrence through the fan-in
    # shuffle plus one stage-A materialization (localCheckpoint — two
    # consumers read the spot output). Measured at bench scale (480k
    # turns, local[32], tools/bench_span_shipping.py, three paired
    # best-of-3 runs incl. one order-reversed): re-spot 16.1/12.6/12.6 s
    # vs ship_spans 13.0/13.3/13.0 s — medians 12.6 vs 13.0 s, i.e.
    # WITHIN host noise (±20% on this box), with re-spot consistently
    # ahead once the noisy first leg is excluded. Re-spotting stays the
    # default (no extra materialization, output bit-identical — pinned
    # by test_ship_spans_bit_identical_to_respotting). Kept as a config
    # path: a deployment whose dictionary probes dominate (huge
    # max_len, dense entity text) can flip it and re-measure.
    ship_spans: bool = False
    # solve-stage group granularity: conversations hash into this many
    # buckets; one applyInPandas group per bucket amortizes the per-group
    # Arrow/pandas overhead over ~corpus/solve_buckets conversations.
    # None = 8x the cluster's default parallelism (measured sweet spot:
    # 64 buckets at 16 cores loses ~20% to tail stragglers, 512 loses
    # ~6% to per-group overhead, 128 = 8x wins). Set explicitly at large
    # scale so a bucket's turn rows stay within worker memory
    # (~corpus_rows / solve_buckets <= ~1M rows per Arrow group).
    solve_buckets: int | None = None
    # where KB artifacts (mention keys, word ids, ...) are published for
    # executor-side loading; None = a driver-local temp dir (works in
    # local mode and with a shared driver fs). On a real cluster point
    # this at shared storage (hdfs://, s3a://).
    kb_artifact_dir: str | None = None


class _MemoSet:
    """Per-task membership memo over an expensive probe structure (the
    blake2b-hashing ``kb_artifacts.SortedHashSet``): natural text repeats
    tokens constantly, so most probes become one dict hit instead of a
    fresh hash64+searchsorted (measured ~45% of stage-A spot CPU at bench
    scale). Bounded: the memo resets if a task somehow sees more distinct
    probes than _CAP (a per-task vocabulary that size would dwarf the
    memo's own footprint anyway)."""

    __slots__ = ("_base", "_memo")
    _CAP = 1 << 21

    def __init__(self, base):
        self._base = base
        self._memo: dict = {}

    def __contains__(self, key) -> bool:
        memo = self._memo
        v = memo.get(key)
        if v is None:
            if len(memo) >= self._CAP:
                memo.clear()
            v = memo[key] = key in self._base
        return v


_MEMO_MISS = object()


class _MemoMap:
    """Per-bucket get() memo over ``kb_artifacts.CompactHashMap`` (same
    rationale as :class:`_MemoSet` — one blake2b per DISTINCT token)."""

    __slots__ = ("_base", "_memo")
    _CAP = 1 << 21

    def __init__(self, base):
        self._base = base
        self._memo: dict = {}

    def get(self, key, default=None):
        memo = self._memo
        v = memo.get(key, _MEMO_MISS)
        if v is _MEMO_MISS:
            if len(memo) >= self._CAP:
                memo.clear()
            v = memo[key] = self._base.get(key)
        return default if v is None else v


MENTION_KEY_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("mention_key", StringType()),
    ]
)

ASSIGNMENT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("mention", StringType()),
        StructField("char_offset", IntegerType()),
        StructField("char_length", IntegerType()),
        StructField("entity", StringType()),
        StructField("score", DoubleType()),
    ]
)


def _build_conversation_doc(
    turns: pd.DataFrame, mention_keys: set[str], include_unknown_caps: bool = False
):
    """DataFrame wrapper around :func:`_build_conversation_doc_arrays`
    (tests and the core-parity harness pass pandas frames)."""
    order = turns["turn_idx"].to_numpy().argsort(kind="stable")
    return _build_conversation_doc_arrays(
        turns["turn_idx"].to_numpy()[order],
        turns["text"].to_numpy()[order],
        mention_keys,
        include_unknown_caps,
    )


def _build_conversation_doc_arrays(
    turn_ids, texts, mention_keys: set[str], include_unknown_caps: bool = False
):
    """Deterministically rebuild the conversation-level document: tokens of
    all turns concatenated in (turn_idx) order with global token indices;
    per-turn manual markup and dictionary spotting; mentions carry the turn
    and turn-local char offset for triple subjects. Takes plain arrays
    ALREADY sorted by turn_idx — the solve stage calls this per
    conversation, and building a pandas frame per conversation costs more
    than the solver itself on short conversations."""
    from .core.text import first_words_upper

    fw = first_words_upper(mention_keys)
    all_token_texts: list[str] = []
    mentions: list[SpottedMention] = []
    mention_turn: list[int] = []
    offset = 0
    for turn_idx, text in zip(turn_ids, texts):
        clean, manual = parse_markup(text or "")
        toks = tokenize(clean)
        turn_mentions = spot_mentions(
            toks,
            manual,
            mention_keys,
            include_unknown_caps=include_unknown_caps,
            first_words=fw,
        )
        for m in turn_mentions:
            m.start_token += offset
            m.end_token += offset
            mentions.append(m)
            mention_turn.append(int(turn_idx))
        all_token_texts.extend(t.text for t in toks)
        offset += len(toks)
    return all_token_texts, mentions, mention_turn


def _build_conversation_doc_from_span_rows(turn_ids, texts, span_map):
    """ship_spans doc build: tokenize for token texts (the solver's
    context features need token ids regardless), but take the mentions
    from stage A's shipped spans instead of re-running the dictionary
    max-match. ``span_map``: turn_idx -> [(seq, surface, tok_start,
    tok_end, char_offset, char_length)] sorted by seq, reproducing
    spot_mentions' exact output order (candidate iteration order breaks
    solver ties)."""
    all_token_texts: list[str] = []
    mentions: list[SpottedMention] = []
    mention_turn: list[int] = []
    offset = 0
    for turn_idx, text in zip(turn_ids, texts):
        clean, _manual = parse_markup(text or "")
        toks = tokenize(clean)
        for (_seq, surface, ts, te, co, cl) in span_map.get(int(turn_idx), ()):
            mentions.append(
                SpottedMention(
                    surface=surface,
                    start_token=int(ts) + offset,
                    end_token=int(te) + offset,
                    char_offset=int(co),
                    char_length=int(cl),
                )
            )
            mention_turn.append(int(turn_idx))
        all_token_texts.extend(t.text for t in toks)
        offset += len(toks)
    return all_token_texts, mentions, mention_turn


# stage-B candidate rows (per conversation x mention x entity — small)
_CAND_COLS = ("mention_key", "entity", "prior", "rank")
# ship_spans 'm' rows reuse the tagged union's existing nullable columns
# (no schema widening for the common path); this mapping is the single
# source of truth for packing (solve()) and unpacking (solve_bucket):
_SPAN_PACKING = {
    "turn_idx": "kp_count",
    "seq": "kp_df",
    "surface": "inlinks_csv",
    "tok_start": "kp",
    "tok_end": "position",
    "char_offset": "token",
    "char_length": "expanded",
}
# per-BUCKET entity payload rows (deduped: a hot entity spotted in a
# million conversations ships its keyphrase bundle once per bucket, not
# once per conversation — the r3 fix for payload-shuffle amplification)
_ENT_COLS = (
    "entity", "kp", "position", "token", "expanded", "mi", "idf",
    "kp_count", "kp_df", "kw_df", "e_count", "inlinks_csv", "types_csv",
)


class _EntityTables:
    """Bucket-level entity structures parsed ONCE per solve bucket and
    shared (read-only) by every conversation's KBData in that bucket.

    Scope note: these tables were previously sliced per conversation;
    they are now sliced per bucket. Every default-path measure reads
    them keyed by entity/keyphrase/token, so outputs are identical. The
    opt-in global-aggregate measures (K7 weight averaging, the unit-LM
    background models) now aggregate over the bucket slice instead of
    the conversation slice — strictly closer to the reference, which
    aggregates over the full entity universe."""

    __slots__ = (
        "entity_kps", "kp_tokens", "kw_mi", "kw_idf", "kw_counts",
        "kp_counts", "entity_counts", "entity_kp_count",
        "entity_kw_count", "inlinks", "entity_types", "local_exp",
        "ectx_cache",
    )

    def __init__(self, ent_cols: tuple):
        # per-bucket scoring-context cache (KBData.ectx_cache): every
        # conversation's KBData in this bucket shares it, so a hot
        # entity's keyphrase structures are parsed once per bucket
        self.ectx_cache: dict = {}
        entity_kps: dict[str, dict[int, None]] = {}
        kp_token_pos: dict[int, dict[int, int]] = {}
        self.kw_mi: dict[tuple[str, int], float] = {}
        self.kw_idf: dict[int, float] = {}
        self.local_exp: dict[int, int] = {}
        self.inlinks: dict[str, tuple[int, ...]] = {}
        self.entity_types: dict[str, tuple[str, ...]] = {}
        self.kw_counts: dict[int, int] = {}
        self.kp_counts: dict[int, int] = {}
        self.entity_counts: dict[str, int] = {}
        self.entity_kp_count: dict[tuple[str, int], int] = {}
        for (entity, kp_v, position, token, expanded, mi_v, idf_v,
             kp_count, kp_df, kw_df, e_count,
             inlinks_csv, types_csv) in zip(*ent_cols):
            if inlinks_csv:
                self.inlinks[entity] = tuple(
                    int(x) for x in inlinks_csv.split(",")
                )
            if types_csv:
                self.entity_types[entity] = tuple(types_csv.split(","))
            if kp_v is not None and not pd.isna(kp_v):
                kp = int(kp_v)
                entity_kps.setdefault(entity, {})[kp] = None
                kp_token_pos.setdefault(kp, {})[int(position)] = int(token)
                self.kw_mi[(entity, int(token))] = float(mi_v)
                self.kw_idf[int(token)] = float(idf_v)
                if expanded:
                    self.local_exp[int(token)] = int(expanded)
                # raw unit counts for count-based measures (M4 unit LMs)
                if kp_count is not None and not pd.isna(kp_count):
                    self.entity_kp_count[(entity, kp)] = int(kp_count)
                if kp_df is not None and not pd.isna(kp_df):
                    self.kp_counts[kp] = int(kp_df)
                if kw_df is not None and not pd.isna(kw_df):
                    self.kw_counts[int(token)] = int(kw_df)
                if e_count is not None and not pd.isna(e_count):
                    self.entity_counts[entity] = int(e_count)
        # keyphrase order = ascending kp id (== the reference fixture's
        # insertion order, since word ids are assigned in insertion order)
        self.entity_kps = {e: sorted(kps.keys()) for e, kps in entity_kps.items()}
        self.kp_tokens = {
            kp: [tok for _pos, tok in sorted(pos_map.items())]
            for kp, pos_map in kp_token_pos.items()
        }
        # entity-keyword co-occurrence = sum of co-counts over the
        # entity's keyphrases containing the token
        # (DataAccessForTesting:486-509) — derived once per bucket
        self.entity_kw_count: dict[tuple[str, int], int] = {}
        for (entity, kp), c in self.entity_kp_count.items():
            for tok in self.kp_tokens.get(kp, ()):
                k2 = (entity, tok)
                self.entity_kw_count[k2] = self.entity_kw_count.get(k2, 0) + c


def _conv_kb(
    cand_cols: tuple,
    ent: _EntityTables,
    word2id: dict,
    expansions: dict,
    stopword_ids: set,
    collection_size: int,
) -> KBData:
    """Per-conversation KBData: the dictionary (mention -> candidates)
    and entity ranks come from this conversation's candidate rows; all
    entity-level structures are shared references into the bucket-level
    ``_EntityTables`` (no copying)."""
    dictionary: dict[str, list[tuple[str, float]]] = {}
    seen_pairs: set[tuple[str, str]] = set()
    entity_rank: dict[str, float] = {}
    for key, entity, prior, rank in zip(*cand_cols):
        dictionary.setdefault(key, [])
        if entity is None or isinstance(entity, float):
            continue
        if (key, entity) not in seen_pairs:
            seen_pairs.add((key, entity))
            dictionary[key].append((entity, float(prior)))
        entity_rank[entity] = float(rank) if rank is not None else 0.0
    # canonical candidate order (must match KBData.candidates sorting)
    for key in dictionary:
        dictionary[key].sort(key=lambda ep: ep[0])
    # overlay, NOT a copy: the global expansion dict is node-shared mmap;
    # the bucket's payload rows only add the entities' expansion entries
    from collections import ChainMap

    return KBData(
        collection_size=collection_size,
        word2id=word2id,
        expansions=ChainMap(ent.local_exp, expansions),
        stopword_ids=stopword_ids,
        entity2id={},
        dictionary=dictionary,
        entity_rank=entity_rank,
        entity_kps=ent.entity_kps,
        kp_tokens=ent.kp_tokens,
        kw_counts=ent.kw_counts,
        kp_counts=ent.kp_counts,
        entity_counts=ent.entity_counts,
        entity_kp_count=ent.entity_kp_count,
        entity_kw_count=ent.entity_kw_count,
        inlinks=ent.inlinks,
        kw_mi_weights=ent.kw_mi,
        kw_idf_weights=ent.kw_idf,
        entity_types=ent.entity_types,
        ectx_cache=ent.ectx_cache,
    )


class AidaPipeline:
    def __init__(
        self,
        spark: SparkSession,
        kb_tables: dict,
        config: PipelineConfig | None = None,
    ):
        self.spark = spark
        self.cfg = config or PipelineConfig()
        self.kb = load_kb_tables(spark, kb_tables)
        self._bundles = build_entity_bundles(
            self.kb,
            self.cfg.collection_size,
            min_keyphrase_weight=self.cfg.min_keyphrase_weight,
            max_keyphrases_per_entity=self.cfg.max_keyphrases_per_entity,
        ).persist()
        # Word-level lookup structures (the analogue of the reference's
        # DataAccessCache preloads) as EXECUTOR-SIDE artifacts: written by
        # Spark, distributed via addFile, lazy-loaded per worker. The
        # driver never collects a KB table — at YAGO scale (~3M entities,
        # >10M surface forms) a collect+broadcast would push multi-GB of
        # Python objects through the driver heap.
        from .kb_artifacts import (
            publish_hash_map,
            publish_hash_set,
            publish_table,
        )

        art_dir = self.cfg.kb_artifact_dir
        mention_keys_df = (
            self.kb["known_names"]
            .select("mention")
            .unionByName(self.kb["dictionary"].select("mention"))
            .distinct()
        )
        # string-keyed artifacts ship as int64 hash arrays (workers never
        # materialize the strings; node-local mmap share — kb_artifacts.py)
        self._a_mention_keys = publish_hash_set(spark, mention_keys_df, "mention",
                                                dir_hint=art_dir)
        self._a_first_words = publish_hash_set(
            spark, mention_keys_df, "mention", first_word=True, dir_hint=art_dir
        )
        self._a_word_ids = publish_hash_map(
            spark, self.kb["word_ids"], "word", "id", dir_hint=art_dir
        )
        self._a_expansions = publish_table(
            spark,
            self.kb["word_expansion"].select(
                F.col("word").cast("long").alias("word"),
                F.col("expansion").cast("long").alias("expansion"),
            ),
            art_dir,
            n_parts=8,
        )
        # unknown stopwords map to word id 0 (the shared unknown-word id)
        stop_ids_df = (
            self.kb["stopwords"]
            .join(self.kb["word_ids"], "word", "left")
            .select(F.coalesce(F.col("id"), F.lit(0)).alias("id"))
            .distinct()
        )
        self._a_stopword_ids = publish_table(spark, stop_ids_df, art_dir)

    def close(self) -> None:
        """Release the session resources this pipeline pinned (the
        persisted entity-bundle table). Long-lived sessions constructing
        many pipelines should call this.

        Temp artifact dirs are NOT removed here: Spark re-fetches and
        content-validates addFile sources on demand for as long as the
        SparkContext lives (deleting a source makes any later fetch fail
        with 'exists and does not match contents'); they are removed at
        interpreter exit by kb_artifacts' atexit hook, when the JVM dies
        with the process."""
        self._bundles.unpersist()

    # ---- stage A: mention spotting (narrow) --------------------------
    def spot_mention_keys(self, transcripts: DataFrame) -> DataFrame:
        a_keys = self._a_mention_keys
        a_fw = self._a_first_words
        unknown_caps = self.cfg.fuzzy_min_sim > 0.0

        def spot(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .kb_artifacts import load_hash_set

            keys = _MemoSet(load_hash_set(a_keys))
            fw = _MemoSet(load_hash_set(a_fw))
            for pdf in batches:
                seen: set[tuple[str, str]] = set()
                for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                    clean, manual = parse_markup(text or "")
                    toks = tokenize(clean)
                    for m in spot_mentions(
                        toks,
                        manual,
                        keys,
                        include_unknown_caps=unknown_caps,
                        first_words=fw,
                    ):
                        seen.add((conv_id, conflate(m.surface)))
                yield pd.DataFrame(
                    sorted(seen), columns=["conv_id", "mention_key"]
                )

        # NOTE: dedup is per-batch only — a global distinct would cost a
        # full shuffle stage; residual cross-batch duplicates are cheap
        # (bounded payload fan-out) and collapsed inside the solver UDF.
        return transcripts.select("conv_id", "text").mapInPandas(
            spot, MENTION_KEY_SCHEMA
        )

    # ---- stage A variant: spot once, ship spans (ship_spans=True) -----
    SPAN_SCHEMA = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("seq", IntegerType()),  # spot order within turn
            StructField("mention_key", StringType()),
            StructField("surface", StringType()),
            StructField("tok_start", IntegerType()),
            StructField("tok_end", IntegerType()),
            StructField("char_offset", IntegerType()),
            StructField("char_length", IntegerType()),
        ]
    )

    def spot_spans(self, transcripts: DataFrame) -> DataFrame:
        """Per-OCCURRENCE spotted spans (turn-local token/char indices,
        plus the within-turn spot sequence so the solver reproduces the
        exact mention order — candidate iteration order breaks solver
        ties). One narrow pass; the caller materializes it once
        (localCheckpoint) because both the key derivation and the
        cogroup consume it."""
        a_keys = self._a_mention_keys
        a_fw = self._a_first_words
        unknown_caps = self.cfg.fuzzy_min_sim > 0.0
        schema = self.SPAN_SCHEMA

        def spot(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .kb_artifacts import load_hash_set

            keys = _MemoSet(load_hash_set(a_keys))
            fw = _MemoSet(load_hash_set(a_fw))
            for pdf in batches:
                rows = []
                for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"]
                ):
                    clean, manual = parse_markup(text or "")
                    toks = tokenize(clean)
                    for seq, m in enumerate(
                        spot_mentions(
                            toks,
                            manual,
                            keys,
                            include_unknown_caps=unknown_caps,
                            first_words=fw,
                        )
                    ):
                        rows.append(
                            (
                                conv_id,
                                int(turn_idx),
                                seq,
                                conflate(m.surface),
                                m.surface,
                                m.start_token,
                                m.end_token,
                                m.char_offset,
                                m.char_length,
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in schema.fields]
                )

        return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
            spot, schema
        )

    # ---- stage B: candidate join --------------------------------------
    def candidates(self, mention_keys: DataFrame) -> DataFrame:
        """(conv_id, mention_key, entity, prior, rank) candidate rows —
        the entity keyphrase bundles do NOT ride these rows; they join
        in per solve BUCKET (deduped) inside :meth:`solve`, so a hot
        entity spotted in millions of conversations ships its payload
        once per bucket instead of once per conversation."""
        cfg = self.cfg
        dictionary = self.kb["dictionary"]
        rank = self.kb["entity_rank"]
        dict_with_rank = dictionary.join(F.broadcast(rank), "entity", "left").select(
            F.col("mention").alias("mention_key"),
            "entity",
            "prior",
            F.coalesce(F.col("rank"), F.lit(0.0)).alias("rank"),
        )
        # C2: the rank filter is pushed into the join
        dict_with_rank = dict_with_rank.filter(
            F.col("rank") <= F.lit(cfg.disambiguation.max_entity_rank)
        )
        if cfg.broadcast_dictionary:
            dict_with_rank = F.broadcast(dict_with_rank)
            candidates = mention_keys.join(dict_with_rank, "mention_key", "left")
        elif cfg.mention_key_salt > 1:
            # Explicit hot-key salting for the shuffle join: the probe side
            # spreads each (conv, key) row over N salt buckets, the
            # dictionary side is replicated N times. This fans out a hot
            # mention_key (e.g. "PAGE" spotted in millions of
            # conversations) across N reducers. It does NOT help a single
            # conversation with a huge payload — that residual skew is
            # handled downstream by the solve-bucket hashing — and
            # complements AQE skew-join splitting when one key exceeds what
            # AQE will split.
            n_salt = cfg.mention_key_salt
            salted_keys = mention_keys.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(F.col("conv_id"), F.col("mention_key")),
                    F.lit(n_salt),
                ).cast("int"),
            )
            salted_dict = dict_with_rank.withColumn(
                "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
            )
            candidates = salted_keys.join(
                salted_dict, ["mention_key", "_salt"], "left"
            ).drop("_salt")
        else:
            candidates = mention_keys.join(dict_with_rank, "mention_key", "left")
        if cfg.fuzzy_min_sim > 0.0:
            # C5: trigram-Jaccard fallback for keys with no exact hit;
            # matched names contribute their candidates to the original key
            from .operators.fuzzy import (
                build_name_trigram_index,
                fuzzy_match,
                fuzzy_match_lsh,
            )

            unmatched = candidates.filter(F.col("entity").isNull()).select(
                "conv_id", "mention_key"
            )
            if cfg.fuzzy_method == "lsh":
                fz = fuzzy_match_lsh(
                    unmatched,
                    self.kb["dictionary"].select(F.col("mention")),
                    cfg.fuzzy_min_sim,
                )
            else:
                idx = build_name_trigram_index(
                    self.kb["dictionary"].select(F.col("mention"))
                )
                fz = fuzzy_match(unmatched, idx, cfg.fuzzy_min_sim)
            fz_cand = (
                unmatched.join(fz, "mention_key")
                .join(
                    dict_with_rank.withColumnRenamed("mention_key", "name"),
                    "name",
                )
                # multiple fuzzy-matched names can share an entity: take the
                # max prior over matched names (core fill_candidates
                # semantics, disambiguate.py:126) — first-wins would be
                # shuffle-order dependent
                .groupBy("conv_id", "mention_key", "entity")
                .agg(F.max("prior").alias("prior"), F.max("rank").alias("rank"))
                .select("conv_id", "mention_key", "entity", "prior", "rank")
            )
            candidates = candidates.filter(
                F.col("entity").isNotNull()
            ).unionByName(fz_cand).unionByName(
                # keep a no-candidate marker row for keys that stay unmatched
                unmatched.join(fz_cand, ["conv_id", "mention_key"], "left_anti")
                .select(
                    "conv_id",
                    "mention_key",
                    F.lit(None).cast("string").alias("entity"),
                    F.lit(None).cast("double").alias("prior"),
                    F.lit(None).cast("double").alias("rank"),
                )
            )
        return candidates.select(
            "conv_id", "mention_key", "entity", "prior", "rank"
        )

    # ---- stage D: per-conversation solve ------------------------------
    def solve(
        self,
        transcripts: DataFrame,
        candidates: DataFrame,
        spans: DataFrame | None = None,
    ) -> DataFrame:
        cfg = self.cfg
        a_word_ids = self._a_word_ids
        a_expansions = self._a_expansions
        a_stopword_ids = self._a_stopword_ids
        dis_cfg = cfg.disambiguation
        collection_size = cfg.collection_size
        max_turns = cfg.max_turns_per_chunk
        emit_ookbe = cfg.emit_ookbe
        unknown_caps = cfg.fuzzy_min_sim > 0.0

        def solve_bucket(
            turns_b: pd.DataFrame, pay_b: pd.DataFrame
        ) -> pd.DataFrame:
            """One Arrow group = one *bucket* of conversations: iterating
            conversations inside the UDF amortizes the per-group Arrow /
            pandas overhead (~5ms/group) over many conversations.

            ``pay_b`` carries TWO row kinds (split by ``_kind``): 'c' =
            per-conversation candidate rows, 'e' = the bucket's DEDUPED
            entity payload, parsed once into shared ``_EntityTables``.

            Conversations are grouped by factorize + stable argsort and
            handed to the solver as numpy slice views — pandas groupby
            materializes a sub-DataFrame per conversation, which costs
            more than the solve itself on short conversations (measured:
            ~3x per-core throughput on the 8-turn bench corpus)."""
            import numpy as np

            from .kb_artifacts import load_hash_map

            rows: list[tuple] = []
            if turns_b.empty:
                return pd.DataFrame(
                    {f.name: [] for f in ASSIGNMENT_SCHEMA.fields}
                )
            # one blake2b per DISTINCT token per bucket (not per token
            # occurrence): the memo wraps the process-cached hash map
            word2id = _MemoMap(load_hash_map(a_word_ids))
            t_codes, t_uniq = pd.factorize(turns_b["conv_id"], sort=False)
            t_order = np.argsort(t_codes, kind="stable")
            ti = turns_b["turn_idx"].to_numpy()[t_order]
            tx = turns_b["text"].to_numpy()[t_order]
            tc = t_codes[t_order]
            t_bounds = np.flatnonzero(np.r_[True, tc[1:] != tc[:-1], True])

            kinds = pay_b["_kind"].to_numpy() if not pay_b.empty \
                else np.empty(0, dtype=object)
            ent_b = pay_b[kinds == "e"] if (kinds == "e").any() else None
            span_b = pay_b[kinds == "m"] if (kinds == "m").any() else None
            cand_b = pay_b[kinds == "c"] if not pay_b.empty else pay_b
            ent_tables = _EntityTables(
                tuple(ent_b[c].to_numpy() for c in _ENT_COLS)
                if ent_b is not None
                else tuple(np.empty(0, dtype=object) for _ in _ENT_COLS)
            )

            def conv_ranges(frame, cols):
                codes, uniq = pd.factorize(frame["conv_id"], sort=False)
                order = np.argsort(codes, kind="stable")
                arrs = tuple(frame[c].to_numpy()[order] for c in cols)
                oc = codes[order]
                bounds = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1], True])
                return arrs, {
                    uniq[i]: (bounds[i], bounds[i + 1])
                    for i in range(len(uniq))
                }

            pay_ranges: dict = {}
            cand_cols = None
            if not cand_b.empty:
                cand_cols, pay_ranges = conv_ranges(cand_b, _CAND_COLS)
            span_ranges: dict = {}
            span_cols = None
            if span_b is not None:
                span_cols, span_ranges = conv_ranges(
                    span_b, tuple(_SPAN_PACKING.values())
                )
            empty_cols = tuple(
                np.empty(0, dtype=object) for _ in _CAND_COLS
            )
            for gi in range(len(t_uniq)):
                lo, hi = t_bounds[gi], t_bounds[gi + 1]
                conv_id = t_uniq[gi]
                plo, phi = pay_ranges.get(conv_id, (0, 0))
                conv_cand = (
                    tuple(col[plo:phi] for col in cand_cols)
                    if cand_cols is not None and phi > plo
                    else empty_cols
                )
                conv_spans = None
                if span_cols is not None:
                    slo, shi = span_ranges.get(conv_id, (0, 0))
                    conv_spans = tuple(c[slo:shi] for c in span_cols)
                solve_conv(conv_id, ti[lo:hi], tx[lo:hi], conv_cand,
                           ent_tables, rows, word2id, conv_spans)
            return pd.DataFrame(
                rows, columns=[f.name for f in ASSIGNMENT_SCHEMA.fields]
            )

        spans_mode = spans is not None

        def solve_conv(
            conv_id, turn_ids, texts, cand_cols: tuple,
            ent_tables: "_EntityTables", rows: list,
            word2id, conv_spans: tuple | None = None,
        ) -> None:
            from .kb_artifacts import (
                load_int_int_map,
                load_int_set,
            )

            kb = _conv_kb(
                cand_cols,
                ent_tables,
                word2id,
                load_int_int_map(a_expansions, "word", "expansion"),
                load_int_set(a_stopword_ids, "id"),
                collection_size,
            )
            mention_keys = set(kb.dictionary.keys())
            # chunking (P9): bounded turn windows, reconciled below (O3)
            order = turn_ids.argsort(kind="stable")
            turn_ids = turn_ids[order]
            texts = texts[order]
            n = len(turn_ids)
            if max_turns and n > max_turns:
                chunks = [
                    (turn_ids[i : i + max_turns], texts[i : i + max_turns])
                    for i in range(0, n, max_turns)
                ]
            else:
                chunks = [(turn_ids, texts)]
            span_map: dict | None = None
            if spans_mode:
                span_map = {}
                if conv_spans is not None and len(conv_spans[0]):
                    turn_a, seq_a, surf_a, ts_a, te_a, co_a, cl_a = conv_spans
                    for k in range(len(turn_a)):
                        span_map.setdefault(int(turn_a[k]), []).append(
                            (int(seq_a[k]), surf_a[k], ts_a[k], te_a[k],
                             co_a[k], cl_a[k])
                        )
                    for v in span_map.values():
                        v.sort()
            chunk_outputs = []
            for chunk_ti, chunk_tx in chunks:
                if span_map is not None:
                    token_texts, mentions, mention_turn = (
                        _build_conversation_doc_from_span_rows(
                            chunk_ti, chunk_tx, span_map
                        )
                    )
                else:
                    token_texts, mentions, mention_turn = (
                        _build_conversation_doc_arrays(
                            chunk_ti,
                            chunk_tx,
                            mention_keys,
                            include_unknown_caps=unknown_caps,
                        )
                    )
                from .core.disambiguate import Document

                doc = Document(
                    doc_id=str(conv_id),
                    tokens=token_texts,
                    token_ids=[word2id.get(t, 0) for t in token_texts],
                    mentions=mentions,
                )
                results = disambiguate_document(doc, kb, dis_cfg)
                chunk_outputs.append((results, mention_turn))
            if len(chunk_outputs) > 1:
                # O3: re-rank identical surface forms across chunks by
                # their summed scores (ResultsReconciler.java:66-130)
                from .core.reconcile import reconcile_chunks

                reconciled = reconcile_chunks(
                    [res for res, _t in chunk_outputs]
                )
                turns_flat = [t for _res, ts in chunk_outputs for t in ts]
                chunk_outputs = [(reconciled, turns_flat)]
            for results, mention_turn in chunk_outputs:
                for r, turn in zip(results, mention_turn):
                    if r.entity == OOKBE and not emit_ookbe:
                        continue
                    rows.append(
                        (
                            conv_id,
                            turn,
                            r.mention.surface,
                            r.mention.char_offset,
                            r.mention.char_length,
                            r.entity,
                            float(r.score),
                        )
                    )

        n_buckets = cfg.solve_buckets or max(
            64, 8 * self.spark.sparkContext.defaultParallelism
        )
        bucket = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast(
            "int"
        )
        # only the solver's columns ride the fan-in shuffle — role/tool/ts
        # would ship through the cogroup (and Arrow) for nothing
        turns_slim = transcripts.select("conv_id", "turn_idx", "text")
        # Materialize the candidate rows ONCE: the solve plan consumes
        # them through two branches (the tagged 'c' rows AND the
        # per-bucket distinct-entity payload join), and without a
        # materialization each branch re-executes the whole upstream —
        # including the Python-heavy stage-A spot (measured: two ~105
        # CPU-s mapInPandas stages per run at bench scale, r6 event-log
        # profile). Eager localCheckpoint = one spot pass; blocks are
        # reclaimed by the ContextCleaner when the run's frames are
        # released (same contract as the ship_spans materialization).
        candidates = candidates.localCheckpoint(eager=True)
        cand_b = candidates.withColumn("_sbucket", bucket)
        # stage C, bucket grain: each bucket's DISTINCT candidate entities
        # join the keyphrase bundles once — a hot entity spotted in a
        # million conversations ships one bundle copy per bucket, not one
        # per conversation (measured 39x payload-row reduction on the
        # hot-key bench corpus; unbounded at 10^12-turn scale)
        ent_payload = (
            cand_b.filter(F.col("entity").isNotNull())
            .select("_sbucket", "entity")
            .distinct()
            .join(self._bundles, "entity")
        )
        _null = lambda t: F.lit(None).cast(t)  # noqa: E731
        tagged = cand_b.select(
            "_sbucket",
            F.lit("c").alias("_kind"),
            "conv_id",
            "mention_key",
            "entity",
            "prior",
            "rank",
            _null("long").alias("kp"),
            _null("long").alias("position"),
            _null("long").alias("token"),
            _null("long").alias("expanded"),
            _null("double").alias("mi"),
            _null("double").alias("idf"),
            _null("long").alias("kp_count"),
            _null("long").alias("kp_df"),
            _null("long").alias("kw_df"),
            _null("long").alias("e_count"),
            _null("string").alias("inlinks_csv"),
            _null("string").alias("types_csv"),
        ).unionByName(
            ent_payload.select(
                "_sbucket",
                F.lit("e").alias("_kind"),
                _null("string").alias("conv_id"),
                _null("string").alias("mention_key"),
                "entity",
                _null("double").alias("prior"),
                _null("double").alias("rank"),
                F.col("kp").cast("long").alias("kp"),
                F.col("position").cast("long").alias("position"),
                F.col("token").cast("long").alias("token"),
                F.col("expanded").cast("long").alias("expanded"),
                "mi",
                "idf",
                "kp_count",
                "kp_df",
                "kw_df",
                "e_count",
                "inlinks_csv",
                "types_csv",
            )
        )
        if spans is not None:
            # 'm' rows: spotted spans packed into the existing nullable
            # columns per _SPAN_PACKING (no schema widening)
            tagged = tagged.unionByName(
                spans.withColumn("_sbucket", bucket).select(
                    "_sbucket",
                    F.lit("m").alias("_kind"),
                    "conv_id",
                    "mention_key",
                    _null("string").alias("entity"),
                    _null("double").alias("prior"),
                    _null("double").alias("rank"),
                    F.col("tok_start").cast("long").alias("kp"),
                    F.col("tok_end").cast("long").alias("position"),
                    F.col("char_offset").cast("long").alias("token"),
                    F.col("char_length").cast("long").alias("expanded"),
                    _null("double").alias("mi"),
                    _null("double").alias("idf"),
                    F.col("turn_idx").cast("long").alias("kp_count"),
                    F.col("seq").cast("long").alias("kp_df"),
                    _null("long").alias("kw_df"),
                    _null("long").alias("e_count"),
                    F.col("surface").alias("inlinks_csv"),
                    _null("string").alias("types_csv"),
                )
            )
        # One shuffle partition per solve bucket, explicitly (guide §2.5):
        # the per-bucket SOLVE cost is Python CPU, for which shuffle-byte
        # size is a bad proxy — with the exchange left to
        # spark.sql.shuffle.partitions + AQE coalescing, 256 buckets
        # collapse into defaultParallelism fat tasks and the stage runs as
        # ONE wave whose wall time is the slowest task (measured at bench
        # scale: 32 tasks, mean 8.1 s, max 11.6 s = stage wall). An
        # explicit repartition by bucket (REPARTITION_BY_NUM — AQE never
        # coalesces a user-specified partition count) yields one task per
        # bucket, so the scheduler load-balances ~n_buckets/cores waves
        # and the tail is one bucket, not a 1/cores slice of the corpus.
        # Scale-adaptive by construction: n_buckets is the config's
        # intended parallel grain (8x defaultParallelism when unset).
        return (
            turns_slim.withColumn("_sbucket", bucket)
            .repartition(n_buckets, "_sbucket")
            .groupBy("_sbucket")
            .cogroup(tagged.repartition(n_buckets, "_sbucket").groupBy("_sbucket"))
            .applyInPandas(solve_bucket, ASSIGNMENT_SCHEMA)
        )

    # ---- PRIOR-only fast path (M10), fully Catalyst-native -------------
    def prior_only_assignments(self, transcripts: DataFrame) -> DataFrame:
        """The PRIOR technique as pure DataFrame ops — no Python solver:
        spot mentions (with spans), broadcast-join the dictionary, argmax
        prior per mention via a row_number window. This is the plan the
        optimizer fully owns (pushdown, broadcast, WindowGroupLimit) and
        the throughput ceiling for the pipeline skeleton."""
        a_keys = self._a_mention_keys
        a_fw = self._a_first_words
        unknown_caps = self.cfg.fuzzy_min_sim > 0.0

        spot_schema = StructType(
            [
                StructField("conv_id", StringType()),
                StructField("turn_idx", IntegerType()),
                StructField("mention", StringType()),
                StructField("mention_key", StringType()),
                StructField("char_offset", IntegerType()),
                StructField("char_length", IntegerType()),
            ]
        )

        def spot_full(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .kb_artifacts import load_hash_set

            keys = _MemoSet(load_hash_set(a_keys))
            fw = _MemoSet(load_hash_set(a_fw))
            for pdf in batches:
                rows = []
                for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"]
                ):
                    clean, manual = parse_markup(text or "")
                    toks = tokenize(clean)
                    for m in spot_mentions(
                        toks,
                        manual,
                        keys,
                        include_unknown_caps=unknown_caps,
                        first_words=fw,
                    ):
                        rows.append(
                            (
                                conv_id,
                                int(turn_idx),
                                m.surface,
                                conflate(m.surface),
                                m.char_offset,
                                m.char_length,
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in spot_schema.fields]
                )

        mentions = transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
            spot_full, spot_schema
        )
        dictionary = self.kb["dictionary"].select(
            F.col("mention").alias("mention_key"), "entity", "prior"
        )
        w = Window.partitionBy(
            "conv_id", "turn_idx", "char_offset"
        ).orderBy(F.desc("prior"), F.desc("entity"))
        return (
            mentions.join(F.broadcast(dictionary), "mention_key")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "conv_id",
                "turn_idx",
                "mention",
                "char_offset",
                "char_length",
                "entity",
                F.col("prior").alias("score"),
            )
        )

    # ---- stage E: triples ---------------------------------------------
    def triples(self, assignments: DataFrame) -> DataFrame:
        """(subj, pred, obj) materialization.

        No dedup shuffle: assignments are unique per (conv, turn,
        char_offset) BY CONSTRUCTION — spotting's covered-token set
        forbids overlapping mentions inside a turn, chunk windows (P9)
        partition turns disjointly, and O3 reconciliation re-labels
        mentions without duplicating them (verified: bit-identical triple
        sets at chunk sizes 0/128/256/512/1024 on a 100k-turn
        conversation, and pinned by
        test_chunked_assignments_have_unique_subjects). Input rows that
        duplicate a (conv_id, turn_idx) key yield duplicate mentions in
        the chunked and unchunked paths ALIKE — dedup dirty transcripts
        upstream, where it costs one hash-agg on the narrow input."""
        return assignments.select(
            F.concat_ws(
                "/",
                F.col("conv_id"),
                F.col("turn_idx").cast("string"),
                F.col("char_offset").cast("string"),
            ).alias("subj"),
            F.lit("linksTo").alias("pred"),
            F.col("entity").alias("obj"),
            F.col("mention"),
            F.col("score"),
        )

    def run(self, transcripts: DataFrame, checkpoint=None) -> DataFrame:
        """transcripts -> triples. Pass a ``lineage.BucketCheckpoint`` to
        materialize the solve stage with per-partition lineage + exact
        resume: unchanged conversation buckets are read back instead of
        re-solved."""
        def stage_ad(tr: DataFrame) -> DataFrame:
            if self.cfg.ship_spans:
                # spot ONCE; both consumers (key derivation + cogroup)
                # read the materialized spans (eager localCheckpoint:
                # lineage-truncated, blocks reclaimed by the
                # ContextCleaner when the run's frames are released)
                spans = self.spot_spans(tr).localCheckpoint(eager=True)
                keys = spans.select("conv_id", "mention_key").dropDuplicates()
                return self.solve(tr, self.candidates(keys), spans=spans)
            keys = self.spot_mention_keys(tr)
            return self.solve(tr, self.candidates(keys))

        if checkpoint is not None:
            def compute(bucketed: DataFrame) -> DataFrame:
                return stage_ad(bucketed.drop("_bucket"))

            assignments = checkpoint.materialize(
                "assignments", transcripts, compute
            )
        else:
            assignments = stage_ad(transcripts)
        return self.triples(assignments)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    kb_tables: dict,
    config: PipelineConfig | None = None,
) -> DataFrame:
    return AidaPipeline(spark, kb_tables, config).run(transcripts)
