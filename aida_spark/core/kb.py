"""Entity-repository bundle used by the per-document solver.

The Spark pipeline stores the entity repository as relational tables
(mirroring the reference schema, README.md:384-460 / DataAccessSQL.java:59-84):

    dictionary(mention, entity, prior)          -- mention conflated per P10
    entity_ids(entity, id)
    entity_rank(entity, rank)
    entity_keyphrases(entity, keyphrase, count) -- co-occurrence counts
    keyphrase_counts(keyphrase, count)          -- superdoc doc-frequencies
    keyphrase_tokens(keyphrase, token)          -- derived by space-split
    word_ids(word, id), word_expansion(word, expansion)
    keyword_counts(keyword, count)
    entity_counts(entity, count)                -- superdoc sizes
    entity_inlinks(entity, inlinks int[])

``KBData`` is the in-memory (per-task) view of the slice of those tables a
single conversation needs. At 100 TB scale the pipeline ships only the
relevant slice per conversation through joins (see
aida_spark/pipeline.py); for tests the whole 7-entity fixture fits.

Derived weights mirror DataAccessForTesting.getEntityKeyphrases
(DataAccessForTesting.java:301-334): keyphrase weights are NPMI, keyword
weights are unnormalized 4-cell MI, keyword IDF is log2(N // df).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .weights import compute_mi, compute_npmi, keyword_idf

OOKBE = "--OOKBE--"

__all__ = ["KBData", "OOKBE"]


@dataclass
class KBData:
    collection_size: int
    word2id: dict[str, int]
    expansions: dict[int, int]            # word id -> UPPERCASE-variant id
    stopword_ids: set[int]                # includes 0 (unknown words)
    entity2id: dict[str, int]
    # conflated mention -> list of (entity_name, prior); may be empty list
    # (a known name with no candidates, like "Les Paul" in the fixture)
    dictionary: dict[str, list[tuple[str, float]]]
    entity_rank: dict[str, float]
    entity_kps: dict[str, list[int]]      # entity name -> keyphrase word-ids
    kp_tokens: dict[int, list[int]]       # keyphrase id -> token word-ids
    kw_counts: dict[int, int]             # keyword doc frequency
    kp_counts: dict[int, int]             # keyphrase doc frequency
    entity_counts: dict[str, int]         # superdoc sizes
    entity_kp_count: dict[tuple[str, int], int]   # co-occurrence counts
    entity_kw_count: dict[tuple[str, int], int]
    inlinks: dict[str, tuple[int, ...]]   # entity -> sorted inlink entity-ids
    # optional precomputed weights (the Spark path precomputes these as
    # columns; when absent they are derived from the counts above)
    kw_mi_weights: dict[tuple[str, int], float] = field(default_factory=dict)
    kw_idf_weights: dict[int, float] = field(default_factory=dict)
    # C8 type filter support: entity -> type names
    entity_types: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # M4 unit-LM support (UnitType.java KEYWORD/BIGRAM; the reference's
    # ENTITY_BIGRAMS / BIGRAM_COUNTS tables): derived lazily from the
    # keyphrase tables by me_measures.derive_unit_counts when empty.
    entity_bigram_count: dict[tuple[str, tuple[int, int]], int] = field(
        default_factory=dict
    )
    bigram_counts: dict[tuple[int, int], int] = field(default_factory=dict)
    # M7 count-based importance (CountBasedImportance.java:28-40): an
    # external per-entity count table (e.g. GND-style authority counts),
    # min-max rescaled by scoring.entity_importance; empty = source off
    gnd_counts: dict[str, int] = field(default_factory=dict)
    # per-entity static scoring-context cache (scoring._EntityScoreContext):
    # keyed by entity name, derived ONLY from the entity-level tables
    # above, so it may be SHARED by every KBData built over the same
    # entity tables (the Spark solve path passes one dict per bucket —
    # a hot entity's keyphrase structures parse once per bucket, not
    # once per conversation). Pure caching; scores are unchanged.
    ectx_cache: dict = field(default_factory=dict)

    # ---- id helpers -------------------------------------------------
    def word_id(self, word: str) -> int:
        return self.word2id.get(word, 0)

    def expand(self, word_id: int) -> int:
        return self.expansions.get(word_id, 0)

    def is_stopword(self, word_id: int) -> bool:
        return word_id in self.stopword_ids

    # ---- candidate lookup (C1/C2/C11) -------------------------------
    def candidates(self, conflated_mention: str, max_entity_rank: float = 1.0):
        """(entity, prior) candidates with rank <= max_entity_rank
        (DataAccessSQL.java:113-122 pushes the rank filter into the join)."""
        entries = self.dictionary.get(conflated_mention)
        if entries is None:
            return None
        # canonical name order: candidate iteration order breaks ties in the
        # exhaustive search, so it must be deterministic across engines
        return sorted(
            (
                (e, p)
                for (e, p) in entries
                if self.entity_rank.get(e, 0.0) <= max_entity_rank
            ),
            key=lambda ep: ep[0],
        )

    def candidates_by_prefix(self, prefix: str, max_entity_rank: float = 1.0):
        """C10 prefix lookup (interactive mode): union of candidates of all
        dictionary names starting with the conflated prefix
        (EntityLookupManager.java:87-89, DbLookup.java)."""
        out: dict[str, float] = {}
        for name in self.dictionary:
            if name.startswith(prefix):
                for e, p in self.candidates(name, max_entity_rank) or []:
                    out[e] = max(out.get(e, 0.0), p)
        return sorted(out.items())

    def priors(self, conflated_mention: str) -> dict[str, float]:
        entries = self.dictionary.get(conflated_mention) or []
        return {e: p for (e, p) in entries}

    # ---- derived weights (K3/K4/K5) ----------------------------------
    def kw_mi(self, entity: str, keyword: int) -> float:
        key = (entity, keyword)
        if key in self.kw_mi_weights:
            return self.kw_mi_weights[key]
        if key not in self.entity_kw_count:
            return 0.0
        w = compute_mi(
            self.entity_counts[entity],
            self.kw_counts.get(keyword, 0),
            self.entity_kw_count[key],
            self.collection_size,
            normalize=False,
        )
        self.kw_mi_weights[key] = w
        return w

    def kw_idf(self, keyword: int) -> float:
        if keyword in self.kw_idf_weights:
            return self.kw_idf_weights[keyword]
        df = self.kw_counts.get(keyword)
        if not df:
            return 0.0
        w = keyword_idf(self.collection_size, df)
        self.kw_idf_weights[keyword] = w
        return w

    def kp_npmi(self, entity: str, keyphrase: int) -> float:
        key = (entity, keyphrase)
        if key not in self.entity_kp_count:
            return 0.0
        return compute_npmi(
            self.entity_counts[entity],
            self.kp_counts.get(keyphrase, 0),
            self.entity_kp_count[key],
            self.collection_size,
        )

    def entity_id(self, entity: str) -> int:
        return self.entity2id.get(entity, -1)
