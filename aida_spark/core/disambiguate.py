"""Per-document (= per-conversation) disambiguation driver.

Mirrors the reference query lifecycle (SURVEY.md §3.1):
Preparator.prepare -> EntityLookup.fillInCandidateEntities ->
GraphGenerator (local sims + pre-graph heuristics) -> CocktailParty ->
ResultsReconciler. This module is pure Python; the Spark pipeline executes
it per conversation inside ``applyInPandas`` (aida_spark/pipeline.py).

Reference anchors:
- heuristics & L1 coherence-robustness test: GraphGenerator.java:86-264,354-446
- LOCAL technique: disambiguationtechnique/LocalDisambiguation.java:88-136
- PRIOR-only: PriorOnlyDisambiguationSettings.java:16-22
- chunk reconciliation: resultreconciliation/ResultsReconciler.java:66-130
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .graph import GraphConfig, MentionResult, cocktail_party
from .kb import KBData, OOKBE
from .scoring import EnsembleScorer, EnsembleWeights, normalize_to_sum
from .text import SpottedMention, conflate, parse_markup, spot_mentions, tokenize

__all__ = ["DisambiguationConfig", "Document", "prepare", "disambiguate_document"]

PRONOUNS = {
    "he", "she", "it", "him", "her", "his", "hers", "its", "they", "them",
    "their", "theirs", "we", "us", "our", "ours", "you", "your", "yours",
    "i", "me", "my", "mine",
}

# settings/similarity/conll/SwitchedKP_cohrob.properties
COHROB_WEIGHTS = EnsembleWeights(
    mi_with_prior=0.8360808680254525,
    idf_with_prior=0.16391913197454755,
    prior_weight=0.0,
    mi_no_prior=0.0,
    idf_no_prior=0.0,
    prior_threshold=-1.0,
)


@dataclass
class DisambiguationConfig:
    technique: str = "graph"          # "graph" | "local" | "prior"
    algorithm: str = "cpsc"           # "cp" | "cpsc" for the graph technique
    alpha: float = 0.6
    entities_per_mention: int = 5
    use_coherence_robustness: bool = True
    coh_robustness_threshold: float = 0.9
    # G1 early-fix heuristics (GraphGenerator.java:287-322), default OFF
    # like the reference (GraphSettings.java:61,73); the reference's
    # CocktailPartyWithHeuristics...Settings preset uses thresholds 0.9 / 5.
    # confidence: fix a mention when its best normalized local sim exceeds
    # the threshold (doConfidenceThresholdCheck)
    use_confidence_threshold_fix: bool = False
    confidence_fix_threshold: float = 0.9
    # easy mentions: fix mentions with fewer than this many candidates to
    # the best local candidate (doEasyMentionsCheck, strict <)
    use_easy_mentions_fix: bool = False
    easy_mentions_max_candidates: int = 5
    use_exhaustive_search: bool = True
    use_normalized_objective: bool = True
    max_entity_rank: float = 1.0
    compute_confidence: bool = False
    confidence_balance: float = 1.0
    null_mapping_threshold: float = -1.0
    ee_measures: tuple = (("milne_witten", 1.0),)
    person_merge: bool = False  # RECONCILER_PERSON_MERGE
    # P7: drop mentions whose surface occurs fewer than k times in the
    # document (Preparator.java:106-109,125-140); 0/1 disables
    min_mention_occurrence: int = 0
    # C8: keep only candidates having >= 1 of these types
    # (EntityLookup.filterEntitiesByType:242-261); empty disables
    type_filter: tuple = ()
    fuzzy_min_sim: float = 0.0  # C5 trigram fallback; 0 disables
    weights: EnsembleWeights = field(default_factory=EnsembleWeights)
    # M4 local-similarity family: "switched_kp" = keyphrase MI/IDF ensemble
    # (SwitchedKP.properties, the default); "switched_unit" = unigram/bigram
    # language-model ensemble (SwitchedUnit.properties, me_measures.py)
    local_similarity: str = "switched_kp"
    # scale guard: conversations with more candidates than this abort the
    # coherence graph and fall back to LOCAL (GraphGenerator.java:100-103)
    max_candidates_for_graph: int = 20000


@dataclass
class Document:
    doc_id: str
    tokens: list[str]
    token_ids: list[int]
    mentions: list[SpottedMention]
    # char offset of each token in the original per-turn text, for lineage
    token_turns: list[int] = field(default_factory=list)


def prepare(
    doc_id: str, text: str, kb: KBData, include_unknown_caps: bool = False
) -> Document:
    """P1/P2/P4/P5: markup parse, tokenize, hybrid mention spotting."""
    clean, manual_spans = parse_markup(text)
    tokens = tokenize(clean)
    mention_keys = set(kb.dictionary.keys())
    mentions = spot_mentions(
        tokens, manual_spans, mention_keys,
        include_unknown_caps=include_unknown_caps,
    )
    token_ids = [kb.word_id(t.text) for t in tokens]
    return Document(
        doc_id=doc_id,
        tokens=[t.text for t in tokens],
        token_ids=token_ids,
        mentions=mentions,
    )


def fill_candidates(doc: Document, kb: KBData, cfg: DisambiguationConfig) -> None:
    """C1-C4/C11: dictionary lookup with rank filter; pronouns suppressed."""
    for m in doc.mentions:
        if m.surface.lower() in PRONOUNS:
            m.candidates = []
            continue
        cands = kb.candidates(conflate(m.surface), cfg.max_entity_rank)
        if cands and cfg.type_filter:
            wanted = set(cfg.type_filter)
            cands = [
                (e, p) for (e, p) in cands
                if wanted & set(kb.entity_types.get(e, ()))
            ]
        if not cands and cfg.fuzzy_min_sim > 0.0:
            # C5 fuzzy fallback: union candidates of all dictionary names
            # within trigram similarity (EntityLookup.java:159-177)
            from .text import trigram_similarity

            key = conflate(m.surface)
            fuzzy: dict[str, float] = {}
            for name in kb.dictionary:
                if name != key and trigram_similarity(key, name) >= cfg.fuzzy_min_sim:
                    for e, p in kb.candidates(name, cfg.max_entity_rank) or []:
                        fuzzy[e] = max(fuzzy.get(e, 0.0), p)
            cands = sorted(fuzzy.items())
        m.candidates = cands or []


def _coherence_robustness_l1(
    doc: Document, kb: KBData, raw_from: EnsembleScorer | None = None
) -> dict[int, float]:
    """L1 distance between the prior distribution and the cohrob-ensemble
    similarity distribution, per mention (GraphGenerator.java:354-446)."""
    scorer = EnsembleScorer(
        doc.mentions, kb, doc.token_ids, COHROB_WEIGHTS, raw_from=raw_from
    )
    l1s: dict[int, float] = {}
    for mi, m in enumerate(doc.mentions):
        priors = {
            cand: scorer.priors[mi].get(cand, 0.0) for cand, _p in m.candidates
        }
        sims = {
            cand: scorer.similarity(mi, m, cand) for cand, _p in m.candidates
        }
        sims = normalize_to_sum(sims)
        l1s[mi] = sum(abs(priors[c] - sims.get(c, 0.0)) for c in priors)
    return l1s


def disambiguate_document(
    doc: Document, kb: KBData, cfg: DisambiguationConfig
) -> list[MentionResult]:
    if cfg.min_mention_occurrence > 1:
        counts: dict[str, int] = {}
        for m in doc.mentions:
            counts[m.surface] = counts.get(m.surface, 0) + 1
        doc.mentions = [
            m for m in doc.mentions
            if counts[m.surface] >= cfg.min_mention_occurrence
        ]
    fill_candidates(doc, kb, cfg)

    if cfg.technique == "prior":
        return _prior_only(doc)

    if cfg.local_similarity == "switched_unit":
        from .me_measures import UnitLMScorer, UnitLMWeights

        scorer = UnitLMScorer(doc.mentions, kb, doc.token_ids, UnitLMWeights())
    else:
        scorer = EnsembleScorer(doc.mentions, kb, doc.token_ids, cfg.weights)
    all_sims: dict[tuple[int, str], float] = {}
    for mi, m in enumerate(doc.mentions):
        for cand, _p in m.candidates:
            all_sims[(mi, cand)] = scorer.similarity(mi, m, cand)

    n_candidates = sum(len(m.candidates) for m in doc.mentions)
    technique = cfg.technique
    if technique == "graph" and n_candidates > cfg.max_candidates_for_graph:
        technique = "local"  # memory guard, GraphGenerator.java:100-103

    if technique == "local":
        results = _local_only(doc, all_sims, cfg)
    else:
        # G1 pre-graph early-fix heuristics, applied per mention with >1
        # candidate in the reference's order (GraphGenerator.java:175-210):
        # confidence threshold -> easy mentions -> coherence robustness.
        ensemble_sims = dict(all_sims)

        def _fix_to_best(mi: int, m) -> None:
            best = max(
                m.candidates, key=lambda cp: (all_sims[(mi, cp[0])], cp[0])
            )[0]
            m.candidates = [(c, p) for (c, p) in m.candidates if c == best]
            for k in [
                k for k in ensemble_sims if k[0] == mi and k[1] != best
            ]:
                del ensemble_sims[k]

        if cfg.use_confidence_threshold_fix or cfg.use_easy_mentions_fix:
            for mi, m in enumerate(doc.mentions):
                if len(m.candidates) <= 1:
                    continue
                if cfg.use_confidence_threshold_fix:
                    normalized = normalize_to_sum(
                        {c: all_sims[(mi, c)] for c, _p in m.candidates}
                    )
                    if (
                        max(normalized.values(), default=0.0)
                        > cfg.confidence_fix_threshold
                    ):
                        _fix_to_best(mi, m)
                        continue
                if (
                    cfg.use_easy_mentions_fix
                    and len(m.candidates) < cfg.easy_mentions_max_candidates
                ):
                    _fix_to_best(mi, m)

        # coherence-robustness heuristic: fix mentions whose prior and
        # local-sim distributions agree (L1 < threshold) to the best local
        # candidate before the graph algorithm
        if cfg.use_coherence_robustness:
            l1s = _coherence_robustness_l1(
                doc,
                kb,
                raw_from=scorer if isinstance(scorer, EnsembleScorer) else None,
            )
            for mi, m in enumerate(doc.mentions):
                if len(m.candidates) > 1 and l1s.get(mi, 2.0) < cfg.coh_robustness_threshold:
                    best = max(
                        m.candidates,
                        key=lambda cp: (all_sims[(mi, cp[0])], cp[0]),
                    )[0]
                    m.candidates = [
                        (c, p) for (c, p) in m.candidates if c == best
                    ]
                    ensemble_sims = {
                        k: v
                        for k, v in ensemble_sims.items()
                        if k[0] != mi or k[1] == best
                    }
        gcfg = GraphConfig(
            alpha=cfg.alpha,
            entities_per_mention=cfg.entities_per_mention,
            use_exhaustive=cfg.use_exhaustive_search,
            use_normalized_objective=cfg.use_normalized_objective,
            algorithm=cfg.algorithm,
            compute_confidence=cfg.compute_confidence,
            confidence_balance=cfg.confidence_balance,
            ee_measures=cfg.ee_measures,
        )
        results = cocktail_party(doc.mentions, ensemble_sims, kb, gcfg, all_sims)

    if cfg.person_merge:
        from .reconcile import merge_person_names

        results = merge_person_names(results)

    # post-hoc null threshold (ChunkDisambiguator.java:141-158)
    if cfg.null_mapping_threshold >= 0.0:
        results = [
            r
            if r.score >= cfg.null_mapping_threshold
            else MentionResult(r.mention, OOKBE, 0.0)
            for r in results
        ]
    return results


def _prior_only(doc: Document) -> list[MentionResult]:
    """M10: argmax prior per mention (PriorOnlyDisambiguationSettings)."""
    out = []
    for m in doc.mentions:
        if not m.candidates:
            out.append(MentionResult(m, OOKBE, 0.0))
            continue
        best, prior = max(m.candidates, key=lambda cp: (cp[1], cp[0]))
        out.append(MentionResult(m, best, prior))
    return out


def _local_only(
    doc: Document,
    sims: dict[tuple[int, str], float],
    cfg: DisambiguationConfig,
) -> list[MentionResult]:
    """M9/LOCAL: argmax ensemble sim; empty -> OOKBE (conf 0.95 when
    computing confidence), single candidate -> 0.95."""
    out = []
    for mi, m in enumerate(doc.mentions):
        scores = {c: sims[(mi, c)] for c, _p in m.candidates}
        if cfg.compute_confidence:
            scores = normalize_to_sum(scores)
        if not scores:
            out.append(
                MentionResult(m, OOKBE, 0.95 if cfg.compute_confidence else 0.0)
            )
            continue
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        score = best[1]
        if len(scores) == 1 and cfg.compute_confidence:
            score = 0.95
        out.append(MentionResult(m, best[0], score, candidates=scores))
    return out
