"""Mention–entity local scoring: keyphrase-match similarity and the
prior-switched ensemble.

Faithful re-implementation (from scratch, in Python) of:
- the per-document inverted index (``util/InputTextInvertedIndex.java``),
- the EMNLP-2011 keyphrase-match score
  (``measure/KeyphrasesBasedMentionEntitySimilarityMeasure.java:57-224``),
- the MI / IDF keyword-weight variants
  (``measure/UnnormalizedKeyphrasesBased{MI,IDF}Similarity.java``),
- global min-max rescaling + the prior-switched weighted ensemble
  (``similarity/EnsembleMentionEntitySimilarity.java:114-316``).

Everything here is per-document (one conversation) and pure Python/numpy;
the Spark layer invokes it inside a grouped ``applyInPandas`` UDF.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .kb import KBData
from .mincover import min_cover_length
from .text import SpottedMention

__all__ = [
    "InvertedIndex",
    "keyphrase_similarity",
    "EnsembleWeights",
    "EnsembleScorer",
    "normalize_to_sum",
    "rescale",
]


class InvertedIndex:
    """token-id -> positions, in two coordinate systems: including and
    excluding stopwords (InputTextInvertedIndex.java:22-81).

    Unknown words all share id 0, which is a stopword id (the reference's
    unknown-word noEntryValue collides with unknown stopword ids — an
    accidental but load-bearing behavior we replicate).
    """

    def __init__(self, token_ids: list[int], kb: KBData, remove_stopwords: bool = True):
        full: dict[int, list[int]] = {}
        nostop: dict[int, list[int]] = {}
        self.full = full
        self.nostop = nostop
        nostop_pos = 0
        is_stopword = kb.is_stopword
        for pos, tok in enumerate(token_ids):
            lst = full.get(tok)
            if lst is None:
                full[tok] = [pos]
            else:
                lst.append(pos)
            if not remove_stopwords or not is_stopword(tok):
                lst = nostop.get(tok)
                if lst is None:
                    nostop[tok] = [nostop_pos]
                else:
                    lst.append(nostop_pos)
                nostop_pos += 1

    def contains(self, word: int, m_start: int, m_end: int) -> bool:
        if word not in self.nostop:
            return False
        # positions are appended in ascending order, so "any position
        # outside [m_start, m_end]" reduces to an O(1) check of the first
        # and last position (identical result to the per-position scan —
        # this is the innermost probe of the keyphrase match loop)
        full = self.full[word]
        return full[0] < m_start or full[-1] > m_end

    def positions(self, word: int, m_start: int, m_end: int) -> list[int]:
        """No-stopword-coordinate positions outside the mention span; the
        mention length is subtracted for positions after the mention
        (InputTextInvertedIndex.getPositions)."""
        m_len = m_end - m_start + 1
        out: list[int] = []
        full = self.full[word]
        nostop = self.nostop[word]
        for i, pos in enumerate(full):
            if pos < m_start:
                out.append(nostop[i])
            elif pos > m_end:
                out.append(nostop[i] - m_len)
        return out


def keyphrase_similarity(
    mention: SpottedMention,
    entity: str,
    kb: KBData,
    index: InvertedIndex,
    weight: str,  # "mi" | "idf"
) -> float:
    """KeyphrasesBasedMentionEntitySimilarityMeasure.calcSimilarity.

    Per keyphrase: score = phraseImportance * (|isec| / minCover)
                   * (matchedKeywordScore / allKeywordScore)^2, clamped >= 0,
    summed over keyphrases with source weight 1.0.
    """
    kps = kb.entity_kps.get(entity)
    if not kps:
        return 0.0
    m_start, m_end = mention.start_token, mention.end_token
    sim = 0.0
    for kp in kps:
        common_positions: list[list[int]] = []
        all_score = 0.0
        common_score = 0.0
        phrase_importance = 0.0
        for kw in kb.kp_tokens.get(kp, ()):  # keyphrase-token expansion (K2)
            if kb.is_stopword(kw):
                continue
            expanded = kb.expand(kw)
            kw_score = kb.kw_mi(entity, kw) if weight == "mi" else kb.kw_idf(kw)
            phrase_importance += kw_score
            all_score += kw_score
            matched = -1
            if index.contains(kw, m_start, m_end):
                matched = kw
            elif index.contains(expanded, m_start, m_end):
                matched = expanded
            if matched != -1:
                common_positions.append(index.positions(matched, m_start, m_end))
                common_score += kw_score
        isec = len(common_positions)
        if isec == 0:
            continue
        cover = float(min_cover_length(common_positions))
        score = 0.0
        if all_score != 0.0:
            score = phrase_importance * (isec / cover) * (common_score / all_score) ** 2
        if math.isnan(score):
            score = 0.0
        sim += max(0.0, score)  # source weight defaults to 1.0
    return sim


class _EntityScoreContext:
    """Per-entity static scoring structure, computed once per conversation
    and reused across mentions: for each keyphrase the non-stopword
    keywords with their expansion ids and MI/IDF weights, plus the weight
    totals. Pure caching — the math is identical to keyphrase_similarity."""

    __slots__ = ("kps",)

    def __init__(self, entity: str, kb: KBData):
        self.kps = []
        for kp in kb.entity_kps.get(entity, ()):
            kws = []
            mi_total = 0.0
            idf_total = 0.0
            for kw in kb.kp_tokens.get(kp, ()):
                if kb.is_stopword(kw):
                    continue
                w_mi = kb.kw_mi(entity, kw)
                w_idf = kb.kw_idf(kw)
                kws.append((kw, kb.expand(kw), w_mi, w_idf))
                mi_total += w_mi
                idf_total += w_idf
            self.kps.append((kws, mi_total, idf_total))


def keyphrase_similarity_both(
    mention: SpottedMention,
    ectx: _EntityScoreContext,
    index: InvertedIndex,
) -> tuple[float, float]:
    """One matching pass computing BOTH the MI- and IDF-weighted keyphrase
    similarities (the match set is weight-independent, so the two measures
    of the reference share it; UnnormalizedKeyphrasesBased{MI,IDF})."""
    m_start, m_end = mention.start_token, mention.end_token
    sim_mi = 0.0
    sim_idf = 0.0
    # inlined InvertedIndex.contains (the innermost probe): same two
    # dict checks and the same O(1) first/last-position test, minus two
    # function calls per keyword
    nostop = index.nostop
    full = index.full
    for kws, mi_all, idf_all in ectx.kps:
        common_positions: list[list[int]] = []
        mi_common = 0.0
        idf_common = 0.0
        for kw, expanded, w_mi, w_idf in kws:
            matched = -1
            if kw in nostop:
                f = full[kw]
                if f[0] < m_start or f[-1] > m_end:
                    matched = kw
            if matched == -1 and expanded in nostop:
                f = full[expanded]
                if f[0] < m_start or f[-1] > m_end:
                    matched = expanded
            if matched != -1:
                common_positions.append(index.positions(matched, m_start, m_end))
                mi_common += w_mi
                idf_common += w_idf
        isec = len(common_positions)
        if isec == 0:
            continue
        cover = float(min_cover_length(common_positions))
        frac = isec / cover
        if mi_all != 0.0:
            s = mi_all * frac * (mi_common / mi_all) ** 2
            if not math.isnan(s):
                sim_mi += max(0.0, s)
        if idf_all != 0.0:
            s = idf_all * frac * (idf_common / idf_all) ** 2
            if not math.isnan(s):
                sim_idf += max(0.0, s)
    return sim_mi, sim_idf


def normalize_to_sum(scores: dict) -> dict:
    """CollectionUtils.normalizeValuesToSum: values / sum; unchanged if sum==0."""
    total = sum(scores.values())
    if total == 0:
        return scores
    return {k: v / total for k, v in scores.items()}


def rescale(value: float, lo: float, hi: float) -> float:
    """EnsembleMentionEntitySimilarity.rescale (EnsembleMES.java:297-316)."""
    if value < lo:
        return lo
    if value > hi:
        return hi
    if lo == hi:
        return hi
    return (value - lo) / (hi - lo)


def entity_importance(kb: KBData, entity: str, source: str) -> float:
    """M7 entity-importance sources (the EntityImportance hierarchy):

    - ``"inlink_count"`` (InlinkCountImportance.java:30-45):
      |inlinks| / collection size.
    - ``"entity_rank"`` (AidaEntityImportance over the entity_rank
      table): 1 - rank.
    - ``"count_based"`` (alias ``"gnd_count"``;
      CountBasedImportance.java:28-52 + MathUtil.rescale:14-30):
      (count - min) / (max - min) over the GLOBAL count table
      (``kb.gnd_counts``); min == max -> 1.0 (MathUtil.rescale:15-18);
      out-of-range values clamp to 0.0/1.0 (:20-28); entities absent
      from the table score 0.0 — "do not differentiate between a
      missing entity and a 0 score" (:47-51). The min/max scan is
      O(|table|) per call — hoist it if driving a large table with a
      nonzero importance weight.
    """
    if source == "entity_rank":
        return 1.0 - kb.entity_rank.get(entity, 1.0)
    if source in ("count_based", "gnd_count"):
        counts = kb.gnd_counts
        if not counts or entity not in counts:
            return 0.0
        lo, hi = min(counts.values()), max(counts.values())
        if lo == hi:
            return 1.0
        v = counts[entity]
        if v < lo:
            return 0.0
        if v > hi:
            return 1.0
        return (v - lo) / float(hi - lo)
    return len(kb.inlinks.get(entity, ())) / float(kb.collection_size)


@dataclass
class EnsembleWeights:
    """Weight configuration for the switched ensemble, defaults from
    settings/similarity/conll/SwitchedKP.properties:1-4."""

    mi_with_prior: float = 0.10123683065
    idf_with_prior: float = 0.33359024871
    prior_weight: float = 0.56517292063
    mi_no_prior: float = 0.58132103337
    idf_no_prior: float = 0.41867896662
    prior_threshold: float = 0.9
    # M7: optional entity-importance term (LINEAR_COMBINATION strategy,
    # EnsembleMES.java:190-201); source: "inlink_count" (InlinkCount
    # Importance.java:30-45, |inlinks|/N), "entity_rank" (1 - rank,
    # AidaEntityImportance via entity_rank), or "count_based" /
    # "gnd_count" (CountBasedImportance.java, rescaled kb.gnd_counts)
    importance_weight: float = 0.0
    importance_source: str = "inlink_count"


class EnsembleScorer:
    """Precomputes raw MI/IDF keyphrase scores for every (mention, candidate)
    pair, derives per-measure global min/max, then serves switched-ensemble
    similarities (EnsembleMentionEntitySimilarity)."""

    def __init__(
        self,
        mentions: list[SpottedMention],
        kb: KBData,
        token_ids: list[int],
        weights: EnsembleWeights,
        raw_from: "EnsembleScorer | None" = None,
    ):
        self.kb = kb
        self.weights = weights
        # per-instance memo of the per-mention prior switch: every
        # similarity() call for the same mention repeats an O(#cands)
        # scan otherwise. Safe per instance: each scorer's similarity
        # calls all happen while the mention's candidate list is stable
        # (candidate-reducing heuristics run between scorer lifetimes).
        self._use_prior_memo: dict[int, bool] = {}
        if raw_from is not None:
            # The raw MI/IDF keyphrase scores depend only on the context and
            # candidates, not on the ensemble weights — share them between
            # the main and coherence-robustness ensembles (the reference
            # recomputes them identically in two instances,
            # GraphGenerator.java:123-129,365-369).
            self.index = raw_from.index
            self.raw = raw_from.raw
            self.minmax = raw_from.minmax
            self.priors = raw_from.priors
            self.best_prior = raw_from.best_prior
            return
        self.index = InvertedIndex(token_ids, kb, remove_stopwords=True)
        self.raw: dict[str, dict[int, dict[str, float]]] = {"mi": {}, "idf": {}}
        self.minmax: dict[str, tuple[float, float]] = {}
        self.priors: dict[int, dict[str, float]] = {}
        self.best_prior: dict[int, float] = {}
        from .text import conflate

        # entity contexts are cached on the KBData (shared per solve
        # bucket in the Spark path — see KBData.ectx_cache): identical
        # structures, parsed once per bucket instead of per conversation
        entity_ctx = kb.ectx_cache
        for mi, m in enumerate(mentions):
            priors = kb.priors(conflate(m.surface))
            self.priors[mi] = priors
            self.best_prior[mi] = max(priors.values(), default=0.0)
            mi_scores: dict[str, float] = {}
            idf_scores: dict[str, float] = {}
            for cand, _prior in m.candidates:
                ectx = entity_ctx.get(cand)
                if ectx is None:
                    ectx = entity_ctx[cand] = _EntityScoreContext(cand, kb)
                mi_scores[cand], idf_scores[cand] = keyphrase_similarity_both(
                    m, ectx, self.index
                )
            self.raw["mi"][mi] = mi_scores
            self.raw["idf"][mi] = idf_scores
        for measure in ("mi", "idf"):
            # Java inits min to Double.MAX_VALUE and max to 0.0
            lo, hi = float("inf"), 0.0
            for scores in self.raw[measure].values():
                for s in scores.values():
                    lo = min(lo, s)
                    hi = max(hi, s)
            self.minmax[measure] = (lo, hi)

    def use_prior(self, mention_idx: int, mention: SpottedMention) -> bool:
        """Prior switch: bestPrior > threshold AND >= 20% of candidates have
        a prior (EnsembleMES.shouldIncludePrior, threshold hardcoded 0.2)."""
        memo = self._use_prior_memo.get(mention_idx)
        if memo is not None:
            return memo
        w = self.weights
        if w.prior_threshold <= 0.0:
            result = True  # non-switched: prior always used
        elif self.best_prior[mention_idx] <= w.prior_threshold:
            result = False
        elif not mention.candidates:
            result = False
        else:
            cands = mention.candidates
            priors_get = self.priors[mention_idx].get
            with_prior = sum(
                1 for c, _p in cands if priors_get(c, 0.0) > 0.0
            )
            result = (with_prior / len(cands)) >= 0.2
        self._use_prior_memo[mention_idx] = result
        return result

    def similarity(self, mention_idx: int, mention: SpottedMention, entity: str) -> float:
        w = self.weights
        use_prior = self.use_prior(mention_idx, mention)
        mi = rescale(self.raw["mi"][mention_idx][entity], *self.minmax["mi"])
        idf = rescale(self.raw["idf"][mention_idx][entity], *self.minmax["idf"])
        if use_prior:
            sim = mi * w.mi_with_prior + idf * w.idf_with_prior
            if w.prior_weight > 0.0:
                sim += self.priors[mention_idx].get(entity, 0.0) * w.prior_weight
        else:
            sim = mi * w.mi_no_prior + idf * w.idf_no_prior
        if w.importance_weight > 0.0:
            sim += (
                entity_importance(self.kb, entity, w.importance_source)
                * w.importance_weight
            )
        return sim
