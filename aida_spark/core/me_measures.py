"""Alternative mention–entity similarity measures (M4) beyond the default
keyphrase-match family: TF-IDF cosine, word-count dot product, and
Jaccard over the document context vs the entity keyword context.

Reference: ``measure/TfIdfCosineSimilarityMeasure.java``,
``measure/WordCountVectorDotProductSimilarityMeasure.java``,
``measure/JaccardSimilarityMeasure.java`` (all non-default, available via
SwitchedUnit-style configs). Formulas re-derived from the standard
definitions; entity context = the entity's keyword ids (stopword-free),
document context = the conversation token ids.
"""

from __future__ import annotations

import math
from collections import Counter

from .kb import KBData

__all__ = [
    "tfidf_cosine_similarity",
    "word_count_dot_similarity",
    "jaccard_me_similarity",
    "derive_unit_counts",
    "unigram_lm_similarity",
    "bigram_lm_similarity",
    "UnitLMWeights",
    "UnitLMScorer",
]


def _doc_term_counts(token_ids: list[int], kb: KBData) -> Counter:
    return Counter(t for t in token_ids if not kb.is_stopword(t))


def _entity_keywords(entity: str, kb: KBData) -> set[int]:
    out: set[int] = set()
    for kp in kb.entity_kps.get(entity, ()):
        for t in kb.kp_tokens.get(kp, ()):
            if not kb.is_stopword(t):
                out.add(t)
    return out


def tfidf_cosine_similarity(
    entity: str, token_ids: list[int], kb: KBData
) -> float:
    """Cosine between the document's tf*idf vector and the entity's
    idf-weighted keyword vector (entity keyword tf treated as 1)."""
    tf = _doc_term_counts(token_ids, kb)
    kws = _entity_keywords(entity, kb)
    if not tf or not kws:
        return 0.0
    doc_vec = {t: c * kb.kw_idf(t) for t, c in tf.items()}
    ent_vec = {t: kb.kw_idf(t) for t in kws}
    dot = sum(doc_vec.get(t, 0.0) * w for t, w in ent_vec.items())
    n_doc = math.sqrt(sum(v * v for v in doc_vec.values()))
    n_ent = math.sqrt(sum(v * v for v in ent_vec.values()))
    if n_doc == 0.0 or n_ent == 0.0:
        return 0.0
    return dot / (n_doc * n_ent)


def word_count_dot_similarity(
    entity: str, token_ids: list[int], kb: KBData
) -> float:
    """Raw word-count dot product: sum of document term counts over the
    entity's keywords."""
    tf = _doc_term_counts(token_ids, kb)
    return float(sum(tf.get(t, 0) for t in _entity_keywords(entity, kb)))


def jaccard_me_similarity(
    entity: str, token_ids: list[int], kb: KBData
) -> float:
    doc_terms = set(_doc_term_counts(token_ids, kb))
    kws = _entity_keywords(entity, kb)
    union = doc_terms | kws
    if not union:
        return 0.0
    return len(doc_terms & kws) / len(union)


# ---------------------------------------------------------------------------
# M4 unit language models (SwitchedUnit.properties): Dirichlet-smoothed
# unigram (KEYWORD) / bigram (BIGRAM) LMs per entity.
#
# The reference snapshot ships the unit machinery (UnitType.java — KEYWORD
# size 1 / BIGRAM size 2, unit count tables; UnitBuilder.java builds units
# from keyphrase tokens; unitSmoothingParameter default {100,100} in
# EntitiesContextSettings.java:42) and the SwitchedUnit.properties weights,
# but not the measure classes themselves — the formulas below are the
# standard Dirichlet-smoothed query-likelihood LM those settings
# parameterize:
#
#   P(u|e) = (c(u,e) + mu * P(u|C)) / (sum_u c(u,e) + mu)
#   score(m,e) = sum over document context units u of log P(u|e)
#
# Scores are negative log-likelihoods; the switched ensemble min-max
# rescales them per document exactly like the keyphrase measures, so only
# relative order matters.
# ---------------------------------------------------------------------------


def derive_unit_counts(kb: KBData) -> None:
    """Fill entity/global unit counts from the keyphrase tables when the
    repository didn't ship them. Mirrors how the reference builds its unit
    tables from keyphrase tokens at repository-build time (UnitBuilder):
    c(unit, e) = sum of c(kp, e) over the entity's keyphrases containing
    the unit; global count = sum of kp doc-frequencies over keyphrases
    containing the unit. Unigram global counts prefer the real
    keyword_counts table when present."""
    if kb.bigram_counts or kb.entity_bigram_count:
        return
    for (entity, kp), c in kb.entity_kp_count.items():
        toks = [t for t in kb.kp_tokens.get(kp, ()) if not kb.is_stopword(t)]
        for a, b in zip(toks, toks[1:]):
            key = (entity, (a, b))
            kb.entity_bigram_count[key] = kb.entity_bigram_count.get(key, 0) + c
    seen_kp_bigrams: dict[tuple[int, int], int] = {}
    for kp, df in kb.kp_counts.items():
        toks = [t for t in kb.kp_tokens.get(kp, ()) if not kb.is_stopword(t)]
        for a, b in zip(toks, toks[1:]):
            seen_kp_bigrams[(a, b)] = seen_kp_bigrams.get((a, b), 0) + df
    kb.bigram_counts = seen_kp_bigrams


def _doc_units(token_ids: list[int], kb: KBData, size: int):
    """Document context units: the non-stopword token sequence (size 1) or
    adjacent pairs of it (size 2)."""
    toks = [t for t in token_ids if not kb.is_stopword(t)]
    if size == 1:
        return toks
    return list(zip(toks, toks[1:]))


def _lm_score(
    entity: str,
    units,
    entity_counts: dict,
    global_counts: dict,
    collection_size: int,
    smoothing: float,
) -> float:
    ent_units = {
        u: c for (e, u), c in entity_counts.items() if e == entity
    }
    total = sum(ent_units.values())
    score = 0.0
    global_total = max(sum(global_counts.values()), 1)
    for u in units:
        p_bg = max(global_counts.get(u, 0), 1) / global_total
        p = (ent_units.get(u, 0) + smoothing * p_bg) / (total + smoothing)
        score += math.log(p)
    return score


def unigram_lm_similarity(
    entity: str, token_ids: list[int], kb: KBData, smoothing: float = 100.0
) -> float:
    """KEYWORD-unit LM log-likelihood of the document context under the
    entity's smoothed unigram model (entity_kw_count / keyword_counts)."""
    return _lm_score(
        entity,
        _doc_units(token_ids, kb, 1),
        kb.entity_kw_count,
        kb.kw_counts,
        kb.collection_size,
        smoothing,
    )


def bigram_lm_similarity(
    entity: str, token_ids: list[int], kb: KBData, smoothing: float = 100.0
) -> float:
    """BIGRAM-unit LM log-likelihood; unit counts derived from the
    keyphrase tables on first use (derive_unit_counts)."""
    derive_unit_counts(kb)
    return _lm_score(
        entity,
        _doc_units(token_ids, kb, 2),
        kb.entity_bigram_count,
        kb.bigram_counts,
        kb.collection_size,
        smoothing,
    )


from dataclasses import dataclass, field  # noqa: E402


@dataclass
class UnitLMWeights:
    """settings/similarity/conll/SwitchedUnit.properties verbatim."""

    kw_with_prior: float = 0.03127599041967563
    bg_with_prior: float = 0.03828354836862837
    prior_weight: float = 0.930440461211696
    kw_no_prior: float = 0.4200243143055424
    bg_no_prior: float = 0.5799756856944576
    prior_threshold: float = 0.9
    smoothing: float = 100.0  # unitSmoothingParameter default


class UnitLMScorer:
    """SwitchedUnit ensemble: the two unit-LM measures min-max rescaled per
    document and combined under the same prior switch as the keyphrase
    ensemble (EnsembleMentionEntitySimilarity semantics, scoring.py)."""

    def __init__(self, mentions, kb: KBData, token_ids, weights: UnitLMWeights):
        from .scoring import rescale  # local import avoids module cycle
        from .text import conflate

        self._rescale = rescale
        self.kb = kb
        self.weights = weights
        self.raw = {"kw": {}, "bg": {}}
        self.priors: dict[int, dict[str, float]] = {}
        self.best_prior: dict[int, float] = {}
        for mi, m in enumerate(mentions):
            priors = kb.priors(conflate(m.surface))
            self.priors[mi] = priors
            self.best_prior[mi] = max(priors.values(), default=0.0)
            kw_s, bg_s = {}, {}
            for cand, _prior in m.candidates:
                kw_s[cand] = unigram_lm_similarity(
                    cand, token_ids, kb, weights.smoothing
                )
                bg_s[cand] = bigram_lm_similarity(
                    cand, token_ids, kb, weights.smoothing
                )
            self.raw["kw"][mi] = kw_s
            self.raw["bg"][mi] = bg_s
        self.minmax = {}
        for measure in ("kw", "bg"):
            lo, hi = float("inf"), float("-inf")
            for scores in self.raw[measure].values():
                for s in scores.values():
                    lo, hi = min(lo, s), max(hi, s)
            if lo == float("inf"):
                lo = hi = 0.0
            self.minmax[measure] = (lo, hi)

    def use_prior(self, mention_idx: int, mention) -> bool:
        w = self.weights
        if w.prior_threshold <= 0.0:
            return True
        if self.best_prior[mention_idx] <= w.prior_threshold:
            return False
        cands = mention.candidates
        if not cands:
            return False
        with_prior = sum(
            1 for c, _p in cands if self.priors[mention_idx].get(c, 0.0) > 0.0
        )
        return (with_prior / len(cands)) >= 0.2

    def similarity(self, mention_idx: int, mention, entity: str) -> float:
        w = self.weights
        kw = self._rescale(
            self.raw["kw"][mention_idx][entity], *self.minmax["kw"]
        )
        bg = self._rescale(
            self.raw["bg"][mention_idx][entity], *self.minmax["bg"]
        )
        if self.use_prior(mention_idx, mention):
            sim = kw * w.kw_with_prior + bg * w.bg_with_prior
            sim += self.priors[mention_idx].get(entity, 0.0) * w.prior_weight
        else:
            sim = kw * w.kw_no_prior + bg * w.bg_no_prior
        return sim
