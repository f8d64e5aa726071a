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
