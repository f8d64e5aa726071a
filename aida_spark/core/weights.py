"""Association-weight computations (MI / NPMI / IDF).

Re-implements, from scratch, the formulas of the reference implementation
(AIDA 3.0.5, ``src/mpi/aida/graph/similarity/measure/WeightComputation.java:59-224``
and ``src/mpi/aida/graph/similarity/context/KeyphrasesContext.java:301-326``)
so that the Spark pipeline produces numerically identical scores.

All functions are scalar float64 (Python float == IEEE double, same as Java).
Vectorized (numpy / pyspark.sql.functions) variants live in
``aida_spark/functions/weights.py``.
"""

from __future__ import annotations

import math

__all__ = ["log2", "compute_npmi", "compute_mi", "keyword_idf", "keyphrase_idf"]


def log2(x: float) -> float:
    # Mirrors WeightComputation.log2 (Math.log(x)/Math.log(2)) including
    # Java's IEEE edge cases: Math.log(0) = -Inf, Math.log(negative) = NaN
    # (python's math.log raises instead). Inconsistent counts — e.g. an
    # entity-keyword co-occurrence larger than the keyword's document
    # frequency — produce a NaN score in the reference and are zeroed by
    # the NaN check downstream; generated universes hit this.
    if x > 0.0:
        return math.log(x) / math.log(2)
    if x == 0.0:
        return -math.inf
    return math.nan


def compute_npmi(a: int, b: int, ab: int, total: int) -> float:
    """Normalized pointwise mutual information, normalized by -ln p(a,b).

    ``ab == 0`` is defined as -1 (no correlation).
    Reference: WeightComputation.computeNPMI (WeightComputation.java:59-88).
    """
    if ab == 0:
        return -1.0
    joint = ab / total
    pa = a / total
    pb = b / total
    if pa * pb == 0.0:
        # Java double arithmetic: x/0.0 = +Inf, log(+Inf) = +Inf — the
        # reference silently produces +Inf for a keyphrase with zero DF
        # (e.g. the fixture's "Page" keyphrase, which is absent from
        # allKeyphraseFrequencies); mirror it instead of raising.
        return math.inf
    return math.log(joint / (pa * pb)) / -math.log(joint)


def compute_mi(a: int, b: int, ab: int, total: int, normalize: bool = False) -> float:
    """4-cell mutual information with 0-cell flooring.

    Contingency table over the event space of ``total`` documents:
    event d = "document belongs to entity superdoc" (count ``a``),
    event k = "document contains keyword" (count ``b``), joint count ``ab``.
    Zero cells are floored to 1 occurrence (the reference does this to keep
    the logs finite). Optional normalization by the average uncertainty
    coefficient (Press et al.).

    Reference: WeightComputation.computeMI (WeightComputation.java:102-220).
    """
    a_f, b_f, ab_f, total_f = float(a), float(b), float(ab), float(total)

    p_d = a_f / total_f
    if p_d == 0.0:
        p_d = 1.0 / total_f
    p_nd = (total_f - a_f) / total_f
    if p_nd == 0.0:
        p_nd = 1.0 / total_f
    p_k = b_f / total_f
    if p_k == 0.0:
        p_k = 1.0 / total_f
    p_nk = (total_f - b_f) / total_f
    if p_nk == 0.0:
        p_nk = 1.0 / total_f

    # joint cells, each floored to 1/total when the count is <= 0
    num_dk = ab_f if ab_f != 0.0 else 1.0
    p_dk = num_dk / total_f

    num_ndk = b_f - ab_f
    if num_ndk <= 0.0:
        num_ndk = 1.0
    p_ndk = num_ndk / total_f

    num_dnk = a_f - ab_f
    if num_dnk == 0.0:
        num_dnk = 1.0
    p_dnk = num_dnk / total_f

    num_ndnk = total_f - (a_f + b_f - ab_f)
    if num_ndnk == 0.0:
        num_ndnk = 1.0
    p_ndnk = num_ndnk / total_f

    score = p_dk * log2(p_dk / (p_d * p_k))
    score += p_ndk * log2(p_ndk / (p_nd * p_k))
    score += p_dnk * log2(p_dnk / (p_d * p_nk))
    score += p_ndnk * log2(p_ndnk / (p_nd * p_nk))

    if normalize:
        d_ent = -((p_d * log2(p_d)) + (p_nd * log2(p_nd)))
        k_ent = -((p_k * log2(p_k)) + (p_nk * log2(p_nk)))
        score = (2 * score) / (d_ent + k_ent)

    if math.isnan(score):
        score = 0.0
    return score


def keyword_idf(collection_size: int, df: int, normalize: bool = False) -> float:
    """Keyword IDF: log2(collectionSize / df).

    NOTE: the reference computes this with Java *integer* division
    (KeyphrasesContext.computeIDFweights, KeyphrasesContext.java:309) —
    replicated here with ``//`` for score parity.
    """
    idf = log2(collection_size // df)
    if math.isnan(idf):
        idf = 0.0
    if normalize:
        idf = idf / log2(collection_size)
    return idf


def keyphrase_idf(collection_size: int, df: int, normalize: bool = True) -> float:
    """Keyphrase IDF uses float division (WeightedKeyphrasesContext.calcAndAddIdfWeights)."""
    idf = log2(float(collection_size) / float(df))
    if normalize:
        idf = idf / log2(collection_size)
    return idf
