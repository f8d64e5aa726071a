"""Additional entity–entity relatedness measures beyond Milne-Witten:
KORE keyphrase-overlap, keyword-cosine, Jaccard / weighted-Jaccard and
NGD over keyword contexts.

Faithful re-implementations of the reference's measure family
(``measure/KOREEntityEntitySimilarityMeasure.java:30-113``,
``measure/KeywordCosineSimilarityMeasure.java:28-61``,
``measure/JaccardEntityEntitySimilarityMeasure.java``,
``measure/NGDSimilarityMeasure.java:22-64``), parameterized by the
combined MI/IDF weight alphas of FastWeightedKeyphrasesContext
(``FastWeightedKeyphrasesContext.java:165-170``,
``WeightedKeyphrasesContext.java:43-48``).

These run per-conversation inside the solver UDF (configurable EE
ensemble), exactly like Milne-Witten.
"""

from __future__ import annotations

import math

from .kb import KBData
from .weights import log2

__all__ = [
    "EEWeightContext",
    "kore_similarity",
    "keyword_cosine_similarity",
    "jaccard_similarity",
    "weighted_jaccard_similarity",
    "ngd_similarity",
]


class EEWeightContext:
    """Per-entity keyword/keyphrase weights with the FastWeightedKeyphrases
    semantics: combined keyword weight = a_kw*MI + (1-a_kw)*IDF and
    combined keyphrase weight = a_kp*NPMI + (1-a_kp)*IDF_kp, with optional
    normalization (IDF / log2(N); MI by uncertainty coefficients)."""

    def __init__(
        self,
        kb: KBData,
        keyword_alpha: float = 0.0,
        keyphrase_alpha: float = 1.0,
        normalize: bool = True,
        average_weights: bool = False,
    ):
        self.kb = kb
        self.kw_alpha = keyword_alpha
        self.kp_alpha = keyphrase_alpha
        self.normalize = normalize
        # K7 (WeightedKeyphrasesContext.averageMIweights:107-135): divide
        # keyphrase MI and IDF weights by their global mean over the
        # entity universe, making the two families comparable
        self._kp_mi_avg = 1.0
        self._kp_idf_avg = 1.0
        if average_weights:
            mis, idfs = [], []
            for e, kps in kb.entity_kps.items():
                for kp in kps:
                    mi = kb.kp_npmi(e, kp)
                    if math.isfinite(mi):
                        # zero-DF keyphrases yield +Inf NPMI in the
                        # reference's arithmetic (see weights.compute_npmi)
                        # and would degenerate the mean; the reference
                        # only logs them as data errors, so exclude here
                        mis.append(mi)
                    idfs.append(self._raw_kp_idf(kp))
            if mis:
                avg = sum(mis) / len(mis)
                self._kp_mi_avg = avg if avg != 0 else 1.0
            if idfs:
                avg = sum(idfs) / len(idfs)
                self._kp_idf_avg = avg if avg != 0 else 1.0

    # -- keyword weights ------------------------------------------------
    def kw_idf(self, token: int) -> float:
        df = self.kb.kw_counts.get(token)
        if not df:
            # Spark path: precomputed unnormalized int-division IDF
            idf = self.kb.kw_idf_weights.get(token, 0.0)
        else:
            idf = log2(self.kb.collection_size // df)
        if self.normalize:
            idf = idf / log2(self.kb.collection_size)
        return idf

    def kw_mi(self, entity: str, token: int) -> float:
        # the fixture stores *unnormalized* MI for keywords
        # (DataAccessForTesting.java:327-330)
        return self.kb.kw_mi(entity, token)

    def combined_kw(self, entity: str, token: int) -> float:
        return self.kw_alpha * self.kw_mi(entity, token) + (
            1.0 - self.kw_alpha
        ) * self.kw_idf(token)

    # -- keyphrase weights ----------------------------------------------
    def _raw_kp_idf(self, kp: int) -> float:
        df = self.kb.kp_counts.get(kp)
        if not df:
            return 0.0
        idf = log2(float(self.kb.collection_size) / float(df))
        if self.normalize:
            idf = idf / log2(self.kb.collection_size)
        return idf

    def kp_idf(self, kp: int) -> float:
        return self._raw_kp_idf(kp) / self._kp_idf_avg

    def combined_kp(self, entity: str, kp: int) -> float:
        return self.kp_alpha * (
            self.kb.kp_npmi(entity, kp) / self._kp_mi_avg
        ) + (1.0 - self.kp_alpha) * self.kp_idf(kp)

    # -- derived structures ----------------------------------------------
    def kp_tokens_nostop(self, kp: int) -> list[int]:
        return [
            t for t in self.kb.kp_tokens.get(kp, ()) if not self.kb.is_stopword(t)
        ]

    def keyword_array(self, entity: str) -> set[int]:
        out: set[int] = set()
        for kp in self.kb.entity_kps.get(entity, ()):
            out.update(self.kp_tokens_nostop(kp))
        return out

    def kw_to_kps(self, entity: str) -> dict[int, list[int]]:
        idx: dict[int, list[int]] = {}
        for kp in self.kb.entity_kps.get(entity, ()):
            for t in self.kp_tokens_nostop(kp):
                idx.setdefault(t, []).append(kp)
        return idx

    def kw_weight_sum(self, entity: str, kp: int) -> float:
        return sum(self.combined_kw(entity, t) for t in self.kp_tokens_nostop(kp))


def kore_similarity(a: str, b: str, ctx: EEWeightContext) -> float:
    """Two-level weighted Jaccard over overlapping keyphrase pairs
    (KOREEntityEntitySimilarityMeasure.calcSimilarity)."""
    kb = ctx.kb
    kw_a = ctx.keyword_array(a)
    kw_b = ctx.keyword_array(b)
    common = kw_a & kw_b
    a_idx = ctx.kw_to_kps(a)
    b_idx = ctx.kw_to_kps(b)
    overlapping: dict[int, set[int]] = {}
    for t in common:
        for kp_a in a_idx.get(t, ()):
            for kp_b in b_idx.get(t, ()):
                overlapping.setdefault(kp_a, set()).add(kp_b)

    n = 0.0
    for kp_a, kps_b in overlapping.items():
        toks_a = set(ctx.kp_tokens_nostop(kp_a))
        for kp_b in kps_b:
            isec = toks_a & set(ctx.kp_tokens_nostop(kp_b))
            psimn = sum(
                min(ctx.combined_kw(a, t), ctx.combined_kw(b, t)) for t in isec
            )
            kp_weight = min(ctx.combined_kp(a, kp_a), ctx.combined_kp(b, kp_b))
            psimd = ctx.kw_weight_sum(a, kp_a) + ctx.kw_weight_sum(b, kp_b) - psimn
            if psimd != 0.0:
                n += kp_weight * (psimn / psimd) ** 2

    denom = sum(ctx.combined_kp(a, kp) for kp in kb.entity_kps.get(a, ()))
    denom += sum(ctx.combined_kp(b, kp) for kp in kb.entity_kps.get(b, ()))
    return n / denom if denom > 0 else 0.0


def keyword_cosine_similarity(a: str, b: str, ctx: EEWeightContext) -> float:
    """Cosine of the combined-MI/IDF-weighted keyword vectors
    (KeywordCosineSimilarityMeasure.java:28-61)."""
    kw_a = ctx.keyword_array(a)
    kw_b = ctx.keyword_array(b)

    def norm(e: str, kws: set[int]) -> float:
        return math.sqrt(sum(ctx.combined_kw(e, t) ** 2 for t in kws))

    dot = sum(
        ctx.combined_kw(a, t) * ctx.combined_kw(b, t) for t in kw_a & kw_b
    )
    na, nb = norm(a, kw_a), norm(b, kw_b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def jaccard_similarity(a: str, b: str, ctx: EEWeightContext) -> float:
    kw_a = ctx.keyword_array(a)
    kw_b = ctx.keyword_array(b)
    union = kw_a | kw_b
    if not union:
        return 0.0
    return len(kw_a & kw_b) / len(union)


def weighted_jaccard_similarity(a: str, b: str, ctx: EEWeightContext) -> float:
    kw_a = ctx.keyword_array(a)
    kw_b = ctx.keyword_array(b)
    num = sum(
        min(ctx.combined_kw(a, t), ctx.combined_kw(b, t)) for t in kw_a & kw_b
    )
    den = sum(
        max(
            ctx.combined_kw(a, t) if t in kw_a else 0.0,
            ctx.combined_kw(b, t) if t in kw_b else 0.0,
        )
        for t in kw_a | kw_b
    )
    return num / den if den else 0.0


def ngd_similarity(a: str, b: str, ctx: EEWeightContext) -> float:
    """Normalized Google distance over keyword contexts, as similarity
    1 - NGD clamped to [0, 1] (NGDSimilarityMeasure.java:22-64)."""
    kw_a = ctx.keyword_array(a)
    kw_b = ctx.keyword_array(b)
    overlap = len(kw_a & kw_b)
    if overlap == 0 or not kw_a or not kw_b:
        return 0.0
    n = ctx.kb.collection_size
    fa, fb = len(kw_a), len(kw_b)
    ngd = (math.log(max(fa, fb)) - math.log(overlap)) / (
        math.log(n) - math.log(min(fa, fb))
    )
    sim = 1.0 - ngd
    return max(0.0, sim)
