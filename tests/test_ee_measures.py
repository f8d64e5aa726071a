"""Golden tests for the extended EE measure family (KORE etc.)."""

import pytest

from aida_spark.core.ee_measures import (
    EEWeightContext,
    jaccard_similarity,
    keyword_cosine_similarity,
    kore_similarity,
    ngd_similarity,
    weighted_jaccard_similarity,
)
from aida_spark.fixtures import build_kb


@pytest.fixture(scope="module")
def ctx():
    # KORETest.java:44-49: kpAlpha=1.0, kwAlpha=0.0, normalized weights
    return EEWeightContext(
        build_kb(), keyword_alpha=0.0, keyphrase_alpha=1.0, normalize=True
    )


class TestKore:
    def test_goldens(self, ctx):
        sim_ab = kore_similarity("Kashmir_(song)", "Jimmy_Page", ctx)
        sim_ac = kore_similarity("Kashmir_(song)", "Larry_Page", ctx)
        sim_bd = kore_similarity("Jimmy_Page", "Knebworth_Festival", ctx)
        sim_cd = kore_similarity("Larry_Page", "Knebworth_Festival", ctx)
        sim_ad = kore_similarity("Kashmir_(song)", "Knebworth_Festival", ctx)
        assert sim_ab > sim_ac
        assert sim_ad < sim_ab
        assert sim_bd > sim_cd
        assert sim_ab == pytest.approx(0.2091, abs=1e-4)
        assert sim_bd == pytest.approx(0.1125, abs=1e-4)
        assert sim_ad == pytest.approx(0.1613, abs=1e-4)
        assert sim_cd == pytest.approx(0.0, abs=1e-3)


class TestOtherMeasures:
    def test_cosine_orders_like_kore(self, ctx):
        ab = keyword_cosine_similarity("Kashmir_(song)", "Jimmy_Page", ctx)
        cd = keyword_cosine_similarity("Larry_Page", "Knebworth_Festival", ctx)
        assert 0.0 <= ab <= 1.0
        assert ab > cd == 0.0
        # symmetry
        ba = keyword_cosine_similarity("Jimmy_Page", "Kashmir_(song)", ctx)
        assert ab == pytest.approx(ba, abs=1e-12)

    def test_jaccard_variants(self, ctx):
        j = jaccard_similarity("Kashmir_(song)", "Jimmy_Page", ctx)
        wj = weighted_jaccard_similarity("Kashmir_(song)", "Jimmy_Page", ctx)
        assert 0.0 < j < 1.0
        assert 0.0 < wj < 1.0
        assert jaccard_similarity("Larry_Page", "Knebworth_Festival", ctx) == 0.0

    def test_ngd(self, ctx):
        s = ngd_similarity("Kashmir_(song)", "Jimmy_Page", ctx)
        assert 0.0 <= s <= 1.0
        assert ngd_similarity("Larry_Page", "Knebworth_Festival", ctx) == 0.0


class TestK7Averaging:
    def test_averaged_weights_keep_ordering(self):
        ctx = EEWeightContext(build_kb(), average_weights=True)
        ab = kore_similarity("Kashmir_(song)", "Jimmy_Page", ctx)
        cd = kore_similarity("Larry_Page", "Knebworth_Festival", ctx)
        assert ab > cd == 0.0


class TestM7Importance:
    def test_importance_term_adds_to_similarity(self):
        from aida_spark.core.disambiguate import (
            DisambiguationConfig,
            disambiguate_document,
            prepare,
        )
        from aida_spark.core.scoring import EnsembleWeights
        from aida_spark.fixtures import GOLDEN_SENTENCE

        kb = build_kb()
        base = DisambiguationConfig()
        with_imp = DisambiguationConfig(
            weights=EnsembleWeights(
                importance_weight=0.1, importance_source="entity_rank"
            )
        )
        doc1 = prepare("t", GOLDEN_SENTENCE, kb)
        doc2 = prepare("t", GOLDEN_SENTENCE, kb)
        r1 = {m.mention.surface: m.entity
              for m in disambiguate_document(doc1, kb, base)}
        r2 = {m.mention.surface: m.entity
              for m in disambiguate_document(doc2, kb, with_imp)}
        # small importance weight must not flip the golden mapping
        assert r1 == r2
