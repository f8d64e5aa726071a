"""Tests for chunk reconciliation (O3) and person-name merging (O4)."""

from aida_spark.core.graph import MentionResult
from aida_spark.core.reconcile import merge_person_names, reconcile_chunks
from aida_spark.core.text import SpottedMention


def _mr(surface, entity, score, offset=0):
    m = SpottedMention(surface, 0, 0, offset, len(surface))
    return MentionResult(m, entity, score)


def test_reconcile_sums_scores_across_chunks():
    chunk1 = [_mr("Page", "Jimmy_Page", 0.6), _mr("Kashmir", "Kashmir", 0.3)]
    chunk2 = [_mr("Page", "Larry_Page", 0.2), _mr("Page", "Jimmy_Page", 0.1)]
    out = reconcile_chunks([chunk1, chunk2])
    # Jimmy_Page aggregated 0.7 beats Larry_Page 0.2 -> all Page mentions
    # flip to Jimmy_Page
    page_entities = {r.entity for r in out if r.mention.surface == "Page"}
    assert page_entities == {"Jimmy_Page"}
    assert all(
        abs(r.score - 0.7) < 1e-12 for r in out if r.mention.surface == "Page"
    )


def test_reconcile_single_chunk_passthrough():
    chunk = [_mr("Page", "Jimmy_Page", 0.6)]
    assert reconcile_chunks([chunk]) == chunk


def test_person_merge_inherits_from_longest():
    results = [
        _mr("Giuseppe Verdi", "Giuseppe_Verdi", 0.9, offset=0),
        _mr("Verdi", "Verdi_(town)", 0.4, offset=40),
    ]
    out = merge_person_names(results)
    assert out[1].entity == "Giuseppe_Verdi"
    assert out[0].entity == "Giuseppe_Verdi"


def test_person_merge_no_subset_no_change():
    results = [
        _mr("Giuseppe Verdi", "Giuseppe_Verdi", 0.9),
        _mr("Richard Wagner", "Richard_Wagner", 0.8),
    ]
    out = merge_person_names(results)
    assert [r.entity for r in out] == ["Giuseppe_Verdi", "Richard_Wagner"]
