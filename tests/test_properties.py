"""Property-based tests (hypothesis) for the deterministic text and
scoring primitives — invariants that must hold for ALL inputs, not just
the golden fixtures: tokenizer offset consistency, markup-strip
round-trips, similarity-measure bounds/symmetry, rescale/normalize
algebra, and min-cover window validity."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from aida_spark.core.mincover import min_cover, min_cover_length
from aida_spark.core.scoring import normalize_to_sum, rescale
from aida_spark.core.text import (
    conflate,
    parse_markup,
    tokenize,
    trigram_similarity,
)

TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:!?'()-[]",
    max_size=200,
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_consistent(text):
    toks = tokenize(text)
    for t in toks:
        assert text[t.begin : t.end] == t.text
    # indices are 0..n-1 in order, spans non-overlapping and sorted
    assert [t.index for t in toks] == list(range(len(toks)))
    for a, b in zip(toks, toks[1:]):
        assert a.end <= b.begin


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_parse_markup_spans_point_at_inner_text(text):
    clean, spans = parse_markup(text)
    assert len(clean) <= len(text)
    for begin, end in spans:
        assert 0 <= begin <= end <= len(clean)
        # the marked span's text must appear verbatim in the original
        assert clean[begin:end] in text


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_parse_markup_wellformed_roundtrip(text):
    if "]" in text or "[" in text or not text:
        return  # brackets inside the markup are ambiguous by design
    clean, spans = parse_markup(f"before [[{text}]] after")
    assert clean == f"before {text} after"
    assert spans and clean[spans[0][0] : spans[0][1]] == text


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_conflate_idempotent(s):
    assert conflate(conflate(s)) == conflate(s)


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_trigram_similarity_symmetric_bounded(a, b):
    s = trigram_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == trigram_similarity(b, a)
    assert trigram_similarity(a, a) == 1.0


@given(
    st.dictionaries(
        st.text(max_size=5),
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_normalize_to_sum_sums_to_one(scores):
    out = normalize_to_sum(dict(scores))
    total = sum(scores.values())
    if total == 0:
        assert out == scores
    else:
        assert abs(sum(out.values()) - 1.0) < 1e-9


@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_rescale_bounded(value, lo_raw, hi_raw):
    lo, hi = min(lo_raw, hi_raw), max(lo_raw, hi_raw)
    out = rescale(value, lo, hi)
    if lo == hi:
        assert out == hi
    else:
        assert 0.0 <= out <= 1.0 or out in (lo, hi)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=6),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_min_cover_windows_contain_one_position_per_list(position_lists):
    mc = min_cover(position_lists)
    assert mc.length >= 1
    assert len(mc.start_positions) == len(mc.end_positions) >= 1
    for lo, hi in zip(mc.start_positions, mc.end_positions):
        assert hi - lo + 1 == mc.length
        for positions in position_lists:
            assert any(lo <= p <= hi for p in positions), (
                mc,
                position_lists,
            )


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=6),
        min_size=0,
        max_size=6,
    )
)
@settings(max_examples=300, deadline=None)
def test_min_cover_length_matches_full_min_cover(position_lists):
    # the scoring hot path uses the list-free variant; it must agree with
    # the full window computation on every input, including empty input
    assert min_cover_length(position_lists) == min_cover(position_lists).length
