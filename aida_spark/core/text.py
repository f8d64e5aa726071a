"""Deterministic text preparation: normalization, tokenization, manual
markup parsing, case conflation and dictionary-based mention spotting.

Replaces the reference's Stanford-CoreNLP tokenizer + NER
(``mpi/tokenizer/data/Tokenizer.java``, ``preparation/mentionrecognition/*``)
with a deterministic regex tokenizer and dictionary max-match spotting, so
results are reproducible without JVM NLP models. The manual ``[[...]]``
markup path mirrors ``ManualFilter.java:24-61``; the hybrid merge (manual
wins on overlap) mirrors ``HybridFilter.java``; the case-conflation rule
mirrors ``AidaManager.conflateToken`` (AidaManager.java:279-285).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

__all__ = [
    "conflate",
    "trigrams",
    "trigram_similarity",
    "Token",
    "SpottedMention",
    "tokenize",
    "parse_markup",
    "spot_mentions",
]

# word runs (incl. digits/underscore/apostrophe) or single non-space symbols
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+(?:'[A-Za-z0-9_]+)*|[^\sA-Za-z0-9_]")
_MARKUP_RE = re.compile(r"\[\[(.+?)\]\]")


def conflate(token: str) -> str:
    """Uppercase tokens of length >= 4 (AidaManager.conflateToken).

    Critical invariant for dictionary-lookup parity: the entity dictionary
    stores mentions of length >= 4 UPPERCASED (reference README.md:401).
    """
    if len(token) >= 4:
        return token.upper()
    return token


@dataclass(slots=True)
class Token:
    index: int
    text: str
    begin: int  # char offset in the (markup-stripped) text
    end: int    # exclusive


@dataclass(slots=True)
class SpottedMention:
    surface: str
    start_token: int
    end_token: int  # inclusive, like the reference's Mention.endToken
    char_offset: int
    char_length: int
    manual: bool = False
    # filled by candidate lookup
    candidates: list = field(default_factory=list)


def tokenize(text: str) -> list[Token]:
    return [
        Token(i, m.group(0), m.start(), m.end())
        for i, m in enumerate(_TOKEN_RE.finditer(text))
    ]


def parse_markup(text: str) -> tuple[str, list[tuple[int, int]]]:
    """Strip ``[[...]]`` manual-mention markup.

    Returns (clean_text, manual_char_spans) where spans are (begin, end)
    character offsets of each marked mention in the clean text.
    """
    if "[[" not in text:
        # fast path: the markup regex requires a literal "[[", so a plain
        # substring test skips the regex scan for the overwhelmingly
        # common unmarked turn (identical result by construction)
        return text, []
    spans: list[tuple[int, int]] = []
    out: list[str] = []
    pos = 0
    clean_len = 0
    for m in _MARKUP_RE.finditer(text):
        out.append(text[pos : m.start()])
        clean_len += m.start() - pos
        inner = m.group(1)
        spans.append((clean_len, clean_len + len(inner)))
        out.append(inner)
        clean_len += len(inner)
        pos = m.end()
    out.append(text[pos:])
    return "".join(out), spans


def _align_span_to_tokens(
    tokens: list[Token], begin: int, end: int
) -> Optional[tuple[int, int]]:
    """Char span -> (start_token, end_token inclusive); two-pointer sweep
    like PreparedInput.setTokensPositions (PreparedInput.java:385-431)."""
    start = next((t.index for t in tokens if t.end > begin), None)
    stop = None
    for t in tokens:
        if t.begin < end:
            stop = t.index
        else:
            break
    if start is None or stop is None or stop < start:
        return None
    return start, stop


_FUNCTION_WORDS = {
    "the", "a", "an", "in", "on", "at", "of", "to", "and", "or", "but",
    "when", "while", "after", "before", "if", "then", "he", "she", "it",
    "they", "we", "his", "her", "its", "their", "this", "that", "these",
}


def first_words_upper(mention_keys) -> frozenset:
    """Uppercased first words of the dictionary keys — the prefilter set
    for :func:`spot_mentions`. Safe because ``conflate`` either leaves a
    surface unchanged or uppercases it wholesale, so upper(token) ==
    upper(first word of key) whenever any n-gram starting at the token can
    match the key."""
    return frozenset(k.split(" ", 1)[0].upper() for k in mention_keys)


def spot_mentions(
    tokens: list[Token],
    manual_spans: list[tuple[int, int]],
    mention_keys: set[str],
    max_len: int = 4,
    include_unknown_caps: bool = False,
    first_words: frozenset | None = None,
) -> list[SpottedMention]:
    """Hybrid mention detection.

    1. Manual ``[[...]]`` spans always become mentions (ManualFilter).
    2. Automatic: dictionary max-match over token n-grams (longest match
       wins, left to right) restricted to n-grams starting with an
       uppercase-initial token — a deterministic stand-in for the
       reference's Stanford-NER spotting (NamedEntityFilter.java:16-73)
       that behaves identically on the fixture corpora because the
       dictionary keys are proper names.
    3. Hybrid merge: manual wins on overlap (HybridFilter.java).

    ``mention_keys`` must contain *conflated* mention strings.
    """
    mentions: list[SpottedMention] = []
    covered: set[int] = set()
    # hoist the token texts once: the n-gram probe loop below re-reads
    # them constantly, and a plain list slice + join is C-speed
    texts = [t.text for t in tokens]

    for begin, end in manual_spans:
        span = _align_span_to_tokens(tokens, begin, end)
        if span is None:
            continue
        s, e = span
        surface = " ".join(texts[s : e + 1])
        mentions.append(
            SpottedMention(
                surface=surface,
                start_token=s,
                end_token=e,
                char_offset=tokens[s].begin,
                char_length=tokens[e].end - tokens[s].begin,
                manual=True,
            )
        )
        covered.update(range(s, e + 1))

    n = len(tokens)
    i = 0
    while i < n:
        if i in covered or not texts[i][:1].isupper():
            i += 1
            continue
        if first_words is not None and texts[i].upper() not in first_words:
            # no dictionary key starts with this word: skip the n-gram
            # probes entirely (the common case on real text — most
            # uppercase-initial tokens are not entity-name starts)
            i += 1
            continue
        match_end = -1
        for j in range(min(i + max_len, n) - 1, i - 1, -1):
            if not covered.isdisjoint(range(i, j + 1)):
                continue
            surface = " ".join(texts[i : j + 1])
            if conflate(surface) in mention_keys:
                match_end = j
                break
        if match_end >= 0:
            surface = " ".join(texts[i : match_end + 1])
            mentions.append(
                SpottedMention(
                    surface=surface,
                    start_token=i,
                    end_token=match_end,
                    char_offset=tokens[i].begin,
                    char_length=tokens[match_end].end - tokens[i].begin,
                    manual=False,
                )
            )
            covered.update(range(i, match_end + 1))
            i = match_end + 1
        else:
            i += 1

    if include_unknown_caps:
        # NER-style fallback (used with fuzzy lookup): maximal uncovered
        # runs of uppercase-initial tokens become mentions so misspelled /
        # out-of-dictionary names reach the fuzzy matcher. Single
        # function words ("When", sentence-initial) are skipped — the
        # analogue of the reference's sentence-initial filter
        # (NERManager.java:103-120).
        i = 0
        while i < n:
            if i in covered or not texts[i][:1].isupper():
                i += 1
                continue
            # sentence-initial function words ("When Pagee...") are not
            # part of a name run
            if texts[i].lower() in _FUNCTION_WORDS:
                i += 1
                continue
            j = i
            while (
                j + 1 < n
                and j + 1 not in covered
                and texts[j + 1][:1].isupper()
                and j + 1 - i < max_len
            ):
                j += 1
            surface = " ".join(texts[i : j + 1])
            if not (j == i and texts[i].lower() in _FUNCTION_WORDS):
                mentions.append(
                    SpottedMention(
                        surface=surface,
                        start_token=i,
                        end_token=j,
                        char_offset=tokens[i].begin,
                        char_length=tokens[j].end - tokens[i].begin,
                    )
                )
                covered.update(range(i, j + 1))
            i = j + 1

    mentions.sort(key=lambda m: (m.char_offset, -m.char_length))
    return mentions


def trigrams(s: str) -> set[str]:
    """Padded lowercase character trigrams (pg_trgm-style: two leading and
    one trailing space)."""
    padded = "  " + s.lower() + " "
    return {padded[i : i + 3] for i in range(max(len(padded) - 2, 1))}


def trigram_similarity(a: str, b: str) -> float:
    """Trigram-set Jaccard, the pg_trgm similarity() measure
    (used by the fuzzy lookup fallback, DataAccessSQL.java:182-184)."""
    ta, tb = trigrams(a), trigrams(b)
    union = ta | tb
    return len(ta & tb) / len(union) if union else 0.0
