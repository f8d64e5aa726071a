"""P12: noun-phrase keyphrase extraction — the reference's
``mpi/keyphraseextraction/KeyphraseExtractor.java`` re-expressed for
Spark. The reference applies a POS tagger, then matches heuristic
regular expressions over the SPACE-JOINED TAG STRING and maps match
offsets back to word positions (KeyphraseExtractor.java:120-250); the
pattern families are ported here verbatim-in-structure:

- proper-noun runs            (``nounPhrase``,   KeyphraseExtractor.java:37)
- "University of X"           (``nounPhraseIN``, :41 — phrase must contain 'of', :227)
- adjective + proper noun     (``nounPhraseJJ2``, :44 — JJ word must be capitalized, :185)
- determiner + proper noun    (``nounPhraseDT``, :48 — title-style "A Journey")
- technical terminology       (``nounPhraseTT``, :51 — Justeson & Katz 1995)

The reference's tagger is Stanford NLP, which is not available in this
environment, so the TAGGER is a documented deterministic heuristic
(suffix/lexicon/capitalization rules — ``heuristic_pos_tags``) behind
the same tag-string interface; swap in a real tagger's tags and the
pattern machinery is unchanged. Date patterns (:54-60) are ported as a
filter (dates are not keyphrases). This is the same stub-the-model /
keep-the-plumbing approach as the multimodal decoder.

Scale shape: one narrow ``mapInPandas`` pass (tag + match per document,
no shuffle); the output explodes to (doc, phrase) rows for downstream
aggregation (e.g. phrase document frequency = one hash-agg).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "heuristic_pos_tags",
    "extract_noun_phrases",
    "extract_keyphrases",
]

_DT = {"a", "an", "the"}
_IN = {"of", "in", "on", "at", "for", "with", "from", "by", "to"}
_JJ_SUFFIXES = (
    "al", "ous", "ive", "ic", "ful", "less", "able", "ible", "ish", "ary",
)
_MONTHS = {
    "jan", "january", "feb", "february", "febr", "mar", "march", "apr",
    "april", "may", "jun", "june", "jul", "july", "aug", "august", "sep",
    "september", "sept", "oct", "october", "nov", "november", "dec",
    "december",
}

_WORD_RE = re.compile(r"\S+")


def heuristic_pos_tags(words: list[str]) -> list[str]:
    """Deterministic rule-based tagger over the reference's tag
    vocabulary (NNP/NNPS/NN/NNS/JJ/DT/IN/CD/SYM). Ordered rules; no
    context. A real tagger drops in by replacing this function — the
    phrase patterns consume only the tag strings."""
    tags = []
    for w in words:
        lw = w.lower()
        if re.fullmatch(r"\d+([.,]\d+)*", w):
            tags.append("CD")
        elif lw in _DT:
            tags.append("DT")
        elif lw in _IN:
            tags.append("IN")
        elif not w[:1].isalpha():
            tags.append("SYM")
        elif w[:1].isupper():
            if lw in _MONTHS:
                tags.append("NNP")  # months are proper; date filter below
            elif len(w) > 3 and lw.endswith("s"):
                tags.append("NNPS")
            else:
                tags.append("NNP")
        elif lw.endswith(_JJ_SUFFIXES):
            tags.append("JJ")
        elif lw.endswith("ed") and len(lw) > 3:
            tags.append("VBD")  # breaks noun runs like a real tagger would
        elif lw.endswith("ing") and len(lw) > 4:
            tags.append("VBG")
        elif lw.endswith("s") and len(lw) > 3:
            tags.append("NNS")
        else:
            tags.append("NN")
    return tags


# pattern families over the space-joined tag string — each tag occupies
# its own space-delimited slot, exactly like WordSequence.TagtoString()
_P_PROPER = re.compile(
    r"(NNP\s){1,}(NNPS\s){0,}(NNS\s){0,}(NN\s){0,}(NNP\s){0,}(NNPS\s){0,}(NNS\s){0,}"
)
_P_PROPER_IN = re.compile(r"(NNP\s){1,}(IN\s){1}(NNP\s){1,}")
_P_ADJ_PROPER = re.compile(r"(JJ\s){1}(NNP\s){1,}")
_P_DT_PROPER = re.compile(r"(DT\s){1}(NNP\s){1,}")
_NOUN_UNIT = r"(JJ\s|NNS\s|NN\s)"
_P_TECH = re.compile(
    rf"({_NOUN_UNIT}+|({_NOUN_UNIT}*((NNS\s|NN\s)IN\s)?){_NOUN_UNIT}+)(NNS\s|NN\s)"
)

_FAMILIES = (
    ("proper", _P_PROPER),
    ("proper_of", _P_PROPER_IN),
    ("adj_proper", _P_ADJ_PROPER),
    ("dt_proper", _P_DT_PROPER),
    ("technical", _P_TECH),
)


def _is_date(words: list[str]) -> bool:
    """Date-shaped phrases are excluded (the reference's month/day/year
    regexes, KeyphraseExtractor.java:54-60)."""
    return all(
        w.lower() in _MONTHS or re.fullmatch(r"\d{1,4}", w) or w == ","
        for w in words
    )


def extract_noun_phrases(
    words: list[str], tags: list[str] | None = None
) -> list[tuple[str, int, int, str]]:
    """(phrase, start_word, n_words, family) for every pattern match.
    Matching runs over the space-joined tag string with char->word
    offset mapping (the reference's TagStringPosToSequencePos). Family
    guards ported: 'proper_of' must actually contain 'of'
    (:227), 'adj_proper' requires the adjective capitalized (:185),
    'dt_proper' requires the word after DT capitalized. Duplicate
    (start, n_words) spans keep the first family that found them."""
    if tags is None:
        tags = heuristic_pos_tags(words)
    tag_str = " ".join(tags) + " "
    # char offset of each tag slot -> word index
    pos2word = {}
    off = 0
    for i, t in enumerate(tags):
        pos2word[off] = i
        off += len(t) + 1
    seen: set[tuple[int, int]] = set()
    out: list[tuple[str, int, int, str]] = []
    for family, pat in _FAMILIES:
        for m in pat.finditer(tag_str):
            start_w = pos2word.get(m.start())
            if start_w is None:
                continue
            n = len(m.group(0).split())
            phrase_words = words[start_w : start_w + n]
            if family == "proper_of" and "of" not in [
                w.lower() for w in phrase_words
            ]:
                continue
            if family == "adj_proper" and not phrase_words[0][:1].isupper():
                continue
            if family == "dt_proper" and not (
                len(phrase_words) > 1 and phrase_words[1][:1].isupper()
            ):
                continue
            if family in ("proper", "technical") and n < 1:
                continue
            if _is_date(phrase_words):
                continue
            key = (start_w, n)
            if key in seen:
                continue
            seen.add(key)
            out.append((" ".join(phrase_words), start_w, n, family))
    out.sort(key=lambda x: (x[1], -x[2], x[3]))
    return out


KEYPHRASE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("phrase", StringType()),
        StructField("start_word", IntegerType()),
        StructField("n_words", IntegerType()),
        StructField("family", StringType()),
    ]
)


def extract_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tags_col: str | None = None,
) -> DataFrame:
    """(doc_id, phrase, start_word, n_words, family) — one narrow
    Arrow-batched pass, no shuffle; aggregate downstream as needed.

    ``tags_col`` (optional) names an ``array<string>`` column of
    per-word POS tags — one tag per whitespace word of ``text_col`` —
    which then drive the pattern matching instead of the built-in
    heuristic tagger. This is the swap-in path for a real tagger's
    output (the reference uses Stanford NLP,
    KeyphraseExtractor.java:120-135): tag upstream with any model, ship
    the tags as a column, and the ported pattern machinery is
    unchanged. A row whose tag count differs from its word count
    raises (silently misaligned tags would corrupt phrase offsets)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            tag_iter = (
                pdf[tags_col] if tags_col is not None else (None,) * len(pdf)
            )
            for doc_id, text, tags in zip(pdf[id_col], pdf[text_col], tag_iter):
                words = _WORD_RE.findall(text or "")
                if tags is not None:
                    tags = list(tags)
                    if len(tags) != len(words):
                        raise ValueError(
                            f"{tags_col!r}: {len(tags)} tags for "
                            f"{len(words)} words in doc {doc_id!r}"
                        )
                for phrase, start, n, family in extract_noun_phrases(
                    words, tags
                ):
                    rows.append((str(doc_id), phrase, start, n, family))
            yield pd.DataFrame(
                rows, columns=[f.name for f in KEYPHRASE_SCHEMA.fields]
            )

    cols = [F.col(id_col).cast("string").alias(id_col), F.col(text_col)]
    if tags_col is not None:
        cols.append(F.col(tags_col))
    return df.select(*cols).mapInPandas(run, KEYPHRASE_SCHEMA)
