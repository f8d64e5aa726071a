"""CoNLL-YAGO-style collection TSV source/sink (S3/S9).

Format (reader `data/PreparedInput.java:183-304`, writer `:316-383`):

    -DOCSTART- (<docId>)\t<YYYY-MM-DD>     # header (date optional)
    <token>                                 # plain token line
    <token>\tB|I\t<mention>\t<entity|--NME-->[\t<NER>[\t<count>]]
    <empty line>                            # sentence boundary

Ground-truth NIL is ``--NME--``. The reader yields per-document token /
mention / ground-truth structures; ``to_transcripts`` turns documents
into the pipeline's transcript contract (one sentence per turn, stable
turn_idx), and ``ground_truth_table`` gives the expected-output side for
triple-level P/R scoring.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass, field

import pandas as pd

__all__ = [
    "ConllDocument",
    "parse_collection",
    "write_collection",
    "to_transcripts",
    "ground_truth_table",
]

NME = "--NME--"
_DOC_RE = re.compile(r"-DOCSTART- \((.*?)\)")


@dataclass
class ConllMention:
    surface: str
    entity: str          # --NME-- for NIL
    start_token: int     # document-level token index
    end_token: int       # inclusive
    sentence: int
    ner: str = ""


@dataclass
class ConllDocument:
    doc_id: str
    tokens: list[str] = field(default_factory=list)
    sentence_ids: list[int] = field(default_factory=list)
    mentions: list[ConllMention] = field(default_factory=list)
    date: str = ""


def parse_collection(text: str) -> list[ConllDocument]:
    docs: list[ConllDocument] = []
    doc: ConllDocument | None = None
    sentence = 0
    open_mention: ConllMention | None = None

    def close_mention():
        nonlocal open_mention
        if open_mention is not None and doc is not None:
            doc.mentions.append(open_mention)
            open_mention = None

    for line in text.splitlines():
        if line.startswith("-DOCSTART-"):
            close_mention()
            parts = line.split("\t")
            m = _DOC_RE.search(parts[0])
            doc = ConllDocument(
                doc_id=m.group(1) if m else parts[0],
                date=parts[1] if len(parts) > 1 else "",
            )
            docs.append(doc)
            sentence = 0
            continue
        if doc is None:
            continue
        if line == "":
            sentence += 1
            close_mention()
            continue
        data = line.split("\t")
        pos = len(doc.tokens)
        doc.tokens.append(data[0])
        doc.sentence_ids.append(sentence)
        if len(data) >= 4:
            if data[1] == "B":
                close_mention()
                open_mention = ConllMention(
                    surface=data[2],
                    entity=data[3],
                    start_token=pos,
                    end_token=pos,
                    sentence=sentence,
                    ner=data[4] if len(data) >= 5 else "",
                )
            elif data[1] == "I" and open_mention is not None:
                open_mention.end_token = pos
        else:
            close_mention()
    close_mention()
    return docs


def write_collection(docs: list[ConllDocument]) -> str:
    """Round-trips parse_collection output back to the TSV format."""
    lines: list[str] = []
    for doc in docs:
        header = f"-DOCSTART- ({doc.doc_id})"
        if doc.date:
            header += f"\t{doc.date}"
        lines.append(header)
        by_token: dict[int, tuple[str, ConllMention]] = {}
        for m in doc.mentions:
            for t in range(m.start_token, m.end_token + 1):
                by_token[t] = ("B" if t == m.start_token else "I", m)
        prev_sentence = 0
        for i, tok in enumerate(doc.tokens):
            s = doc.sentence_ids[i]
            if s != prev_sentence:
                lines.extend([""] * (s - prev_sentence))
                prev_sentence = s
            if i in by_token:
                bi, m = by_token[i]
                row = [tok, bi, m.surface, m.entity]
                if m.ner:
                    row.append(m.ner)
                lines.append("\t".join(row))
            else:
                lines.append(tok)
        lines.append("")
    return "\n".join(lines)


def to_transcripts(docs: list[ConllDocument]) -> pd.DataFrame:
    """Documents -> transcript contract: conv_id = doc_id, one sentence per
    turn (stable turn_idx = sentence id), tokens joined by single spaces
    with manual [[...]] markup around ground-truth mention spans (so the
    pipeline's spotting matches the annotation exactly)."""
    rows = []
    for doc in docs:
        starts = {m.start_token: m for m in doc.mentions}
        ends = {m.end_token for m in doc.mentions}
        sentences: dict[int, list[str]] = {}
        for i, tok in enumerate(doc.tokens):
            piece = tok
            if i in starts:
                piece = "[[" + piece
            if i in ends:
                piece = piece + "]]"
            sentences.setdefault(doc.sentence_ids[i], []).append(piece)
        base_ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
        for s_id in sorted(sentences):
            rows.append(
                (
                    doc.doc_id,
                    s_id,
                    "user",
                    " ".join(sentences[s_id]),
                    "",
                    base_ts + _dt.timedelta(seconds=s_id),
                )
            )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def ground_truth_table(docs: list[ConllDocument]) -> pd.DataFrame:
    """(conv_id, turn_idx, mention, entity) gold rows (NME kept as NME)."""
    rows = []
    for doc in docs:
        for m in doc.mentions:
            rows.append((doc.doc_id, m.sentence, m.surface, m.entity))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "mention", "entity"])
