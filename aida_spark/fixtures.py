"""Deterministic test fixtures: the 7-entity universe of the reference's
in-memory test backend (``src/mpi/aida/access/DataAccessForTesting.java``)
plus synthetic transcript corpora per the input contract
(conv_id, turn_idx, role, text, tool, ts).

Everything is generated from counts by the same formulas the reference
uses (NPMI for keyphrases, 4-cell MI for keywords, IDF = log2(N // df)) so
the scoring pipeline is exercised end-to-end, never from stored magic
constants (FIXTURES.md §5).
"""

from __future__ import annotations

import datetime as _dt
import random

import pandas as pd

from .core.kb import KBData

COLLECTION_SIZE = 2_651_987  # DataAccessForTesting.java:43

# entity -> [(keyphrase, co-occurrence count), ...]  (:52-60)
ENTITY_KEYPHRASES: dict[str, list[tuple[str, int]]] = {
    "Larry_Page": [("Google", 2)],
    "Jimmy_Page": [
        ("played", 10),
        ("Les Paul", 4),
        ("tuned", 1),
        ("Led Zeppelin", 5),
        ("Robert Plant", 9),
        ("Rock music", 2),
    ],
    "Nomatching_Page": [("Page", 5)],
    "Stopword_Page": [("and the", 2)],
    "Kashmir": [("China", 10)],
    "Kashmir_(song)": [
        ("Jimmy Page", 5),
        ("festival", 2),
        ("Led Zeppelin", 3),
        ("Robert Plant", 5),
    ],
    "Knebworth_Festival": [("festival", 1), ("Rock music", 2)],
}

# entity superdoc sizes (:66-74)
ENTITY_SIZES = {
    "Larry_Page": 20,
    "Jimmy_Page": 10,
    "Nomatching_Page": 5,
    "Stopword_Page": 2,
    "Kashmir": 15,
    "Kashmir_(song)": 5,
    "Knebworth_Festival": 2,
}

# global quality order; rank = position / 7 (:76-78, 264-279)
ORDERED_ENTITIES = [
    "Larry_Page",
    "Jimmy_Page",
    "Nomatching_Page",
    "Stopword_Page",
    "Kashmir",
    "Kashmir_(song)",
    "Knebworth_Festival",
]

# keyphrase superdoc doc-frequencies (:84-96); keyword DF = DF of the *last*
# keyphrase containing the token, matching the reference's overwrite loop
# (DataAccessForTesting.getKeywordDocumentFrequencies:445-463)
KEYPHRASE_FREQUENCIES: list[tuple[str, int]] = [
    ("Google", 50),
    ("played", 100),
    ("Les Paul", 80),
    ("tuned", 20),
    ("China", 200),
    ("Jimmy Page", 30),
    ("festival", 10),
    ("Led Zeppelin", 40),
    ("Robert Plant", 25),
    ("Rock music", 30),
    ("and the", 5),
]

# entity inlinks (:98-105); targets are themselves registered entities
INLINKS: dict[str, list[str]] = {
    "Larry_Page": ["Google"],
    "Jimmy_Page": ["Led_Zeppelin", "Robert_Plant", "Rock", "Les_Paul"],
    "Kashmir": ["China", "India", "Pakistan"],
    "Kashmir_(song)": ["Led_Zeppelin", "Robert_Plant", "Jimmy_Page"],
    "Knebworth_Festival": ["England", "Music_Festival", "Led_Zeppelin"],
}

# mention dictionary, conflated keys (priors from :420-439); "LES PAUL" is a
# known name with no candidates (:250)
DICTIONARY: dict[str, list[tuple[str, float]]] = {
    "PAGE": [("Jimmy_Page", 0.3), ("Larry_Page", 0.7)],
    "KASHMIR": [("Kashmir", 0.9), ("Kashmir_(song)", 0.1)],
    "KNEBWORTH": [("Knebworth_Festival", 1.0)],
    "LES PAUL": [],
}

# Compact English stopword list (fresh, standard closed-class words).  Only
# "and" / "the" matter for fixture parity (the only dictionary words that are
# stopwords); the rest improve scoring quality on generated corpora.
STOPWORDS = """a an and are as at be but by for from had has have he her his i
in into is it its me my no nor not of on or our she so that the their them
they this to was we were what when where which who will with you your
""".split()

SYMBOLS = list(".,;:!?()[]{}'\"`-–—/\\|@#$%^&*_+=<>~")

# entity -> types (fixture extension; the reference fixture has no type
# tables, so these are our own deterministic assignments for C8 tests)
ENTITY_TYPES: dict[str, tuple[str, ...]] = {
    "Larry_Page": ("person", "entrepreneur"),
    "Jimmy_Page": ("person", "musician"),
    "Nomatching_Page": ("person",),
    "Stopword_Page": ("person",),
    "Kashmir": ("location",),
    "Kashmir_(song)": ("work", "song"),
    "Knebworth_Festival": ("event",),
}

GOLDEN_SENTENCE = (
    "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
)

# expected linking for GOLDEN_SENTENCE under the GRAPH algorithm
# (test/mpi/aida/DisambiguatorTest.java:70-81)
GOLDEN_EXPECTED = {
    "Page": "Jimmy_Page",
    "Kashmir": "Kashmir_(song)",
    "Knebworth": "Knebworth_Festival",
    "Les Paul": "--OOKBE--",
}


def build_word_ids() -> tuple[dict[str, int], dict[int, int]]:
    """word -> id and id -> UPPERCASE-variant id, assigned in the insertion
    order of the reference fixture (keyphrase first, then its tokens, each
    immediately followed by its uppercase variant;
    DataAccessForTesting.java:184-224)."""
    word2id: dict[str, int] = {}
    expansions: dict[int, int] = {}
    next_id = [1]

    def add(word: str) -> None:
        if word in word2id:
            return
        wid = next_id[0]
        next_id[0] += 1
        word2id[word] = wid
        upper = word.upper()
        if upper in word2id:
            uid = word2id[upper]
        else:
            uid = next_id[0]
            next_id[0] += 1
            word2id[upper] = uid
        expansions[wid] = uid

    for kps in ENTITY_KEYPHRASES.values():
        for kp, _count in kps:
            add(kp)
            for tok in kp.split(" "):
                add(tok)
    return word2id, expansions


def build_entity_ids() -> dict[str, int]:
    entity2id: dict[str, int] = {"--OOKBE--": 1}
    nid = 2
    for e in ENTITY_KEYPHRASES:
        if e not in entity2id:
            entity2id[e] = nid
            nid += 1
    for targets in INLINKS.values():
        for t in targets:
            if t not in entity2id:
                entity2id[t] = nid
                nid += 1
    return entity2id


def build_kb() -> KBData:
    word2id, expansions = build_word_ids()
    entity2id = build_entity_ids()

    stopword_ids = {word2id.get(w, 0) for w in STOPWORDS}
    stopword_ids |= {word2id.get(s, 0) for s in SYMBOLS}

    entity_kps: dict[str, list[int]] = {}
    kp_tokens: dict[int, list[int]] = {}
    entity_kp_count: dict[tuple[str, int], int] = {}
    entity_kw_count: dict[tuple[str, int], int] = {}
    for entity, kps in ENTITY_KEYPHRASES.items():
        ids = []
        for kp, count in kps:
            kp_id = word2id[kp]
            ids.append(kp_id)
            toks = [word2id[t] for t in kp.split(" ")]
            kp_tokens[kp_id] = toks
            entity_kp_count[(entity, kp_id)] = count
            for t in toks:
                key = (entity, t)
                entity_kw_count[key] = entity_kw_count.get(key, 0) + count
        entity_kps[entity] = ids

    kp_counts: dict[int, int] = {}
    kw_counts: dict[int, int] = {}
    for kp, freq in KEYPHRASE_FREQUENCIES:
        kp_counts[word2id[kp]] = freq
        for tok in kp.split(" "):
            kw_counts[word2id[tok]] = freq  # later keyphrases overwrite

    n = len(ORDERED_ENTITIES)
    entity_rank = {e: i / n for i, e in enumerate(ORDERED_ENTITIES)}

    inlinks = {
        e: tuple(sorted(entity2id[t] for t in targets))
        for e, targets in INLINKS.items()
    }

    return KBData(
        collection_size=COLLECTION_SIZE,
        word2id=word2id,
        expansions=expansions,
        stopword_ids=stopword_ids,
        entity2id=entity2id,
        dictionary={k: list(v) for k, v in DICTIONARY.items()},
        entity_rank=entity_rank,
        entity_kps=entity_kps,
        kp_tokens=kp_tokens,
        kw_counts=kw_counts,
        kp_counts=kp_counts,
        entity_counts=dict(ENTITY_SIZES),
        entity_kp_count=entity_kp_count,
        entity_kw_count=entity_kw_count,
        inlinks=inlinks,
        entity_types=dict(ENTITY_TYPES),
    )


# ---------------------------------------------------------------------------
# Relational form (what the Spark pipeline reads/writes as Parquet tables)
# ---------------------------------------------------------------------------

def kb_tables(kb: KBData | None = None) -> dict[str, pd.DataFrame]:
    """The fixture universe as the pipeline's relational KB schema."""
    kb = kb or build_kb()
    dictionary = pd.DataFrame(
        [
            (m, e, p)
            for m, ents in kb.dictionary.items()
            for (e, p) in ents
        ],
        columns=["mention", "entity", "prior"],
    )
    known_names = pd.DataFrame({"mention": list(kb.dictionary.keys())})
    entity_ids = pd.DataFrame(
        sorted(kb.entity2id.items(), key=lambda kv: kv[1]),
        columns=["entity", "id"],
    )
    entity_rank = pd.DataFrame(
        sorted(kb.entity_rank.items()), columns=["entity", "rank"]
    )
    entity_keyphrases = pd.DataFrame(
        [(e, kp, c) for (e, kp), c in sorted(kb.entity_kp_count.items())],
        columns=["entity", "keyphrase", "count"],
    )
    keyphrase_tokens = pd.DataFrame(
        [(kp, t, i) for kp, toks in sorted(kb.kp_tokens.items())
         for i, t in enumerate(toks)],
        columns=["keyphrase", "token", "position"],
    )
    word_ids = pd.DataFrame(
        sorted(kb.word2id.items(), key=lambda kv: kv[1]), columns=["word", "id"]
    )
    word_expansion = pd.DataFrame(
        sorted(kb.expansions.items()), columns=["word", "expansion"]
    )
    keyword_counts = pd.DataFrame(
        sorted(kb.kw_counts.items()), columns=["keyword", "count"]
    )
    keyphrase_counts = pd.DataFrame(
        sorted(kb.kp_counts.items()), columns=["keyphrase", "count"]
    )
    entity_counts = pd.DataFrame(
        sorted(kb.entity_counts.items()), columns=["entity", "count"]
    )
    entity_inlinks = pd.DataFrame(
        [(e, list(v)) for e, v in sorted(kb.inlinks.items())],
        columns=["entity", "inlinks"],
    )
    stopwords = pd.DataFrame({"word": STOPWORDS + SYMBOLS})
    entity_types = pd.DataFrame(
        [(e, list(ts)) for e, ts in sorted(ENTITY_TYPES.items())],
        columns=["entity", "types"],
    )
    return {
        "dictionary": dictionary,
        "known_names": known_names,
        "entity_ids": entity_ids,
        "entity_rank": entity_rank,
        "entity_keyphrases": entity_keyphrases,
        "keyphrase_tokens": keyphrase_tokens,
        "word_ids": word_ids,
        "word_expansion": word_expansion,
        "keyword_counts": keyword_counts,
        "keyphrase_counts": keyphrase_counts,
        "entity_counts": entity_counts,
        "entity_inlinks": entity_inlinks,
        "entity_types": entity_types,
        "stopwords": stopwords,
    }


# ---------------------------------------------------------------------------
# Transcript corpora (input contract: conv_id, turn_idx, role, text, tool, ts)
# ---------------------------------------------------------------------------

_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

_FILLER = (
    "well let us consider the next item on the agenda and move along quickly "
    "because there is much more ground still left to cover today"
).split()

_TEMPLATES = [
    "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned.",
    "Page and Kashmir at Knebworth with the Les Paul.",
    "Kashmir was played at Knebworth by Page.",
    "The festival at Knebworth featured Page playing Kashmir.",
    "Page brought a Les Paul and played Kashmir at Knebworth.",
]


def golden_transcript() -> pd.DataFrame:
    """The reference's golden sentence as a single-turn conversation."""
    return pd.DataFrame(
        [("t1", 0, "user", GOLDEN_SENTENCE, "", _EPOCH)],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )


def synth_transcripts(
    n_conversations: int,
    turns_per_conv: int = 8,
    seed: int = 42,
    hot_key_skew: float = 0.0,
) -> pd.DataFrame:
    """Seeded synthetic multi-turn transcript corpus over the fixture
    universe. ``hot_key_skew`` in [0,1] biases mention choice toward "Page"
    to exercise hot-key salting.
    """
    rng = random.Random(seed)
    rows = []
    for c in range(n_conversations):
        conv_id = f"conv{c:07d}"
        for t in range(turns_per_conv):
            role = "user" if t % 2 == 0 else "assistant"
            if rng.random() < 0.6:
                base = rng.choice(_TEMPLATES)
            else:
                base = " ".join(
                    rng.choice(_FILLER) for _ in range(rng.randint(6, 18))
                ) + "."
            if hot_key_skew and rng.random() < hot_key_skew:
                base = "Page " + base
            ts = _EPOCH + _dt.timedelta(seconds=c * 1000 + t)
            rows.append((conv_id, t, role, base, "", ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def synth_conll_corpus(n_docs: int, seed: int = 42):
    """CoNLL-YAGO-style fixture corpus over the 7-entity universe
    (FIXTURES.md §4): documents built from the sentence templates, with
    mentions annotated and ground truth derived from the golden-parity
    core solver (which is pinned to the reference's JUnit outputs — see
    tests/test_core_golden.py). Returns (documents, gold_table)."""
    import random as _random

    from .core.disambiguate import DisambiguationConfig, prepare, disambiguate_document
    from .core.kb import OOKBE
    from .sources.conll import ConllDocument, ConllMention, NME, ground_truth_table

    kb = build_kb()
    cfg = DisambiguationConfig()
    rng = _random.Random(seed)
    docs = []
    for d in range(n_docs):
        doc_id = f"doc{d:05d}"
        n_sentences = rng.randint(2, 5)
        sentences = [rng.choice(_TEMPLATES) for _ in range(n_sentences)]
        text = " ".join(sentences)
        # solve the whole document with the verified core solver
        prepared = prepare(doc_id, text, kb)
        results = disambiguate_document(prepared, kb, cfg)
        # rebuild tokens/sentence ids from the markup-stripped text
        from .core.text import parse_markup, tokenize

        clean, _spans = parse_markup(text)
        tokens = tokenize(clean)
        sent_ids = []
        s = 0
        for t in tokens:
            sent_ids.append(s)
            if t.text in {".", "!", "?"}:
                s += 1
        doc = ConllDocument(
            doc_id=doc_id,
            tokens=[t.text for t in tokens],
            sentence_ids=sent_ids,
            date="2026-01-01",
        )
        for r in results:
            m = r.mention
            doc.mentions.append(
                ConllMention(
                    surface=m.surface,
                    entity=NME if r.entity == OOKBE else r.entity,
                    start_token=m.start_token,
                    end_token=m.end_token,
                    sentence=sent_ids[m.start_token],
                    ner="MISC",
                )
            )
        docs.append(doc)
    return docs, ground_truth_table(docs)


def synth_universe(
    n_entities: int = 200,
    n_mentions: int = 120,
    seed: int = 7,
    max_candidates: int = 4,
) -> KBData:
    """A larger generated entity universe with the same schema as the
    7-entity fixture (FIXTURES.md §4 "optionally a larger generated
    universe"): seeded, order-stable, ids via insertion order; keyphrase/
    keyword weights derived from counts by the same formulas."""
    rng = random.Random(seed)
    vocab = [f"word{i:04d}" for i in range(400)]
    entities = [f"Entity_{i:04d}" for i in range(n_entities)]

    word2id: dict[str, int] = {}
    expansions: dict[int, int] = {}
    next_id = [1]

    def add_word(w: str) -> int:
        if w in word2id:
            return word2id[w]
        wid = next_id[0]; next_id[0] += 1
        word2id[w] = wid
        upper = w.upper()
        if upper in word2id:
            uid = word2id[upper]
        else:
            uid = next_id[0]; next_id[0] += 1
            word2id[upper] = uid
        expansions[wid] = uid
        return wid

    entity_kps: dict[str, list[int]] = {}
    kp_tokens: dict[int, list[int]] = {}
    entity_kp_count: dict[tuple[str, int], int] = {}
    entity_kw_count: dict[tuple[str, int], int] = {}
    kp_counts: dict[int, int] = {}
    kw_counts: dict[int, int] = {}
    for e in entities:
        kps = []
        for _ in range(rng.randint(1, 5)):
            words = rng.sample(vocab, rng.randint(1, 3))
            phrase = " ".join(words)
            kp_id = add_word(phrase)
            if kp_id not in kp_tokens:
                kp_tokens[kp_id] = [add_word(w) for w in words]
                kp_counts[kp_id] = rng.randint(5, 300)
                for t in kp_tokens[kp_id]:
                    kw_counts[t] = rng.randint(5, 300)
            count = rng.randint(1, 12)
            if (e, kp_id) not in entity_kp_count:
                kps.append(kp_id)
                entity_kp_count[(e, kp_id)] = count
                for t in kp_tokens[kp_id]:
                    key = (e, t)
                    entity_kw_count[key] = entity_kw_count.get(key, 0) + count
        entity_kps[e] = kps

    dictionary: dict[str, list[tuple[str, float]]] = {}
    mention_names = [f"Name{i:04d}" for i in range(n_mentions)]
    for m in mention_names:
        cands = rng.sample(entities, rng.randint(1, max_candidates))
        raw = [rng.random() for _ in cands]
        total = sum(raw)
        dictionary[m.upper()] = [
            (e, round(r / total, 6)) for e, r in zip(sorted(cands), raw)
        ]

    entity2id = {e: i + 2 for i, e in enumerate(entities)}
    entity_rank = {e: i / len(entities) for i, e in enumerate(entities)}
    inlinks = {
        e: tuple(sorted(rng.sample(range(2, n_entities + 2), rng.randint(0, 8))))
        for e in entities
    }
    stopword_ids = {word2id.get(w, 0) for w in STOPWORDS} | {
        word2id.get(s, 0) for s in SYMBOLS
    }
    return KBData(
        collection_size=COLLECTION_SIZE,
        word2id=word2id,
        expansions=expansions,
        stopword_ids=stopword_ids,
        entity2id=entity2id,
        dictionary=dictionary,
        entity_rank=entity_rank,
        entity_kps=entity_kps,
        kp_tokens=kp_tokens,
        kw_counts=kw_counts,
        kp_counts=kp_counts,
        entity_counts={e: rng.randint(2, 40) for e in entities},
        entity_kp_count=entity_kp_count,
        entity_kw_count=entity_kw_count,
        inlinks=inlinks,
    )


def synth_universe_transcripts(
    kb: KBData, n_conversations: int, turns_per_conv: int = 6, seed: int = 8
) -> pd.DataFrame:
    """Transcripts over a generated universe: turns mix mention names and
    keyphrase words so candidates get non-trivial context scores."""
    rng = random.Random(seed)
    id2word = {v: k for k, v in kb.word2id.items()}
    names = [n.capitalize() for n in kb.dictionary]
    rows = []
    for c in range(n_conversations):
        conv_id = f"u{c:06d}"
        for t in range(turns_per_conv):
            parts = []
            for _ in range(rng.randint(1, 3)):
                parts.append(rng.choice(names))
                # pull context words from a random entity's keyphrases
                e = rng.choice(list(kb.entity_kps))
                for kp in kb.entity_kps[e][:2]:
                    for tok in kb.kp_tokens[kp]:
                        parts.append(id2word[tok])
            text = " ".join(parts) + "."
            ts = _EPOCH + _dt.timedelta(seconds=c * 100 + t)
            rows.append((conv_id, t, "user", text, "", ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
