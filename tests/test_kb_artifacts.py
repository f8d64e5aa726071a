"""Compact executor-side KB artifacts: hash-array membership, hash maps,
exact int maps, node-local mmap sharing, and the publish round-trip.

These structures bound per-worker dictionary memory at YAGO scale
(>10M surface forms): 8-16 bytes/key of int64 mmap instead of multi-GB
Python sets/dicts — the Spark analogue of the reference's mmapped DMaps
(access/DataAccessDMap.java, README.md:462-526)."""

import os
from collections import ChainMap

import numpy as np
import pytest


@pytest.fixture(scope="module")
def published(spark):
    from pyspark.sql import functions as F
    from aida_spark.kb_artifacts import (
        publish_hash_map,
        publish_hash_set,
        publish_table,
    )

    # dictionary mentions >= 4 chars are stored UPPERCASED (conflated),
    # matching the reference's storage rule (README.md:401)
    names = spark.createDataFrame(
        [("JIMMY PAGE",), ("KASHMIR",), ("LES PAUL",), ("KNEBWORTH",)],
        "mention string",
    )
    words = spark.createDataFrame(
        [("page", 3), ("kashmir", 7), ("song", 11)], "word string, id int"
    )
    exp = spark.createDataFrame(
        [(3, 103), (7, 107)], "word int, expansion int"
    )
    return {
        "keys": publish_hash_set(spark, names, "mention"),
        "fw": publish_hash_set(spark, names, "mention", first_word=True),
        "words": publish_hash_map(spark, words, "word", "id"),
        "exp": publish_table(
            spark,
            exp.select(
                F.col("word").cast("long").alias("word"),
                F.col("expansion").cast("long").alias("expansion"),
            ),
            n_parts=4,
        ),
    }


def test_hash_set_membership(published):
    from aida_spark.kb_artifacts import load_hash_set

    s = load_hash_set(published["keys"])
    assert len(s) == 4
    assert "JIMMY PAGE" in s
    assert "KASHMIR" in s
    assert "Kashmir" not in s  # case-sensitive, like the frozenset was
    assert "PAGE" not in s
    assert "" not in s


def test_first_word_set_matches_python_rule(published):
    from aida_spark.kb_artifacts import load_hash_set

    fw = load_hash_set(published["fw"])
    # k.split(" ", 1)[0].upper() for each key
    for w in ("JIMMY", "KASHMIR", "LES", "KNEBWORTH"):
        assert w in fw, w
    assert "PAGE" not in fw
    assert "PAUL" not in fw  # second word, not a first word


def test_first_word_hash_non_ascii_locale_parity(spark):
    """Publish-time first-word hashing must share Python's Unicode case
    mapping with the probe side (core.text.first_words_upper) — the
    historical JVM F.upper path could diverge under non-default locales
    ('i'->'İ' on a Turkish-locale JVM) or multi-char mappings ('ß'->'SS'),
    and a publish/probe mismatch is a silent spotting false negative."""
    from aida_spark.core.text import first_words_upper
    from aida_spark.kb_artifacts import load_hash_set, publish_hash_set

    names = [
        "istanbul city",          # dotted-i: Turkish-locale JVM upper -> İ
        "ßora festival",          # Python 'ß'.upper() == 'SS'
        "münchen hbf",            # ü -> Ü
        "ǳungle book",            # U+01F3 ǳ -> U+01F1 Ǳ (titlecase trap)
        "ﬁord tour",              # ligature ﬁ -> FI (multi-char)
    ]
    df = spark.createDataFrame([(n,) for n in names], "mention string")
    art = publish_hash_set(spark, df, "mention", first_word=True)
    fw = load_hash_set(art)
    for w in first_words_upper(names):
        assert w in fw, w
    assert len(fw) == len(first_words_upper(names))


def test_hash_map_get(published):
    from aida_spark.kb_artifacts import load_hash_map

    m = load_hash_map(published["words"])
    assert m.get("page") == 3
    assert m.get("kashmir") == 7
    assert m.get("missing") is None
    assert m.get("missing", 0) == 0
    assert "song" in m and "verse" not in m
    assert len(m) == 3


def test_int_map_exact_and_chainmap_overlay(published):
    from aida_spark.kb_artifacts import load_int_int_map

    m = load_int_int_map(published["exp"], "word", "expansion")
    assert m[3] == 103 and m.get(7) == 107
    assert m.get(99) is None
    with pytest.raises(KeyError):
        m[99]
    assert dict(m) == {3: 103, 7: 107}  # full Mapping protocol
    # the solver overlays per-conversation expansions without copying
    overlay = ChainMap({99: 199}, m)
    assert overlay.get(99) == 199
    assert overlay.get(3) == 103
    assert overlay.get(42, 0) == 0


def test_memory_is_8_bytes_per_key_and_mmap_shared(published):
    """The loaded set must be a bare int64 array (8 B/key) backed by a
    node-local .npy mmap — the bytes live once per node, not per worker."""
    from pyspark import SparkFiles
    from aida_spark.kb_artifacts import _CACHE, load_hash_set

    _CACHE.clear()  # force a fresh load through the node cache
    s = load_hash_set(published["keys"])
    arr = s._arr
    assert arr.dtype == np.int64 and arr.nbytes == 8 * len(s)
    assert isinstance(arr, np.memmap) and not arr.flags.writeable
    art = published["keys"]
    first = art if isinstance(art, str) else art[0]
    assert os.path.exists(SparkFiles.get(first) + ".hset.npy")


def test_spot_mentions_accepts_hash_set(published):
    """spot_mentions only probes membership, so the compact set drops in
    for the frozenset — same spans on the golden sentence."""
    from aida_spark.core.text import spot_mentions, tokenize, parse_markup
    from aida_spark.kb_artifacts import load_hash_set

    text = "When [[Page]] played Kashmir at Knebworth, his Les Paul sang."
    clean, manual = parse_markup(text)
    toks = tokenize(clean)
    keys = load_hash_set(published["keys"])
    fw = load_hash_set(published["fw"])
    got = {
        m.surface
        for m in spot_mentions(toks, manual, keys, first_words=fw)
    }
    # Kashmir (exact key), Les Paul (2-gram key), Page (manual);
    # Knebworth only matches its UPPERCASE dictionary form via conflate
    assert got == {"Page", "Kashmir", "Les Paul", "Knebworth"}


def test_publish_multi_part_roundtrip(spark):
    """publish_table with n_parts>1 distributes the write and the loaders
    merge all parts."""
    from pyspark.sql import functions as F
    from aida_spark.kb_artifacts import load_int_int_map, publish_table

    df = spark.range(10_000).select(
        F.col("id").alias("word"), (F.col("id") * 2).alias("expansion")
    ).repartition(8)
    art = publish_table(spark, df, n_parts=8)
    assert isinstance(art, tuple) and len(art) > 1
    m = load_int_int_map(art, "word", "expansion")
    assert len(m) == 10_000
    assert m[1234] == 2468
    assert m.get(10_001) is None
