"""End-to-end Spark pipeline tests: golden triples, triple-level P/R
against the (golden-parity-verified) core solver as oracle, chunking
reconciliation, and plan-shape assertions (broadcast join, no Python in
the candidate join path).
"""

import pandas as pd
import pytest

from aida_spark.core.disambiguate import (
    DisambiguationConfig,
    disambiguate_document,
)
from aida_spark.core.kb import OOKBE
from aida_spark.fixtures import (
    build_kb,
    golden_transcript,
    kb_tables,
    synth_transcripts,
)
from aida_spark.pipeline import AidaPipeline, PipelineConfig


@pytest.fixture(scope="module")
def pipeline(spark):
    return AidaPipeline(spark, kb_tables(), PipelineConfig())


def _core_triples(transcripts: pd.DataFrame) -> set[tuple[str, str, str]]:
    """Reference triples computed by the pure-Python core (which is itself
    pinned to the AIDA JUnit goldens in test_core_golden.py)."""
    from aida_spark.pipeline import _build_conversation_doc
    from aida_spark.core.disambiguate import Document

    kb = build_kb()
    cfg = DisambiguationConfig()
    triples = set()
    for conv_id, grp in transcripts.groupby("conv_id"):
        tokens, mentions, mention_turn = _build_conversation_doc(
            grp, set(kb.dictionary.keys())
        )
        doc = Document(
            doc_id=str(conv_id),
            tokens=tokens,
            token_ids=[kb.word_id(t) for t in tokens],
            mentions=mentions,
        )
        for r, turn in zip(disambiguate_document(doc, kb, cfg), mention_turn):
            if r.entity != OOKBE:
                triples.add(
                    (f"{conv_id}/{turn}/{r.mention.char_offset}", "linksTo", r.entity)
                )
    return triples


def test_golden_sentence_triples(spark, pipeline):
    out = pipeline.run(spark.createDataFrame(golden_transcript()))
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert rows == {
        ("t1/0/5", "linksTo", "Jimmy_Page"),
        ("t1/0/17", "linksTo", "Kashmir_(song)"),
        ("t1/0/28", "linksTo", "Knebworth_Festival"),
    }


def test_triple_precision_recall_vs_core(spark, pipeline):
    """The north-rule gate: Spark pipeline triples match the reference
    solver's triples with P/R >= 0.95 (here: exact equality expected,
    since both run the same deterministic math)."""
    corpus = synth_transcripts(30, 6, seed=11, hot_key_skew=0.2)
    expected = _core_triples(corpus)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipeline.run(spark.createDataFrame(corpus)).collect()
    }
    assert expected, "oracle produced no triples — corpus generator broken"
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected)
    assert precision >= 0.95, f"precision {precision} ({len(got)} vs {len(expected)})"
    assert recall >= 0.95, f"recall {recall}"
    # determinism both ways at this scale
    assert got == expected


def test_turn_text_roundtrip(spark):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after a Spark round-trip."""
    corpus = synth_transcripts(5, 4, seed=3)
    df = spark.createDataFrame(corpus)
    back = (
        df.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    orig = corpus.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(back["text"]) == list(orig["text"])


def test_chunked_conversation_reconciles(spark):
    """P9/O3: chunking long conversations must not lose mentions."""
    cfg = PipelineConfig(max_turns_per_chunk=2)
    p = AidaPipeline(spark, kb_tables(), cfg)
    corpus = synth_transcripts(4, 8, seed=5)
    got = p.run(spark.createDataFrame(corpus)).count()
    p_unchunked = AidaPipeline(spark, kb_tables(), PipelineConfig())
    expected = p_unchunked.run(spark.createDataFrame(corpus)).count()
    # chunk boundaries can flip individual coherence decisions, but the
    # mention set (triple count) must be stable
    assert got == expected


def test_default_chunking_on_and_transparent_for_short_convs(spark):
    """r4: chunking (P9) defaults ON with a measured bound. Conversations
    at or under the bound must be bit-identical to an explicitly
    unchunked run (the golden-parity suite runs at the default, so this
    pins the transparency the suite relies on)."""
    assert PipelineConfig().max_turns_per_chunk == 256
    corpus = synth_transcripts(6, 8, seed=11)
    df = spark.createDataFrame(corpus)
    default_out = sorted(
        tuple(r)
        for r in AidaPipeline(spark, kb_tables(), PipelineConfig())
        .run(df)
        .collect()
    )
    unchunked_out = sorted(
        tuple(r)
        for r in AidaPipeline(
            spark, kb_tables(), PipelineConfig(max_turns_per_chunk=0)
        )
        .run(df)
        .collect()
    )
    assert default_out == unchunked_out and default_out


def test_chunked_assignments_have_unique_subjects(spark):
    """A mega-conversation (8x the default bound) must complete at the
    default config with every triple subject unique — triples() relies
    on this to skip the dedup shuffle (spotting's covered set + disjoint
    chunk windows + non-duplicating O3 reconciliation)."""
    corpus = synth_transcripts(1, 2048, seed=13)
    out = AidaPipeline(spark, kb_tables(), PipelineConfig()).run(
        spark.createDataFrame(corpus)
    )
    subjects = [r["subj"] for r in out.collect()]
    assert subjects and len(subjects) == len(set(subjects))


def test_ship_spans_bit_identical_to_respotting(spark):
    """The ship_spans experiment path (stage A ships per-occurrence
    spans through the cogroup; stage D tokenizes but does not re-spot)
    must be BIT-identical to the default re-spotting path — including
    manual [[...]] markup, chunked conversations (300 turns > the 256
    default bound) and mention-order-dependent tie breaks."""
    corpus = pd.concat(
        [golden_transcript(), synth_transcripts(2, 300, seed=23)]
    )
    df = spark.createDataFrame(corpus)
    base = sorted(
        tuple(r)
        for r in AidaPipeline(spark, kb_tables(), PipelineConfig())
        .run(df)
        .collect()
    )
    shipped = sorted(
        tuple(r)
        for r in AidaPipeline(
            spark, kb_tables(), PipelineConfig(ship_spans=True)
        )
        .run(df)
        .collect()
    )
    assert shipped == base and base


def test_candidate_join_is_broadcast(spark, pipeline):
    keys = pipeline.spot_mention_keys(
        spark.createDataFrame(golden_transcript())
    )
    plan = pipeline.candidates(keys)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_emit_ookbe_includes_nil(spark):
    p = AidaPipeline(spark, kb_tables(), PipelineConfig(emit_ookbe=True))
    out = p.run(spark.createDataFrame(golden_transcript()))
    objs = {r["obj"] for r in out.collect()}
    assert OOKBE in objs  # Les Paul


def test_fuzzy_candidate_fallback(spark):
    """C5: misspelled names reach candidates via trigram fuzzy matching."""
    import datetime as dt

    p = AidaPipeline(spark, kb_tables(), PipelineConfig(fuzzy_min_sim=0.4))
    rows = [
        (
            "c1", 0, "user",
            "When Pagee played Kashmirr at Knebworth.", "",
            dt.datetime(2026, 1, 1),
        )
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    )
    objs = {r["mention"]: r["obj"] for r in p.run(df).collect()}
    assert objs.get("Kashmirr") == "Kashmir_(song)"
    assert objs.get("Pagee") in {"Jimmy_Page", "Larry_Page"}


def test_fuzzy_core_matches_spark(spark):
    from aida_spark.core.disambiguate import prepare

    kb = build_kb()
    doc = prepare(
        "t", "When Pagee played Kashmirr at Knebworth.", kb,
        include_unknown_caps=True,
    )
    res = disambiguate_document(
        doc, kb, DisambiguationConfig(fuzzy_min_sim=0.4)
    )
    core = {r.mention.surface: r.entity for r in res if r.entity != OOKBE}
    assert core == {
        "Pagee": "Jimmy_Page",
        "Kashmirr": "Kashmir_(song)",
        "Knebworth": "Knebworth_Festival",
    }


def test_salted_shuffle_join_matches_broadcast(spark):
    """Skew hardening: salted shuffle join must produce identical triples
    to the broadcast join on a hot-key-skewed corpus."""
    corpus = synth_transcripts(20, 6, seed=17, hot_key_skew=0.95)
    df = spark.createDataFrame(corpus)
    p_bc = AidaPipeline(spark, kb_tables(), PipelineConfig())
    p_salt = AidaPipeline(
        spark,
        kb_tables(),
        PipelineConfig(broadcast_dictionary=False, mention_key_salt=8),
    )
    a = sorted(map(tuple, p_bc.run(df).select("subj", "obj").collect()))
    b = sorted(map(tuple, p_salt.run(df).select("subj", "obj").collect()))
    assert a == b and len(a) > 0


def test_prior_only_catalyst_path_matches_udf_path(spark):
    """The Catalyst-native PRIOR fast path must agree with the Python
    solver running technique='prior'."""
    from aida_spark.core.disambiguate import DisambiguationConfig

    corpus = synth_transcripts(15, 5, seed=29, hot_key_skew=0.3)
    df = spark.createDataFrame(corpus)
    p = AidaPipeline(spark, kb_tables(), PipelineConfig())
    fast = p.triples(p.prior_only_assignments(df))
    p_udf = AidaPipeline(
        spark,
        kb_tables(),
        PipelineConfig(disambiguation=DisambiguationConfig(technique="prior")),
    )
    slow = p_udf.run(df)
    a = sorted(map(tuple, fast.select("subj", "obj").collect()))
    b = sorted(map(tuple, slow.select("subj", "obj").collect()))
    assert a == b and len(a) > 0


def test_fuzzy_lsh_method_matches_trigram(spark):
    """C6: the MinHash-LSH fuzzy prefilter finds the same matches as the
    exact trigram index on the fixture (recall may differ on larger
    dictionaries; precision is exact after the verify step)."""
    import datetime as dt

    rows = [
        (
            "c1", 0, "user",
            "When Pagee played Kashmirr at Knebworth.", "",
            dt.datetime(2026, 1, 1),
        )
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    )
    results = {}
    for method in ("trigram", "lsh"):
        p = AidaPipeline(
            spark,
            kb_tables(),
            PipelineConfig(fuzzy_min_sim=0.4, fuzzy_method=method),
        )
        results[method] = sorted(
            (r["mention"], r["obj"]) for r in p.run(df).collect()
        )
    assert results["trigram"] == results["lsh"]
    assert ("Pagee", "Jimmy_Page") in results["lsh"]


def test_plan_properties(spark):
    """Plan-shape regression gates: pruned scans, pushed filters,
    rank-limited window, broadcast joins."""
    import __spark_entry__ as e
    from aida_spark.plans.inspect import assert_plan, scan_columns

    # use sf0.01: other test modules persist() sf0.001 tables, and the
    # CacheManager then swaps FileScan for InMemoryTableScan in these plans
    sf = "/root/testdata/sf0.01"
    # token count reads only (doc_id, text)
    cols = scan_columns(e.queries()["doc_token_count"](spark, sf))
    assert cols and set(cols[0]) == {"doc_id", "text"}
    # top-k pushes the rank limit below the shuffle
    assert_plan(
        e.queries()["topk_orders_per_customer"](spark, sf),
        contains=("WindowGroupLimit",),
        max_scan_columns=3,
    )
    # knn broadcasts the query side
    assert_plan(
        e.queries()["knn_bruteforce"](spark, sf),
        contains=("BroadcastNestedLoopJoin",),
    )


def test_triples_sink_roundtrip(spark, pipeline, tmp_path):
    from aida_spark.sinks import read_triples, write_triples

    triples = pipeline.run(spark.createDataFrame(golden_transcript()))
    write_triples(triples, str(tmp_path / "kg"), n_buckets=8)
    back = read_triples(spark, str(tmp_path / "kg"))
    assert sorted(map(tuple, back.select("subj", "obj").collect())) == sorted(
        map(tuple, triples.select("subj", "obj").collect())
    )
    manifest = spark.read.parquet(str(tmp_path / "kg" / "manifest"))
    assert manifest.agg({"rows": "sum"}).first()[0] == triples.count()


def test_cross_turn_context_changes_disambiguation(spark, pipeline):
    """The conversation IS the document: context in a later turn must
    influence the disambiguation of a mention in an earlier turn."""
    import datetime as dt

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("solo", 0, "user", "Kashmir.", "", ts),
        ("ctx", 0, "user", "Kashmir.", "", ts),
        ("ctx", 1, "assistant", "Led Zeppelin played with Robert Plant.", "", ts),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    )
    out = {r["subj"]: r["obj"] for r in pipeline.run(df).collect()}
    assert out["solo/0/0"] == "Kashmir"          # prior-dominant alone
    assert out["ctx/0/0"] == "Kashmir_(song)"    # flipped by turn-1 context


def test_input_row_order_invariance(spark, pipeline):
    """input_hint invariant: results depend on (conv_id, turn_idx), never
    on the physical row order of the input."""
    corpus = synth_transcripts(10, 6, seed=37)
    shuffled = corpus.sample(frac=1.0, random_state=99).reset_index(drop=True)
    a = sorted(
        map(tuple, pipeline.run(spark.createDataFrame(corpus))
            .select("subj", "obj").collect())
    )
    b = sorted(
        map(tuple, pipeline.run(spark.createDataFrame(shuffled))
            .select("subj", "obj").collect())
    )
    assert a == b and len(a) > 0


def test_generated_universe_core_spark_equality(spark):
    """Payload-assembly stress: on a generated 200-entity / 120-name
    universe (multi-token keyphrases, up-to-4-way ambiguity), the Spark
    pipeline must produce exactly the core solver's triples."""
    from aida_spark.core.disambiguate import Document
    from aida_spark.fixtures import synth_universe, synth_universe_transcripts
    from aida_spark.pipeline import _build_conversation_doc

    kb = synth_universe()
    corpus = synth_universe_transcripts(kb, 40, turns_per_conv=5, seed=3)

    cfg = DisambiguationConfig()
    expected = set()
    keys = set(kb.dictionary.keys())
    for conv_id, grp in corpus.groupby("conv_id"):
        tokens, mentions, mention_turn = _build_conversation_doc(grp, keys)
        doc = Document(
            doc_id=str(conv_id),
            tokens=tokens,
            token_ids=[kb.word_id(t) for t in tokens],
            mentions=mentions,
        )
        for r, turn in zip(disambiguate_document(doc, kb, cfg), mention_turn):
            if r.entity != OOKBE:
                expected.add(
                    (f"{conv_id}/{turn}/{r.mention.char_offset}", r.entity)
                )

    pipe = AidaPipeline(spark, kb_tables(kb), PipelineConfig())
    got = {
        (r["subj"], r["obj"])
        for r in pipe.run(spark.createDataFrame(corpus)).collect()
    }
    assert len(expected) > 100
    assert got == expected


def test_all_features_enabled_together(spark, tmp_path):
    """Feature-interaction gate: fuzzy lookup + chunking + shuffle join
    with salting + checkpointing enabled simultaneously must still produce
    the golden triples and resume cleanly."""
    from aida_spark.lineage import BucketCheckpoint

    cfg = PipelineConfig(
        fuzzy_min_sim=0.4,
        max_turns_per_chunk=2,
        broadcast_dictionary=False,
        mention_key_salt=4,
        solve_buckets=32,
    )
    p = AidaPipeline(spark, kb_tables(), cfg)
    corpus = pd.concat(
        [golden_transcript(), synth_transcripts(6, 5, seed=41)]
    )
    df = spark.createDataFrame(corpus)
    ck = BucketCheckpoint(spark, str(tmp_path / "ck"), n_buckets=8)
    first = {
        (r["subj"], r["obj"]) for r in p.run(df, checkpoint=ck).collect()
    }
    assert ("t1/0/5", "Jimmy_Page") in first
    assert ("t1/0/17", "Kashmir_(song)") in first
    # resume: identical output
    second = {
        (r["subj"], r["obj"]) for r in p.run(df, checkpoint=ck).collect()
    }
    assert first == second


def test_init_is_driver_memory_free_with_large_dictionary(spark):
    """The KB word/mention lookup structures must never be collected
    through the driver at init (VERDICT r1 #4): with a 1M-name synthetic
    dictionary, AidaPipeline.__init__ must complete with DataFrame.collect
    forbidden, and the golden conversation must still solve correctly
    (the big dictionary only adds never-spotted surface forms)."""
    from pyspark.sql import DataFrame, functions as F

    tables = kb_tables()
    big_names = spark.range(1_000_000).select(
        F.concat(F.lit("ZZSYNTH"), F.col("id").cast("string")).alias("mention"),
        F.concat(F.lit("Zz_Entity_"), F.col("id").cast("string")).alias("entity"),
        F.lit(0.5).alias("prior"),
    )
    from aida_spark.kb_spark import load_kb_tables

    kb = load_kb_tables(spark, tables)
    kb["dictionary"] = kb["dictionary"].unionByName(big_names)
    kb["known_names"] = kb["known_names"].unionByName(
        big_names.select("mention")
    )

    real_collect = DataFrame.collect

    def forbidden(self, *a, **k):
        raise AssertionError("driver-side collect during pipeline init")

    DataFrame.collect = forbidden
    try:
        pipe = AidaPipeline(spark, kb, PipelineConfig())
    finally:
        DataFrame.collect = real_collect

    got = {
        (r["subj"], r["obj"])
        for r in pipe.run(spark.createDataFrame(golden_transcript())).collect()
    }
    assert got == {
        ("t1/0/5", "Jimmy_Page"),
        ("t1/0/17", "Kashmir_(song)"),
        ("t1/0/28", "Knebworth_Festival"),
    }


def test_switched_unit_similarity_through_pipeline(spark):
    """M4 unit-LM family end-to-end in the distributed path: the payload
    now ships raw unit counts (kp_count/kp_df/kw_df/e_count), so the
    solver can run the SwitchedUnit ensemble inside applyInPandas. The
    prior-dominant SwitchedUnit weights pick Larry_Page for 'Page'
    (matching the core-path golden in TestM4UnitLM)."""
    from aida_spark.core.disambiguate import DisambiguationConfig

    cfg = PipelineConfig(
        disambiguation=DisambiguationConfig(local_similarity="switched_unit")
    )
    pipe = AidaPipeline(spark, kb_tables(), cfg)
    got = {
        (r["subj"], r["obj"])
        for r in pipe.run(spark.createDataFrame(golden_transcript())).collect()
    }
    assert got == {
        ("t1/0/5", "Larry_Page"),
        ("t1/0/17", "Kashmir_(song)"),
        ("t1/0/28", "Knebworth_Festival"),
    }


def test_round2_features_interact_cleanly(spark, tmp_path):
    """Round-2 feature-interaction gate: SwitchedUnit unit-LM similarity +
    G1 early-fix heuristics + chunking + bucket checkpoint, enabled
    together, must produce a deterministic result that resumes identically
    — and the golden conversation's coherence link (Kashmir -> the song)
    must survive the combination."""
    from aida_spark.core.disambiguate import DisambiguationConfig
    from aida_spark.lineage import BucketCheckpoint

    cfg = PipelineConfig(
        max_turns_per_chunk=2,
        disambiguation=DisambiguationConfig(
            local_similarity="switched_unit",
            use_confidence_threshold_fix=True,
            confidence_fix_threshold=0.95,
            use_easy_mentions_fix=True,
            easy_mentions_max_candidates=2,
        ),
    )
    p = AidaPipeline(spark, kb_tables(), cfg)
    corpus = pd.concat(
        [golden_transcript(), synth_transcripts(8, 5, seed=17)]
    )
    df = spark.createDataFrame(corpus)
    ck = BucketCheckpoint(spark, str(tmp_path / "r2ck"), n_buckets=8)
    first = {
        (r["subj"], r["obj"]) for r in p.run(df, checkpoint=ck).collect()
    }
    assert ("t1/0/17", "Kashmir_(song)") in first
    second = {
        (r["subj"], r["obj"]) for r in p.run(df, checkpoint=ck).collect()
    }
    assert first == second


def test_fast_pruning_default_diverges_and_full_matches_core(spark):
    """The pipeline DEFAULT is the reference's *Fast* preset (keyphrase
    weight floor 0.002 + top-1000 cap) — a deliberate divergence from the
    reference's unpruned default preset, documented at PipelineConfig.
    Pin all three facts that makes load-bearing:

    1. Full settings (0.0/None) reproduce the unpruned core single-node
       scores exactly (reference-default parity path exists).
    2. On the fixture KB every keyphrase clears the 0.002 floor, so the
       golden tests are valid under the Fast default (default == Full
       here) — the reason the divergence is invisible in the goldens.
    3. A floor that actually bites changes the scores (the pruning knob
       is real, not dead config).
    """
    from aida_spark.core.disambiguate import prepare
    from aida_spark.fixtures import GOLDEN_SENTENCE

    golden = golden_transcript()

    def pipeline_scores(cfg: PipelineConfig) -> dict[str, tuple[str, float]]:
        out = AidaPipeline(spark, kb_tables(), cfg).run(
            spark.createDataFrame(golden)
        ).collect()
        return {r["mention"]: (r["obj"], r["score"]) for r in out}

    kb = build_kb()
    doc = prepare("t1/0", GOLDEN_SENTENCE, kb)
    core = {
        r.mention.surface: (r.entity, r.score)
        for r in disambiguate_document(doc, kb, DisambiguationConfig())
        if r.entity != OOKBE
    }

    full = pipeline_scores(
        PipelineConfig(min_keyphrase_weight=0.0, max_keyphrases_per_entity=None)
    )
    assert set(full) == set(core)
    for m in core:
        assert full[m][0] == core[m][0], m
        assert abs(full[m][1] - core[m][1]) < 1e-8, (m, full[m], core[m])

    default = pipeline_scores(PipelineConfig())
    assert default == full  # fixture keyphrases all clear the 0.002 floor

    # fixture NPMI weights span [0.61, 1.12]: a 0.8 floor (and a top-1
    # cap) genuinely prunes keyphrases here, so the knobs must move the
    # scores — the divergence the Fast preset trades for its ~5x speedup
    pruned = pipeline_scores(
        PipelineConfig(min_keyphrase_weight=0.8, max_keyphrases_per_entity=1)
    )
    assert set(pruned) == set(full)  # same mentions spotted
    assert any(
        abs(pruned[m][1] - full[m][1]) > 1e-6 for m in full
    ), (pruned, full)


def test_pipeline_close_releases_resources(spark):
    """close() unpersists the bundle table and clears local artifact
    temp dirs (addFile already copied them, so closing one pipeline
    never breaks another's loaded artifacts)."""
    pipe = AidaPipeline(spark, kb_tables(), PipelineConfig())
    assert pipe._bundles.storageLevel.useMemory
    pipe.close()
    assert not pipe._bundles.storageLevel.useMemory


def test_bucket_shared_entity_tables_do_not_leak_across_conversations(spark):
    """r3 payload design: all conversations in a solve bucket share one
    read-only entity-table slice. Solving two conversations with
    DIFFERENT entity sets in the SAME bucket (solve_buckets=1) must give
    exactly the triples each produces when solved alone — the shared
    tables must not let one conversation's entities influence another's
    scores or candidates."""
    import datetime as dt

    rows_a = [("ca", 0, "user",
               "When [[Page]] played Kashmir at Knebworth.", "",
               dt.datetime(2026, 1, 1))]
    rows_b = [("cb", 0, "user",
               "Les Paul guitars are famous.", "",
               dt.datetime(2026, 1, 1))]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def triples(rows, buckets):
        p = AidaPipeline(
            spark, kb_tables(), PipelineConfig(solve_buckets=buckets)
        )
        df = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
        return {
            (r["subj"], r["obj"], round(r["score"], 10))
            for r in p.run(df).collect()
        }

    together = triples(rows_a + rows_b, buckets=1)
    alone = triples(rows_a, buckets=1) | triples(rows_b, buckets=1)
    assert together == alone


def test_kg_materialize_views(spark, pipeline):
    """Graph-materialize step: co-occurrence edges and entity stats over
    the pipeline's triples match a pure-python recomputation on a
    deterministic multi-conversation corpus."""
    from collections import defaultdict
    from aida_spark.operators.kgviews import (
        entity_cooccurrence,
        entity_mention_stats,
    )

    corpus = synth_transcripts(12, 6, seed=21)
    triples = pipeline.run(spark.createDataFrame(corpus)).persist()
    rows = [
        (r["subj"].split("/", 1)[0], r["obj"], r["mention"])
        for r in triples.collect()
    ]

    conv_ents = defaultdict(set)
    for conv, ent, _m in rows:
        conv_ents[conv].add(ent)
    exp_edges = defaultdict(int)
    for ents in conv_ents.values():
        es = sorted(ents)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                exp_edges[(es[i], es[j])] += 1
    got_edges = {
        (r["entity_a"], r["entity_b"]): r["n_convs"]
        for r in entity_cooccurrence(triples).collect()
    }
    assert got_edges == dict(exp_edges) and got_edges

    exp_stats = defaultdict(lambda: [0, set(), set()])
    for conv, ent, m in rows:
        s = exp_stats[ent]
        s[0] += 1
        s[1].add(conv)
        s[2].add(m)
    got_stats = {
        r["entity"]: (r["n_mentions"], r["n_convs"], r["n_surfaces"])
        for r in entity_mention_stats(triples).collect()
    }
    assert got_stats == {
        e: (n, len(cs), len(ms)) for e, (n, cs, ms) in exp_stats.items()
    }
    triples.unpersist()


def test_incremental_kg_views_rebuild_only_dirty_bucket(spark, tmp_path):
    """Editing ONE conversation and re-running the incremental views must
    (a) produce bit-identical results to a full batch recompute, while
    (b) rebuilding only the dirty lineage bucket's partial (exactly one
    changed input_hash; the clean buckets' partition files on disk are
    untouched)."""
    import os

    from aida_spark.lineage import BucketCheckpoint
    from aida_spark.operators.kgviews import (
        entity_cooccurrence,
        entity_mention_stats,
        incremental_entity_cooccurrence,
        incremental_entity_mention_stats,
    )

    def triples_df(changed: bool):
        rows = []
        for c in range(30):
            ents = [f"e{c % 7}", f"e{(c + 3) % 7}", f"e{(c + 5) % 7}"]
            if changed and c == 13:
                ents = ["e_new", "e0"]
            for t, e in enumerate(ents):
                rows.append(
                    (f"conv{c:03d}/{t}/0", "linksTo", e, f"m_{e}", 1.0)
                )
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, mention string, score double",
        )

    ckpt = BucketCheckpoint(
        spark, str(tmp_path / "views"), n_buckets=16, key_col="conv"
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    v1 = triples_df(False)
    assert canon(incremental_entity_cooccurrence(ckpt, v1)) == canon(
        entity_cooccurrence(v1)
    )
    assert canon(incremental_entity_mention_stats(ckpt, v1)) == canon(
        entity_mention_stats(v1)
    )
    lineage1 = {
        r["_bucket"]: r["input_hash"]
        for r in ckpt.lineage("kgview_cooc").collect()
    }
    data_dir = str(tmp_path / "views" / "kgview_cooc" / "data")
    mtimes1 = {
        d: os.path.getmtime(os.path.join(data_dir, d))
        for d in os.listdir(data_dir)
        if d.startswith("_bucket=")
    }

    v2 = triples_df(True)
    assert canon(incremental_entity_cooccurrence(ckpt, v2)) == canon(
        entity_cooccurrence(v2)
    )
    assert canon(incremental_entity_mention_stats(ckpt, v2)) == canon(
        entity_mention_stats(v2)
    )
    lineage2 = {
        r["_bucket"]: r["input_hash"]
        for r in ckpt.lineage("kgview_cooc").collect()
    }
    changed_buckets = [b for b in lineage1 if lineage1[b] != lineage2.get(b)]
    assert len(changed_buckets) == 1  # only conv013's bucket
    mtimes2 = {
        d: os.path.getmtime(os.path.join(data_dir, d))
        for d in os.listdir(data_dir)
        if d.startswith("_bucket=")
    }
    untouched = [
        d
        for d in mtimes1
        if d != f"_bucket={changed_buckets[0]}" and d in mtimes2
    ]
    assert untouched and all(mtimes1[d] == mtimes2[d] for d in untouched)


def test_html_debug_sink_annotates_and_escapes(spark, tmp_path):
    """S7 HTML sink: per-conversation page with mentions hyperlinked to
    their entities (HtmlGenerator.java analogue), OOKBE highlighted, and
    raw text HTML-escaped; write_html_debug round-trips through a
    conv_id-partitioned text layout."""
    import glob

    from aida_spark.sinks import html_report, write_html_debug

    p = AidaPipeline(spark, kb_tables(), PipelineConfig(emit_ookbe=True))
    corpus = golden_transcript()
    # append a turn with an HTML-special character to pin escaping
    corpus = pd.concat(
        [
            corpus,
            pd.DataFrame(
                [("t1", 1, "user", "Kashmir > all other songs & riffs.",
                  "", corpus["ts"].iloc[0])],
                columns=corpus.columns,
            ),
        ]
    )
    tr = spark.createDataFrame(corpus)
    assignments = p.solve(tr, p.candidates(p.spot_mention_keys(tr)))
    pages = {r["conv_id"]: r["html"] for r in html_report(tr, assignments).collect()}
    page = pages["t1"]
    assert "<a class='ent' href='https://en.wikipedia.org/wiki/Jimmy_Page'>Page</a>" in page
    assert "<span class='ookbe'>Les Paul</span>" in page
    assert "&gt; all other songs &amp; riffs." in page  # escaped
    assert "<h1>t1</h1>" in page

    out = str(tmp_path / "html")
    write_html_debug(tr, assignments, out)
    files = glob.glob(f"{out}/conv_id=t1/part-*")
    assert files and "Jimmy_Page" in open(files[0]).read()


def test_entity_cooccurrence_cap_bounds_megaconversation(spark):
    """A 5k-distinct-entity conversation (the VERDICT r3 'what's wrong
    #2' scenario) must complete with BOUNDED edge output: the per-conv
    cap keeps the top-N entities by mention count (deterministic tie
    break by name), so edge fan-out is at most N(N-1)/2 per conversation
    and other conversations are untouched."""
    import pytest as _pytest

    from aida_spark.operators.kgviews import entity_cooccurrence

    rows = []
    # 5 hot entities (3 mentions each) named to sort lexicographically
    # LAST — if they survive the cap, selection is by count, not name
    for j in range(5):
        for r in range(3):
            rows.append((f"big/{j}/{r}", "linksTo", f"zhot{j}", "m", 1.0))
    for i in range(4995):
        rows.append((f"big/{100+i}/0", "linksTo", f"e{i:04d}", "m", 1.0))
    # an uncapped small conversation rides along unchanged
    rows.append(("small/0/0", "linksTo", "x1", "m", 1.0))
    rows.append(("small/1/0", "linksTo", "x2", "m", 1.0))
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, mention string, score double"
    )

    edges = entity_cooccurrence(df, max_entities_per_conv=100).collect()
    small = [(e["entity_a"], e["entity_b"]) for e in edges if e["entity_a"] == "x1"]
    assert small == [("x1", "x2")]
    big = [e for e in edges if e["entity_a"] != "x1"]
    assert len(big) == 100 * 99 // 2  # bounded, not 5000*4999/2
    kept = {e["entity_a"] for e in big} | {e["entity_b"] for e in big}
    assert kept == {f"zhot{j}" for j in range(5)} | {
        f"e{i:04d}" for i in range(95)
    }

    with _pytest.warns(UserWarning, match="1 conversation"):
        entity_cooccurrence(
            df, max_entities_per_conv=100, log_dropped=True
        ).collect()

    # cap off: the quadratic fan-out is the caller's explicit choice
    from pyspark.sql import functions as SF

    uncapped = entity_cooccurrence(
        df.filter(SF.col("subj").startswith("small")),
        max_entities_per_conv=None,
    ).collect()
    assert len(uncapped) == 1
