"""Round-5 gates: the VERDICT r4 "Next round" items and ADVICE findings.

- repeated_spans: interval-merged per-doc mask (no O(tokens x starts)
  blowup on templated docs) with unchanged semantics;
- pagerank: dangling mass folded into the per-iteration plan — no
  driver collect per iteration, one materializing job per iteration;
- M7 count-based importance (CountBasedImportance.java);
- disambiguate_texts convenience API (the REST-path analogue);
- P12 caller-supplied POS tags end-to-end;
- incremental KG views assert key_col == 'conv';
- connected_components leaves no persisted labels behind on raise;
- streaming triple appends are idempotent per micro-batch.
"""

import pytest
from pyspark.sql import functions as F

from aida_spark.fixtures import (
    GOLDEN_EXPECTED,
    GOLDEN_SENTENCE,
    build_kb,
    kb_tables,
)


class TestRepeatedSpansScale:
    def test_interval_union_parity_on_adversarial_overlaps(self, spark):
        """Semantics unchanged by the interval-merge rewrite: staggered
        and nested overlapping repeated spans (multiple disjoint covered
        intervals, gaps at both ends) vs a pure-python reference."""
        from collections import Counter

        from aida_spark.operators.dedup import remove_repeated_spans

        n, min_count = 3, 2
        rows = [
            (1, "a b c d e f g h a b c x y z f g h i"),
            (2, "p q a b c d q p x f g h i y z"),
            (3, "m n o m n o m n o"),  # self-overlapping repeats
            (4, "one two three four five six seven"),
            (5, "a b c"),  # exactly n words, repeated elsewhere
        ]
        texts = {i: t.split() for i, t in rows}
        cnt = Counter(
            " ".join(ws[i : i + n])
            for ws in texts.values()
            for i in range(len(ws) - n + 1)
        )
        expected = {}
        for d, ws in texts.items():
            cut = set()
            for i in range(max(len(ws) - n + 1, 0)):
                if cnt[" ".join(ws[i : i + n])] >= min_count:
                    cut.update(range(i, i + n))
            keptw = [w for t, w in enumerate(ws) if t not in cut]
            expected[d] = (" ".join(keptw), len(ws), len(ws) - len(keptw))

        got = {
            r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed_tokens"])
            for r in remove_repeated_spans(
                spark.createDataFrame(rows, "doc_id long, text string"),
                n=n,
                min_count=min_count,
            ).collect()
        }
        assert got == expected

    def test_fully_templated_large_doc_completes(self, spark):
        """The r4 mask was O(tokens x repeated-starts) per doc — ~10^8
        comparisons for this 20k-token fully-templated doc. The interval
        union collapses it to one interval; must finish in seconds."""
        import time

        from aida_spark.operators.dedup import remove_repeated_spans

        boiler = ("lorem ipsum dolor sit amet " * 4).split()  # 20 words
        big = " ".join(boiler * 1000)  # 20k tokens, every 50-gram repeated
        rows = [(1, big), (2, big), (3, "a unique closing remark here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.time()
        got = {
            r["doc_id"]: r
            for r in remove_repeated_spans(df, n=50, min_count=2).collect()
        }
        elapsed = time.time() - t0
        assert got[1]["text_clean"] == "" and got[1]["n_removed_tokens"] == 20000
        assert got[2]["text_clean"] == ""
        assert got[3]["n_removed_tokens"] == 0
        assert elapsed < 60, f"templated-doc mask took {elapsed:.1f}s"


class TestPageRankJobCount:
    def test_no_driver_collect_per_iteration(self, spark):
        """VERDICT r4 #4: the per-iteration dangling-mass .collect() is
        folded into the rank update as a broadcast 1-row aggregate, and
        AQE is off around the byte-identical iterative plan (each AQE
        exchange materialization is a driver job: measured 12 jobs/iter
        with the collect + AQE, 2 after the fold). Pin the per-iteration
        JOB SLOPE via the status tracker at two iteration counts —
        slope, not total, so setup jobs don't blur the gate."""
        from aida_spark.operators.graphops import pagerank

        nodes = spark.createDataFrame([(i,) for i in range(40)], "id long")
        edges = spark.createDataFrame(
            [(i, (i * 7 + 3) % 39) for i in range(39)], "id_a long, id_b long"
        )
        sc = spark.sparkContext

        def jobs_for(n_iter: int, tag: str) -> int:
            sc.setJobGroup(tag, tag)
            try:
                total = (
                    pagerank(nodes, edges, n_iter=n_iter)
                    .agg(F.sum("rank"))
                    .collect()[0][0]
                )
            finally:
                sc.setJobGroup(None, None)
            assert total == pytest.approx(1.0, abs=1e-9)
            return len(sc.statusTracker().getJobIdsForGroup(tag))

        j2 = jobs_for(2, "pr_jobs_2")
        j10 = jobs_for(10, "pr_jobs_10")
        slope = (j10 - j2) / 8.0
        # measured 2.0 jobs/iteration (checkpoint + dang-mass broadcast);
        # the old collect loop measured 12.0 under AQE, 3.0 without
        assert slope <= 3.0, f"{slope} jobs/iteration (j2={j2}, j10={j10})"


class TestM7CountBasedImportance:
    def test_rescale_semantics_match_reference(self):
        """CountBasedImportance.java:33-40 + MathUtil.rescale: importance
        = (count - min) / (max - min) over the GLOBAL count table;
        missing entity -> 0.0 (:47-52); min == max -> 1.0
        (MathUtil.rescale:15-18)."""
        from aida_spark.core.scoring import entity_importance

        kb = build_kb()
        kb.gnd_counts = {"Jimmy_Page": 100, "Larry_Page": 40, "Kashmir": 10}
        imp = lambda e: entity_importance(kb, e, "count_based")
        assert imp("Jimmy_Page") == pytest.approx(1.0)
        assert imp("Kashmir") == pytest.approx(0.0)
        assert imp("Larry_Page") == pytest.approx(30 / 90)
        assert imp("Knebworth_Festival") == 0.0  # missing -> 0.0, not min
        kb.gnd_counts = {"Jimmy_Page": 5}
        assert imp("Jimmy_Page") == 1.0  # min == max -> 1.0

    def test_importance_term_small_weight_keeps_golden_mapping(self):
        from aida_spark.core.disambiguate import (
            DisambiguationConfig,
            disambiguate_document,
            prepare,
        )
        from aida_spark.core.scoring import EnsembleWeights

        kb = build_kb()
        kb.gnd_counts = {"Jimmy_Page": 100, "Larry_Page": 40}
        cfg = DisambiguationConfig(
            weights=EnsembleWeights(
                importance_weight=0.1, importance_source="count_based"
            )
        )
        doc = prepare("t", GOLDEN_SENTENCE, kb)
        got = {
            m.mention.surface: m.entity
            for m in disambiguate_document(doc, kb, cfg)
        }
        assert got == GOLDEN_EXPECTED


class TestDisambiguateTexts:
    def test_golden_sentence_roundtrip(self, spark):
        """The synchronous one-call surface the reference serves over
        REST (RequestProcessor.java:519-590): list[str] in, per-text
        mention->entity assignments out, through the full Spark
        pipeline."""
        from aida_spark.api import disambiguate_texts

        out = disambiguate_texts(
            spark, [GOLDEN_SENTENCE, "no entities here at all"], kb_tables()
        )
        assert len(out) == 2
        got = {m["mention"]: m["entity"] for m in out[0]}
        # triples are the post-O5 view: linked mentions only (Les Paul
        # -> --OOKBE-- is cleaned up, as in the batch path)
        assert got == {
            k: v for k, v in GOLDEN_EXPECTED.items() if v != "--OOKBE--"
        }
        # offsets sorted and within the text
        offs = [m["char_offset"] for m in out[0]]
        assert offs == sorted(offs) and all(
            0 <= o < len(GOLDEN_SENTENCE) for o in offs
        )
        assert out[1] == []


class TestKeyphraseCallerTags:
    def test_supplied_tags_column_drives_extraction(self, spark):
        """P12 swap-in proof: a caller-supplied per-word tag column
        (e.g. from a real Stanford-style tagger) replaces the heuristic
        tagger end-to-end through the Spark path."""
        from aida_spark.operators.keyphrases import extract_keyphrases

        # heuristic tags this "VBD NN NN" (no proper noun); the supplied
        # tags make "berlin" a lone NNP -> the 'proper' family fires
        rows = [("d1", "visited berlin today", ["VBD", "NNP", "VBD"])]
        df = spark.createDataFrame(rows, "doc_id string, text string, tags array<string>")
        with_tags = {
            (r["phrase"], r["family"])
            for r in extract_keyphrases(df, tags_col="tags").collect()
        }
        assert ("berlin", "proper") in with_tags
        without = {
            r["phrase"]
            for r in extract_keyphrases(df.drop("tags")).collect()
        }
        assert "berlin" not in without

    def test_tag_count_mismatch_raises(self, spark):
        from aida_spark.operators.keyphrases import extract_keyphrases

        df = spark.createDataFrame(
            [("d1", "two words", ["NN"])],
            "doc_id string, text string, tags array<string>",
        )
        with pytest.raises(Exception, match="tags"):
            extract_keyphrases(df, tags_col="tags").collect()


class TestIncrementalViewKeyColGuard:
    def test_non_conv_checkpoint_rejected(self, spark, tmp_path):
        """ADVICE r4: the bucket-partial merge is only exact when a
        conversation lives in exactly one bucket — a checkpoint keyed on
        any other column must raise, not silently overcount."""
        from aida_spark.lineage import BucketCheckpoint
        from aida_spark.operators.kgviews import (
            incremental_entity_cooccurrence,
            incremental_entity_mention_stats,
        )

        triples = spark.createDataFrame(
            [("c1/0/5", "linksTo", "E1", "e one", 1.0)],
            "subj string, pred string, obj string, mention string, score double",
        )
        bad = BucketCheckpoint(
            spark, str(tmp_path / "ck"), key_col="entity", n_buckets=4
        )
        with pytest.raises(ValueError, match="key_col"):
            incremental_entity_cooccurrence(bad, triples)
        with pytest.raises(ValueError, match="key_col"):
            incremental_entity_mention_stats(bad, triples)


class TestCCUnpersistOnRaise:
    def test_no_leaked_cache_blocks(self, spark):
        """ADVICE r4: on unconverged raise, the labels frame must not
        stay persisted (both methods). localCheckpoint RDDs from the
        rounds are reclaimed asynchronously by the ContextCleaner once
        unreferenced, so the check GCs and polls storage back down to
        the pre-call level instead of asserting an instant snapshot."""
        import gc
        import time

        from aida_spark.operators.graphops import connected_components

        # a 40-node chain cannot converge in 1 propagation round or 1
        # star round
        nodes = spark.createDataFrame([(i,) for i in range(40)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(39)], "id_a long, id_b long"
        )
        sc = spark.sparkContext

        def n_stored() -> int:
            return len(sc._jsc.sc().getRDDStorageInfo())

        for method in ("star", "propagation"):
            before = n_stored()
            with pytest.raises(RuntimeError, match="NOT converged"):
                connected_components(nodes, edges, max_iter=1, method=method)
            deadline = time.time() + 30
            after = n_stored()
            while after > before and time.time() < deadline:
                gc.collect()
                sc._jvm.System.gc()
                time.sleep(0.5)
                after = n_stored()
            assert after <= before, (method, before, after)


class TestIdempotentStreamAppend:
    def test_replayed_batch_does_not_double_triples(self, spark, tmp_path):
        """ADVICE r4 (medium): foreachBatch + blind append is
        at-least-once. The batch writer now lands each micro-batch in a
        _batch_id partition with dynamic partition overwrite, so a
        replayed batch REPLACES its own output — exactly-once in the
        materialized table."""
        from aida_spark.fixtures import golden_transcript
        from aida_spark.pipeline import AidaPipeline
        from aida_spark.streaming.stream_pipeline import write_triples_batch

        out = str(tmp_path / "triples")
        pipe = AidaPipeline(spark, kb_tables())
        batch = spark.createDataFrame(golden_transcript())

        write_triples_batch(pipe, batch, 0, out)
        first = spark.read.parquet(out)
        n1 = first.count()
        assert n1 > 0 and "_batch_id" in first.columns

        # replay the SAME batch id (failure between append and commit)
        write_triples_batch(pipe, batch, 0, out)
        assert spark.read.parquet(out).count() == n1

        # a genuinely new batch still appends
        write_triples_batch(pipe, batch, 1, out)
        assert spark.read.parquet(out).count() == 2 * n1


class TestHttpService:
    def test_golden_sentence_over_http(self, spark):
        """S10 surface: POST the golden sentence to the stdlib HTTP
        service and get the reference assignments back as JSON; bad
        requests and unknown paths return 4xx without killing the
        server."""
        import json
        import urllib.request

        from aida_spark.fixtures import GOLDEN_SENTENCE, kb_tables
        from aida_spark.service import serve

        server = serve(spark, kb_tables(), port=0)
        try:
            base = f"http://127.0.0.1:{server.server_address[1]}"
            with urllib.request.urlopen(f"{base}/health") as r:
                assert json.load(r) == {"status": "ok"}
            req = urllib.request.Request(
                f"{base}/disambiguate",
                data=json.dumps({"text": GOLDEN_SENTENCE}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                results = json.load(r)["results"]
            assert len(results) == 1
            got = {a["mention"]: a["entity"] for a in results[0]}
            assert got == {
                "Page": "Jimmy_Page",
                "Kashmir": "Kashmir_(song)",
                "Knebworth": "Knebworth_Festival",
            }
            offsets = [a["char_offset"] for a in results[0]]
            assert offsets == sorted(offsets)
            # bad request -> 400, server stays up
            bad = urllib.request.Request(
                f"{base}/disambiguate", data=b"{}", method="POST"
            )
            try:
                urllib.request.urlopen(bad)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
            with urllib.request.urlopen(f"{base}/health") as r:
                assert json.load(r)["status"] == "ok"
        finally:
            server.shutdown()
            server.server_close()
