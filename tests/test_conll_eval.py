"""CoNLL-style source round-trip + triple-level P/R gate tests."""

import pandas as pd
import pytest

from aida_spark.evaluate import evaluate_assignments, triple_prf
from aida_spark.fixtures import kb_tables, synth_conll_corpus
from aida_spark.pipeline import AidaPipeline, PipelineConfig
from aida_spark.sources.conll import (
    ground_truth_table,
    parse_collection,
    to_transcripts,
    write_collection,
)

REFERENCE_TSV = "/root/reference/testdata/preparedinput/preparedinputtest.tsv"


class TestConllSource:
    def test_parse_reference_testdata(self):
        with open(REFERENCE_TSV) as fh:
            docs = parse_collection(fh.read())
        assert len(docs) == 1
        doc = docs[0]
        assert doc.doc_id == "1 EU"
        assert doc.tokens[0] == "EU"
        first = doc.mentions[0]
        assert (first.surface, first.entity) == ("EU", "--NME--")
        surfaces = {m.surface for m in doc.mentions}
        assert "European Commission" in surfaces  # multi-token B/I mention
        ec = next(m for m in doc.mentions if m.surface == "European Commission")
        assert ec.end_token == ec.start_token + 1
        assert ec.entity == "European_Commission"

    def test_roundtrip(self):
        with open(REFERENCE_TSV) as fh:
            original = fh.read()
        docs = parse_collection(original)
        rewritten = write_collection(docs)
        docs2 = parse_collection(rewritten)
        assert [d.doc_id for d in docs2] == [d.doc_id for d in docs]
        assert [d.tokens for d in docs2] == [d.tokens for d in docs]
        assert [
            (m.surface, m.entity, m.start_token, m.end_token)
            for d in docs2
            for m in d.mentions
        ] == [
            (m.surface, m.entity, m.start_token, m.end_token)
            for d in docs
            for m in d.mentions
        ]

    def test_to_transcripts_marks_mentions(self):
        docs, _gold = synth_conll_corpus(3, seed=1)
        tr = to_transcripts(docs)
        assert set(tr.columns) == {
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        }
        assert tr["text"].str.contains(r"\[\[").any()


class TestTriplePR:
    def test_prf_math(self):
        pred = {("c", 0, "Page", "Jimmy_Page"), ("c", 0, "X", "Y")}
        gold = {("c", 0, "Page", "Jimmy_Page"), ("c", 1, "Z", "W")}
        m = triple_prf(pred, gold)
        assert m["precision"] == 0.5 and m["recall"] == 0.5

    def test_pipeline_pr_gate_on_conll_corpus(self, spark):
        """North-rule gate: triple-level P/R >= 0.95 vs reference outputs
        (gold derived from the golden-parity-pinned core solver) over a
        CoNLL-style fixture corpus run through the full Spark pipeline."""
        docs, gold = synth_conll_corpus(25, seed=7)
        transcripts = to_transcripts(docs)
        pipe = AidaPipeline(spark, kb_tables(), PipelineConfig())
        keys = pipe.spot_mention_keys(spark.createDataFrame(transcripts))
        assignments = pipe.solve(
            spark.createDataFrame(transcripts), pipe.candidates(keys)
        )
        metrics = evaluate_assignments(assignments, gold)
        assert metrics["n_gold"] > 20
        assert metrics["precision"] >= 0.95, metrics
        assert metrics["recall"] >= 0.95, metrics
        assert metrics["nil_violations"] == 0, metrics
