#!/usr/bin/env python3
"""Produce the per-round quality artifact (EVAL.md + EVAL.json): triple-
level P/R of the full Spark pipeline on the synthetic CoNLL-YAGO-style
fixture corpus, against gold derived from the golden-parity-pinned core
solver — the north rule's "P/R >= 0.95 under pytest" gate, recorded as a
driver-visible artifact (VERDICT r1 item 8).

    python scripts/make_eval.py [--n-docs 100] [--out-dir .]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-docs", type=int, default=100)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out-dir", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = p.parse_args(argv or sys.argv[1:])

    from aida_spark.evaluate import evaluate_assignments
    from aida_spark.fixtures import kb_tables, synth_conll_corpus
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.session import get_spark
    from aida_spark.sources.conll import to_transcripts

    spark = get_spark("aida-eval", master="local[8]", shuffle_partitions=16)
    results = {}
    for technique in ("graph", "prior"):
        docs, gold = synth_conll_corpus(args.n_docs, seed=args.seed)
        transcripts = spark.createDataFrame(to_transcripts(docs))
        from aida_spark.core.disambiguate import DisambiguationConfig

        pipe = AidaPipeline(
            spark,
            kb_tables(),
            PipelineConfig(
                disambiguation=DisambiguationConfig(technique=technique)
            ),
        )
        keys = pipe.spot_mention_keys(transcripts)
        assignments = pipe.solve(transcripts, pipe.candidate_payload(keys))
        m = evaluate_assignments(assignments, gold)
        results[technique] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in m.items()
        }
    spark.stop()

    payload = {
        "corpus": f"synth_conll_corpus(n_docs={args.n_docs}, seed={args.seed})",
        "gold": "golden-parity-pinned core solver (test_core_golden.py)",
        "date": datetime.date.today().isoformat(),
        "results": results,
        "gate": "triple-level P/R >= 0.95 (north rule)",
        "gate_pass": results["graph"]["precision"] >= 0.95
        and results["graph"]["recall"] >= 0.95,
    }
    with open(os.path.join(args.out_dir, "EVAL.json"), "w") as fh:
        json.dump(payload, fh, indent=2)
    g = results["graph"]
    pr = results["prior"]
    md = f"""# EVAL — CoNLL-fixture triple-level P/R

North-rule gate: triple-level precision AND recall >= 0.95 vs the
reference-pinned solver outputs. Corpus: `{payload["corpus"]}` run through
the FULL Spark pipeline (spot -> candidate join -> payload -> solve);
gold = the pure-Python core solver, itself pinned to the reference JUnit
goldens in `tests/test_core_golden.py`. Regenerate with
`python scripts/make_eval.py`.

| technique | precision | recall | f1 | n_gold | n_predicted | nil_violations |
|---|---|---|---|---|---|---|
| graph | {g["precision"]} | {g["recall"]} | {g["f1"]} | {g["n_gold"]} | {g["n_predicted"]} | {g["nil_violations"]} |
| prior | {pr["precision"]} | {pr["recall"]} | {pr["f1"]} | {pr["n_gold"]} | {pr["n_predicted"]} | {pr["nil_violations"]} |

Gate (graph technique): **{"PASS" if payload["gate_pass"] else "FAIL"}**
({payload["date"]}).

Note: `prior` is evaluated against graph-technique gold, so its lower
numbers quantify how much coherence adds over prior-argmax — context, not
a gate.
"""
    with open(os.path.join(args.out_dir, "EVAL.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(payload["results"]))
    return 0 if payload["gate_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
