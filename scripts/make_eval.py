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
        assignments = pipe.solve(transcripts, pipe.candidates(keys))
        m = evaluate_assignments(assignments, gold)
        results[technique] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in m.items()
        }
    # --- out-of-dictionary spotting (SURVEY P3 substitution, VERDICT r1
    # missing #4): the reference uses Stanford NER to catch names absent
    # from the dictionary; this engine substitutes dictionary max-match
    # plus an unknown-capitalized-span + trigram-fuzzy fallback. Quantify
    # the recall delta by misspelling every gold mention (one appended
    # char) so exact lookup CANNOT hit, then measuring triple recall with
    # the fallback off vs on.
    import re

    docs, gold = synth_conll_corpus(args.n_docs, seed=args.seed)
    transcripts_pdf = to_transcripts(docs)
    perturb = {
        m: m + "x" for m in sorted(set(gold["mention"]))
    }
    for m, pm in perturb.items():
        transcripts_pdf["text"] = transcripts_pdf["text"].str.replace(
            rf"\b{re.escape(m)}\b", pm, regex=True
        )
    gold_p = gold.copy()
    gold_p["mention"] = gold_p["mention"].map(lambda m: perturb.get(m, m))
    ood = {}
    for label, fuzzy in (("dictionary_only", 0.0), ("fuzzy_fallback", 0.5)):
        from aida_spark.core.disambiguate import DisambiguationConfig

        pipe = AidaPipeline(
            spark,
            kb_tables(),
            PipelineConfig(
                fuzzy_min_sim=fuzzy,
                disambiguation=DisambiguationConfig(fuzzy_min_sim=fuzzy),
            ),
        )
        tr = spark.createDataFrame(transcripts_pdf)
        keys = pipe.spot_mention_keys(tr)
        assignments = pipe.solve(tr, pipe.candidates(keys))
        m = evaluate_assignments(assignments, gold_p)
        ood[label] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in m.items()
        }
    results["ood_spotting"] = ood
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

## Out-of-dictionary spotting (P3 NER substitution)

The reference catches out-of-dictionary names with Stanford NER; this
engine substitutes dictionary max-match + an unknown-capitalized-span
and trigram-fuzzy fallback (SURVEY P3 sanctions the swap for
reproducibility). Measured on the same corpus with EVERY gold mention
misspelled (one appended char, so exact lookup cannot hit):

| spotting | recall | precision |
|---|---|---|
| dictionary only | {results["ood_spotting"]["dictionary_only"]["recall"]} | {results["ood_spotting"]["dictionary_only"]["precision"]} |
| + unknown-caps + trigram fuzzy (sim >= 0.5) | {results["ood_spotting"]["fuzzy_fallback"]["recall"]} | {results["ood_spotting"]["fuzzy_fallback"]["precision"]} |

This is the structural recall delta a real NER would close further; on
UNperturbed text (the table above) recall is unaffected because every
surface form is in the dictionary.
"""
    with open(os.path.join(args.out_dir, "EVAL.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(payload["results"]))
    return 0 if payload["gate_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
