#!/usr/bin/env python3
"""Evaluate the pipeline on a CoNLL-YAGO-style collection TSV.

    spark-submit --py-files aida_spark.zip scripts/evaluate_conll.py \
        --collection <collection.tsv> --kb <kb dir | fixture> \
        [--technique graph] [--master local[8]]

Parses the collection (reference format, PreparedInput.java:183-304),
converts documents to transcripts, runs the pipeline, and prints the
triple-level P/R/F1 JSON (the north-rule quality gate).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--collection", required=True)
    p.add_argument("--kb", required=True)
    p.add_argument("--technique", default="graph")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv or sys.argv[1:])

    from aida_spark.core.disambiguate import DisambiguationConfig
    from aida_spark.evaluate import evaluate_assignments
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.session import get_spark
    from aida_spark.sources.conll import (
        ground_truth_table,
        parse_collection,
        to_transcripts,
    )
    from scripts.run_pipeline import load_kb  # reuse the KB loader

    with open(args.collection) as fh:
        docs = parse_collection(fh.read())
    transcripts = to_transcripts(docs)
    gold = ground_truth_table(docs)

    spark = get_spark("aida-conll-eval", master=args.master)
    pipe = AidaPipeline(
        spark,
        load_kb(args),
        PipelineConfig(
            disambiguation=DisambiguationConfig(technique=args.technique)
        ),
    )
    tr = spark.createDataFrame(transcripts)
    keys = pipe.spot_mention_keys(tr)
    assignments = pipe.solve(tr, pipe.candidates(keys))
    metrics = evaluate_assignments(assignments, gold)
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in metrics.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
