"""Dump FULL ``explain('formatted')`` output for the round-6 touched
queries into plans/r06/<query>_<tag>.txt (the judge checks plan claims
against these files).

Usage: python tools/dump_r06_plans.py <tag>     # tag = before | after
Run from the repo root whose code should produce the plans; plans are
always written into /root/repo/plans/r06/.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

OUT_DIR = "/root/repo/plans/r06"
SF_DIR = "/root/testdata/sf0.1"

QUERIES = [
    "dedup_exact",
    "minhash_lsh_pairs",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "doc_quality_counts",
    "word_doc_freq",
    "dedup_clusters",
    "decontam_overlap",
    "decontam_fuzzy",
    "semantic_dedup",
    "embedding_near_dups",
    "ngram_jaccard_pairs",
    "line_dedup",
    "unigram_nll",
    "repeated_spans",
    "repetition_metrics",
    "pack_sequences",
    "keyphrases",
]


def main() -> None:
    tag = sys.argv[1]
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as entry_mod
    from aida_spark.session import get_spark

    spark = get_spark(
        f"plans-r06-{tag}",
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qfns = entry_mod.queries()
    for name in QUERIES:
        try:
            df = qfns[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{OUT_DIR}/{name}_{tag}.txt", "w") as fh:
                fh.write(buf.getvalue())
            try:
                df.unpersist()
            except Exception:
                pass
            print(f"{name}: ok", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}", flush=True)

    # the KG pipeline is not a declared query fn; dump its solve plan too
    from aida_spark.fixtures import kb_tables, synth_transcripts
    from aida_spark.pipeline import AidaPipeline, PipelineConfig

    pdf = synth_transcripts(2000, 8, seed=42)
    tr = spark.createDataFrame(pdf)
    pipe = AidaPipeline(spark, kb_tables(), PipelineConfig(solve_buckets=256))
    out = pipe.run(tr)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    with open(f"{OUT_DIR}/kg_pipeline_{tag}.txt", "w") as fh:
        fh.write(buf.getvalue())
    print("kg_pipeline: ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
