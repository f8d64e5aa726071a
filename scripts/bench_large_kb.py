#!/usr/bin/env python3
"""Large-dictionary rehearsal: the fixture KB plus 1,000,000 synthetic
surface forms, built as SPARK DataFrames (never collected to the driver),
run through the full pipeline on a synthetic transcript corpus.

Evidences the two claims the 10^12-turn design hangs on:
- pipeline init stays driver-memory-free at real dictionary scale (the
  mention-key / word artifacts are written by executors and lazy-loaded
  per worker — kb_artifacts.py);
- spotting throughput against a 1M-key set (the per-worker frozenset
  lookup is O(1) per n-gram, so turns/s should hold within ~2x of the
  7-entity fixture number).

    python scripts/bench_large_kb.py [n_names] [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_names = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 6_250

    from pyspark.sql import functions as F

    from aida_spark.fixtures import kb_tables, synth_transcripts
    from aida_spark.kb_spark import load_kb_tables
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.session import get_spark

    spark = get_spark(
        "bench-large-kb",
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "16g"},
    )
    kb = load_kb_tables(spark, kb_tables())
    big = spark.range(n_names).select(
        F.concat(F.lit("ZZSYNTH"), F.col("id").cast("string")).alias("mention"),
        F.concat(F.lit("Zz_Entity_"), F.col("id").cast("string")).alias("entity"),
        F.lit(0.5).alias("prior"),
    )
    kb["dictionary"] = kb["dictionary"].unionByName(big)
    kb["known_names"] = kb["known_names"].unionByName(big.select("mention"))

    t0 = time.time()
    pipe = AidaPipeline(spark, kb, PipelineConfig(broadcast_dictionary=False))
    init_s = time.time() - t0

    pdf = synth_transcripts(n_convs, 8, seed=99, hot_key_skew=0.2)
    transcripts = spark.createDataFrame(pdf).repartition(32, "conv_id").persist()
    n_turns = transcripts.count()
    pipe.run(transcripts.limit(50)).count()  # warmup
    t0 = time.time()
    n_triples = pipe.run(transcripts).count()
    run_s = time.time() - t0
    print(
        json.dumps(
            {
                "n_dictionary_names": n_names,
                "n_turns": n_turns,
                "n_triples": n_triples,
                "init_sec": round(init_s, 2),
                "run_sec": round(run_s, 2),
                "turns_per_sec": round(n_turns / run_s, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
