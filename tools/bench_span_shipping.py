#!/usr/bin/env python3
"""Measure ship_spans (stage A ships spotted spans, stage D skips the
dictionary max-match) against the default re-spotting path on the bench
corpus shape (VERDICT r3 #7). Both paths run in THIS session
back-to-back, best-of-N after a warmup, GC between runs (bench.py
hygiene).

    python tools/bench_span_shipping.py [n_convs] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from aida_spark.fixtures import kb_tables, synth_transcripts
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.session import get_spark

    spark = get_spark(
        "bench_span_shipping",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    pdf = synth_transcripts(n_convs, 8, seed=42, hot_key_skew=0.2)
    transcripts = (
        spark.createDataFrame(pdf).repartition(64, "conv_id").persist()
    )
    n_turns = transcripts.count()

    results = {}
    counts = {}
    for label, ship in (("respot", False), ("ship_spans", True)):
        pipe = AidaPipeline(
            spark,
            kb_tables(),
            PipelineConfig(solve_buckets=256, ship_spans=ship),
        )
        pipe.run(transcripts.limit(50)).count()  # warmup
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            counts[label] = pipe.run(transcripts).count()
            best = min(best, time.time() - t0)
        results[label] = round(best, 2)
        pipe.close()
    assert counts["respot"] == counts["ship_spans"], counts
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "triples": counts["respot"],
                "respot_s": results["respot"],
                "ship_spans_s": results["ship_spans"],
                "winner": min(results, key=results.get),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
