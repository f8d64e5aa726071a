#!/usr/bin/env python3
"""Large-dictionary rehearsal: the fixture KB plus N synthetic surface
forms (default 1,000,000), built as SPARK DataFrames (never collected to
the driver), run through the full pipeline on a synthetic transcript
corpus.

Evidences the three claims the 10^12-turn design hangs on:
- pipeline init stays driver-memory-free at real dictionary scale (the
  mention-key / word artifacts are written by executors and lazy-loaded
  per worker — kb_artifacts.py);
- per-WORKER added memory for the spotting dictionary is bounded at
  ~8 bytes/key (sorted int64 hash array, node-local mmap) instead of a
  multi-GB Python frozenset — measured directly from /proc inside the
  worker (``rss`` section of the output);
- spotting throughput against a large key set holds (searchsorted probes
  are O(log n), so turns/s should hold within ~2x of the 7-entity
  fixture number).

    python scripts/bench_large_kb.py [n_names] [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_worker_rss(spark, pipe) -> dict:
    """Inside a fresh-cache worker, measure resident-set growth from
    loading the spotting artifacts (mention-key hash set + word-id hash
    map), touching the arrays end to end. Reports per-distinct-worker
    deltas plus the actual array sizes."""
    import pandas as pd

    a_keys = pipe._a_mention_keys
    a_words = pipe._a_word_ids

    def probe(batches):
        import numpy as np

        from aida_spark import kb_artifacts as ka

        def rss_kb() -> int:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1])
            return -1

        ka._CACHE.clear()
        before = rss_kb()
        s = ka.load_hash_set(a_keys)
        m = ka.load_hash_map(a_words)
        # touch every page of the mmaps (worst-case probe coverage)
        touched = int(np.sum(s._arr[:: 512])) + int(np.sum(m._keys[:: 512]))
        after = rss_kb()
        for _pdf in batches:
            yield pd.DataFrame(
                {
                    "pid": [os.getpid()],
                    "rss_before_kb": [before],
                    "rss_after_kb": [after],
                    "n_keys": [len(s)],
                    "set_bytes": [int(s._arr.nbytes)],
                    "map_bytes": [int(m._keys.nbytes + m._vals.nbytes)],
                    "checksum": [touched],
                }
            )

    rows = (
        spark.range(64)
        .repartition(16)
        .mapInPandas(
            probe,
            "pid long, rss_before_kb long, rss_after_kb long, n_keys long,"
            " set_bytes long, map_bytes long, checksum long",
        )
        .collect()
    )
    per_pid = {}
    for r in rows:
        per_pid.setdefault(
            r["pid"], (r["rss_after_kb"] - r["rss_before_kb"]) * 1024
        )
    deltas = sorted(per_pid.values())
    return {
        "n_workers_measured": len(per_pid),
        "set_bytes": rows[0]["set_bytes"],
        "map_bytes": rows[0]["map_bytes"],
        "worker_rss_delta_median_bytes": deltas[len(deltas) // 2],
        "worker_rss_delta_max_bytes": deltas[-1],
    }


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
    raw_key_bytes = (
        kb["known_names"]
        .unionByName(kb["dictionary"].select("mention"))
        .distinct()
        .agg(F.sum(F.length("mention")))
        .first()[0]
    )

    t0 = time.time()
    pipe = AidaPipeline(spark, kb, PipelineConfig(broadcast_dictionary=False))
    init_s = time.time() - t0

    rss = measure_worker_rss(spark, pipe)
    rss["raw_key_bytes"] = int(raw_key_bytes)
    rss["added_over_raw_ratio"] = round(
        rss["worker_rss_delta_median_bytes"] / max(raw_key_bytes, 1), 2
    )

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
                "rss": rss,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
