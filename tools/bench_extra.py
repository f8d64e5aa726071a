"""Round-6 optimization harness: time the headline queries exactly like
bench.py's query loop (same session confs, warmup + GC + timed run), but
without the scaling legs, and optionally only a subset — for fast
before/after iteration. bench.py itself is FROZEN for measurement.

Usage:
    python tools/bench_extra.py [query ...]       # default: all 17
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_extra.py \
        dedup_clusters semantic_dedup
    python tools/bench_extra.py --kg              # kg_pipeline only
    python tools/bench_extra.py --reps 3 knn_bruteforce
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

ALL_QUERIES = [
    "dedup_exact",
    "minhash_lsh_pairs",
    "knn_bruteforce",
    "doc_quality_counts",
    "word_doc_freq",
    "topk_orders_per_customer",
    "dedup_clusters",
    "decontam_overlap",
    "pack_sequences",
    "repetition_metrics",
    "line_dedup",
    "unigram_nll",
    "keyphrases",
    "repeated_spans",
    "semantic_dedup",
    "decontam_fuzzy",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]
    run_kg = "--kg" in sys.argv or (not args and "--no-kg" not in sys.argv)
    names = args or (ALL_QUERIES if "--kg" not in sys.argv else [])

    import __spark_entry__ as entry_mod
    from aida_spark.session import get_spark

    spark = get_spark(
        f"bench-extra-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.driver.memory": "16g"},
    )
    queries: dict[str, float] = {}

    if run_kg:
        from aida_spark.fixtures import kb_tables, synth_transcripts
        from aida_spark.pipeline import AidaPipeline, PipelineConfig

        n_convs = max(1000, int(600_000 * SF))
        pdf = synth_transcripts(n_convs, 8, seed=42, hot_key_skew=0.2)
        transcripts = (
            spark.createDataFrame(pdf).repartition(2 * CPUS, "conv_id").persist()
        )
        n_turns = transcripts.count()
        pipe = AidaPipeline(spark, kb_tables(), PipelineConfig(solve_buckets=256))
        pipe.run(transcripts.limit(50)).count()
        kg_dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            pipe.run(transcripts).count()
            kg_dt = min(kg_dt, time.time() - t0)
        transcripts.unpersist()
        queries["kg_pipeline"] = round(kg_dt, 3)
        print(f"kg_pipeline: {kg_dt:.3f}s  ({n_turns / kg_dt:.0f} turns/s)",
              file=sys.stderr, flush=True)

    qfns = entry_mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(reps):
            warm = qfns[name](spark, SF_DIR)
            warm.count()
            warm.unpersist()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            timed = qfns[name](spark, SF_DIR)
            timed.count()
            samples.append(round(time.time() - t0, 3))
            timed.unpersist()
        queries[name] = min(samples)
        extra = f" (samples {samples})" if reps > 1 else ""
        print(f"{name}: {queries[name]:.3f}s{extra}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    print(json.dumps({"queries": queries, "sf": SF,
                      "total": round(sum(queries.values()), 3)}))


if __name__ == "__main__":
    main()
