#!/usr/bin/env python3
"""Root-cause experiment for the r2 driver-bench regressions
(knn_bruteforce 1.6->5.9 s, word_doc_freq 0.9->4.3 s at sf0.1):
replicate bench.py's exact query order and instrument the block manager
— after each query, report elapsed time and how many RDD blocks /
bytes remain persisted. Also measure each suspect query SOLO in a fresh
session for the in-sequence-vs-solo delta.

    python tools/bench_query_experiment.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def persisted(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        "n_rdds": len(infos),
        "mem_mb": round(sum(i.memSize() for i in infos) / 1e6, 1),
        "disk_mb": round(sum(i.diskSize() for i in infos) / 1e6, 1),
    }


SEQ = [
    "dedup_exact",
    "minhash_lsh_pairs",
    "knn_bruteforce",
    "doc_quality_counts",
    "word_doc_freq",
    "topk_orders_per_customer",
]


def run_sequence(spark, qfns) -> dict:
    out = {}
    for name in SEQ:
        qfns[name](spark, SF_DIR).count()  # warmup, like bench.py
        t0 = time.time()
        qfns[name](spark, SF_DIR).count()
        out[name] = {
            "sec": round(time.time() - t0, 3),
            "after": persisted(spark),
        }
    return out


def main() -> None:
    import __spark_entry__ as entry_mod
    from aida_spark.session import get_spark

    qfns = entry_mod.queries()

    spark = get_spark(
        "bench-experiment", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    seq = run_sequence(spark, qfns)
    spark.stop()

    solo = {}
    for name in ("knn_bruteforce", "word_doc_freq"):
        spark = get_spark(
            f"solo-{name}", master="local[32]", shuffle_partitions=32,
            extra_conf={"spark.driver.memory": "16g"},
        )
        qfns[name](spark, SF_DIR).count()
        t0 = time.time()
        qfns[name](spark, SF_DIR).count()
        solo[name] = round(time.time() - t0, 3)
        spark.stop()

    print(json.dumps({"in_sequence": seq, "solo": solo}, indent=2))


if __name__ == "__main__":
    main()
