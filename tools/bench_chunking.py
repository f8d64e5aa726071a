#!/usr/bin/env python3
"""Measure the P9 chunking bound: solve one synthetic mega-conversation
(default 100k turns) at several ``max_turns_per_chunk`` settings and
report wall time, triple count, and the peak worker RSS (VmHWM of the
pyspark.daemon workers — the solve worker dominates).

Each setting runs in a FRESH subprocess/SparkSession so worker processes
start clean and their VmHWM reflects only that setting's run.

    python tools/bench_chunking.py [n_turns] [chunk_sizes_csv]

Output: one JSON line per setting + a summary table. The result feeds
the PipelineConfig.max_turns_per_chunk default (BENCH.md §Round 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import json, os, sys, time
repo, n_turns, max_turns = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sys.path.insert(0, repo)

from aida_spark.session import get_spark
from aida_spark.pipeline import AidaPipeline, PipelineConfig
from aida_spark.fixtures import kb_tables, synth_transcripts

spark = get_spark("bench_chunking", master="local[4]")
pdf = synth_transcripts(1, turns_per_conv=n_turns)
transcripts = spark.createDataFrame(pdf)
cfg = PipelineConfig(max_turns_per_chunk=max_turns, solve_buckets=4)
pipe = AidaPipeline(spark, kb_tables(), cfg)
t0 = time.time()
n = pipe.run(transcripts).count()
wall = time.time() - t0

def worker_peaks():
    peaks = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "pyspark.daemon" not in cmd:
                continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        peaks.append(int(line.split()[1]))
        except OSError:
            continue
    return peaks

peaks = worker_peaks()
print("RESULT " + json.dumps({
    "max_turns_per_chunk": max_turns,
    "n_turns": n_turns,
    "triples": n,
    "wall_s": round(wall, 2),
    "peak_worker_rss_mb": round(max(peaks) / 1024, 1) if peaks else None,
    "n_workers_seen": len(peaks),
}))
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sizes = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [0, 128, 256, 512, 1024]
    )
    results = []
    for mt in sizes:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, repo, str(n_turns), str(mt)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")),
            None,
        )
        if line is None:
            print(f"max_turns={mt}: FAILED\n{proc.stderr[-2000:]}")
            continue
        r = json.loads(line[len("RESULT "):])
        results.append(r)
        print(json.dumps(r))
    if results:
        print("\nsummary (n_turns=%d):" % n_turns)
        print("chunk    wall_s   peak_rss_mb   triples")
        for r in results:
            print(
                f"{r['max_turns_per_chunk']:>5}  {r['wall_s']:>7}  "
                f"{r['peak_worker_rss_mb']!s:>11}   {r['triples']}"
            )


if __name__ == "__main__":
    main()
