"""Stage-level profile of the KG pipeline at bench scale (guide §1):
time stage A (spot), A+B (candidates), and the full run separately with
noop sinks, so the per-stage cost structure is visible without the UI.

Usage: python tools/profile_kg.py [n_convs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    from aida_spark.fixtures import kb_tables, synth_transcripts
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.session import get_spark

    spark = get_spark(
        f"profile-kg-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.driver.memory": "16g",
                    "spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    pdf = synth_transcripts(n_convs, 8, seed=42, hot_key_skew=0.2)
    transcripts = (
        spark.createDataFrame(pdf).repartition(2 * CPUS, "conv_id").persist()
    )
    n_turns = transcripts.count()
    pipe = AidaPipeline(spark, kb_tables(), PipelineConfig(solve_buckets=256))
    pipe.run(transcripts.limit(50)).count()  # warmup

    for rep in range(2):
        sc.setJobDescription("profile: stage A spot")
        t_spot = noop(pipe.spot_mention_keys(transcripts))
        keys = pipe.spot_mention_keys(transcripts)
        sc.setJobDescription("profile: stage A+B candidates")
        t_cand = noop(pipe.candidates(keys))
        sc.setJobDescription("profile: full run")
        t0 = time.time()
        pipe.run(transcripts).count()
        t_full = time.time() - t0
        print(
            f"rep{rep}: turns={n_turns} spot={t_spot:.2f}s "
            f"spot+cand={t_cand:.2f}s full={t_full:.2f}s "
            f"(solve+rest ~= {t_full - t_cand:.2f}s)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
