#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline.

Usage (the north rule's launch surface):

    python -c "from aida_spark.session import ship_package"  # or:
    zip -r aida_spark.zip aida_spark
    spark-submit --py-files aida_spark.zip scripts/run_pipeline.py \
        --transcripts /data/transcripts.parquet \
        --kb /data/kb_tables \
        --output /data/triples \
        [--checkpoint /data/ckpt] [--technique graph|local|prior]
        [--fuzzy-min-sim 0.5] [--max-turns-per-chunk 0] [--emit-ookbe]

--kb is either a directory containing the repository tables as parquet
subdirectories (dictionary/, entity_rank/, ...) or the literal string
"fixture" for the built-in 7-entity test universe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--transcripts", required=True, help="input parquet path")
    p.add_argument("--kb", required=True, help="KB tables dir or 'fixture'")
    p.add_argument("--output", required=True, help="triples output parquet path")
    p.add_argument("--checkpoint", default=None, help="bucket-checkpoint dir")
    p.add_argument("--technique", default="graph",
                   choices=["graph", "local", "prior"])
    p.add_argument("--algorithm", default="cpsc", choices=["cp", "cpsc"])
    p.add_argument("--fuzzy-min-sim", type=float, default=0.0)
    p.add_argument("--max-turns-per-chunk", type=int, default=0)
    p.add_argument("--solve-buckets", type=int, default=512)
    p.add_argument("--emit-ookbe", action="store_true")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


KB_TABLE_NAMES = [
    "dictionary", "known_names", "entity_ids", "entity_rank",
    "entity_keyphrases", "keyphrase_tokens", "word_ids", "word_expansion",
    "keyword_counts", "keyphrase_counts", "entity_counts",
    "entity_inlinks", "entity_types", "stopwords",
]


def load_kb(args):
    if args.kb == "fixture":
        from aida_spark.fixtures import kb_tables

        return kb_tables()
    tables = {}
    for name in KB_TABLE_NAMES:
        path = os.path.join(args.kb, name)
        if os.path.exists(path) or path.startswith(("s3://", "hdfs://")):
            tables[name] = path
    return tables


def main(argv=None) -> int:
    args = parse_args(argv or sys.argv[1:])
    from aida_spark.core.disambiguate import DisambiguationConfig
    from aida_spark.pipeline import AidaPipeline, PipelineConfig
    from aida_spark.session import get_spark

    spark = get_spark("aida-kg-pipeline", master=args.master)
    cfg = PipelineConfig(
        disambiguation=DisambiguationConfig(
            technique=args.technique, algorithm=args.algorithm
        ),
        fuzzy_min_sim=args.fuzzy_min_sim,
        max_turns_per_chunk=args.max_turns_per_chunk,
        solve_buckets=args.solve_buckets,
        emit_ookbe=args.emit_ookbe,
    )
    pipe = AidaPipeline(spark, load_kb(args), cfg)
    transcripts = spark.read.parquet(args.transcripts)

    checkpoint = None
    if args.checkpoint:
        from aida_spark.lineage import BucketCheckpoint

        checkpoint = BucketCheckpoint(spark, args.checkpoint)

    t0 = time.time()
    triples = pipe.run(transcripts, checkpoint=checkpoint)
    triples.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    n_turns = transcripts.count()
    print(
        json.dumps(
            {
                "triples": n,
                "turns": n_turns,
                "wall_s": round(time.time() - t0, 2),
                "turns_per_sec": round(n_turns / (time.time() - t0), 1),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
