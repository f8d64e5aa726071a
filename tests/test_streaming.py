"""Structured-Streaming ingestion test: file stream of transcript turns
-> micro-batched KG pipeline -> parquet triples, with exactly-once resume
via the streaming checkpoint."""

import os

from aida_spark.fixtures import golden_transcript, kb_tables, synth_transcripts
from aida_spark.pipeline import AidaPipeline, PipelineConfig
from aida_spark.streaming.stream_pipeline import (
    read_transcript_stream,
    stream_triples,
)


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    from pyspark.sql import functions as F

    pdf = synth_transcripts(6, 4, seed=13)
    sdf = spark.createDataFrame(pdf).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    sdf.write.mode("overwrite").parquet(in_dir)

    pipe = AidaPipeline(spark, kb_tables(), PipelineConfig())
    q = stream_triples(
        pipe, read_transcript_stream(spark, in_dir), out_dir, ckpt
    )
    q.awaitTermination(300)

    stream_out = {
        (r["subj"], r["obj"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_out = {
        (r["subj"], r["obj"]) for r in pipe.run(sdf).collect()
    }
    assert stream_out == batch_out

    # resume: add a second wave of files; only new conversations processed
    spark.createDataFrame(golden_transcript()).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.mode("append").parquet(in_dir)
    q2 = stream_triples(
        pipe, read_transcript_stream(spark, in_dir), out_dir, ckpt
    )
    q2.awaitTermination(300)
    out2 = {
        (r["subj"], r["obj"]) for r in spark.read.parquet(out_dir).collect()
    }
    assert ("t1/0/5", "Jimmy_Page") in out2
    # no duplicates of the first wave
    assert len(out2) == len(stream_out) + 3
