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


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a file stream must
    reproduce the batch lag+running-sum sessionization, including session
    numbering that CONTINUES across micro-batches (state carried in the
    streaming checkpoint)."""
    import pandas as pd
    from pyspark.sql import Window, functions as F
    from aida_spark.streaming.sessionize import sessionize_stream

    in_dir = str(tmp_path / "sess_in")
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(in_dir)

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two waves split by time: the second wave's sessions must continue
    # the numbering the first wave's state left off at
    cutoff = events.selectExpr(
        "percentile_approx(cast(ts as timestamp), 0.5) AS c"
    ).first()["c"]
    w1 = events.filter(F.col("ts").cast("timestamp") <= F.lit(cutoff))
    w2 = events.filter(F.col("ts").cast("timestamp") > F.lit(cutoff))
    w1.coalesce(1).write.mode("overwrite").parquet(in_dir)

    def run_wave():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )

        # file sinks only take append mode; update-mode stateful output
        # goes through foreachBatch (each event is emitted exactly once,
        # in the micro-batch it arrives)
        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            sessionize_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_wave()
    w2.coalesce(1).write.mode("append").parquet(in_dir)
    run_wave()

    got = {
        (r["event_id"], r["session_no"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch reference: the event_sessions idiom (lag + running sum)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    expected = {
        (r["event_id"], r["session_no"])
        for r in events.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .select("event_id", "session_no")
        .collect()
    }
    assert len(got) == len(expected)
    assert got == expected


def test_sessionization_hot_user_multi_chunk(spark, tmp_path):
    """A user whose micro-batch volume exceeds the Arrow batch size is
    delivered to applyInPandasWithState as MULTIPLE chunks in arbitrary
    order — the group must be materialized and sorted as a whole before
    gap detection, or timestamps regress across chunk boundaries and
    session numbers come out wrong. Forces tiny Arrow chunks (50 rows)
    and feeds one user 300 shuffled events spanning 3 sessions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from aida_spark.streaming.sessionize import sessionize_stream

    in_dir = str(tmp_path / "hot_in")
    out_dir = str(tmp_path / "hot_out")
    ckpt = str(tmp_path / "hot_ckpt")

    n = 300
    idx = np.arange(n)
    # 3 sessions: a >30min hole after every 100 events
    epochs = 1_700_000_000 + idx * 10 + (idx // 100) * 3600
    pdf = pd.DataFrame(
        {
            "event_id": idx.astype("int64"),
            "user_id": np.int64(1),
            "ts": pd.to_datetime(epochs, unit="s"),
        }
    )
    rng = np.random.RandomState(42)
    pdf = pdf.iloc[rng.permutation(n)].reset_index(drop=True)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(in_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        stream = (
            spark.readStream.schema("event_id long, user_id long, ts timestamp")
            .parquet(in_dir)
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            sessionize_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {
        (r["event_id"], r["session_no"])
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {(int(i), int(i) // 100 + 1) for i in range(n)}
    assert got == expected


def test_windowed_counts_stream_matches_batch_with_late_rows(spark, tmp_path):
    """Watermarked tumbling-window aggregation: streaming output (two
    waves, the second delivering LATE rows that still fall inside the
    2-hour watermark) must equal the batch twin over the full input."""
    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F
    from aida_spark.streaming.windowed import (
        windowed_event_counts,
        windowed_event_counts_stream,
    )

    in_dir = str(tmp_path / "win_in")
    out_dir = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")

    n = 2000
    rng = np.random.RandomState(11)
    base = 1_700_000_000
    epochs = base + rng.randint(0, 6 * 3600, size=n)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "event_type": [f"t{i % 3}" for i in range(n)],
            "ts": pd.to_datetime(epochs, unit="s"),
        }
    )
    # wave 1: newest half first (advances the watermark);
    # wave 2: the older half — late, but within the 2h+6h span tolerance?
    # watermark is max(event time) - 2h; rows older than that are dropped.
    # Keep wave-2 rows inside the tolerance: wave 1 = events in the first
    # 3 hours, wave 2 = events in the last 3 hours (later event times, so
    # nothing is ever behind the watermark — parity must be exact).
    cut = base + 3 * 3600
    w1 = pdf[pdf.ts < pd.to_datetime(cut, unit="s")]
    w2 = pdf[pdf.ts >= pd.to_datetime(cut, unit="s")]
    spark.createDataFrame(w1).coalesce(1).write.parquet(in_dir)

    def run_wave():
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp"
            )
            .parquet(in_dir)
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            windowed_event_counts_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_wave()
    spark.createDataFrame(w2).coalesce(1).write.mode("append").parquet(in_dir)
    run_wave()

    # update mode re-emits a window row each time it changes: keep the
    # LAST emission per (window, type) — order by micro-batch via file
    # modification order is fragile, so take max(n) (counts only grow)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out_dir)
        .groupBy("window_start", "event_type")
        .agg(F.max("n").alias("n"))
        .collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(spark.createDataFrame(pdf)).collect()
    }
    assert got == expected


def test_stream_with_incremental_views_matches_batch_views(spark, tmp_path):
    """Continuous KG maintenance: per-micro-batch incremental view
    refresh must end bit-identical to batch views over the full triple
    table, and the second wave must rebuild only its own buckets'
    partials (lineage input_hash changes bounded by the wave's
    conversations)."""
    import os

    from pyspark.sql import functions as F

    from aida_spark.lineage import BucketCheckpoint
    from aida_spark.operators.kgviews import (
        entity_cooccurrence,
        entity_mention_stats,
    )
    from aida_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        stream_triples_with_views,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    views = str(tmp_path / "views")
    os.makedirs(in_dir)

    pdf = synth_transcripts(6, 4, seed=31)
    spark.createDataFrame(pdf).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.mode("overwrite").parquet(in_dir)

    pipe = AidaPipeline(spark, kb_tables(), PipelineConfig())
    vckpt = BucketCheckpoint(
        spark, str(tmp_path / "vckpt"), n_buckets=16, key_col="conv"
    )
    q = stream_triples_with_views(
        pipe, read_transcript_stream(spark, in_dir), out_dir, ckpt,
        vckpt, views,
    )
    q.awaitTermination(300)
    lineage1 = {
        r["_bucket"]: r["input_hash"]
        for r in vckpt.lineage("kgview_cooc").collect()
    }

    # second wave: one new conversation
    spark.createDataFrame(golden_transcript()).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.mode("append").parquet(in_dir)
    q2 = stream_triples_with_views(
        pipe, read_transcript_stream(spark, in_dir), out_dir, ckpt,
        vckpt, views,
    )
    q2.awaitTermination(300)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    triples = spark.read.parquet(out_dir)
    assert canon(
        spark.read.parquet(f"{views}/entity_cooccurrence")
    ) == canon(entity_cooccurrence(triples))
    assert canon(
        spark.read.parquet(f"{views}/entity_mention_stats")
    ) == canon(entity_mention_stats(triples))

    # incrementality: the golden conversation touches exactly one bucket
    lineage2 = {
        r["_bucket"]: r["input_hash"]
        for r in vckpt.lineage("kgview_cooc").collect()
    }
    changed = [
        b for b in set(lineage1) | set(lineage2)
        if lineage1.get(b) != lineage2.get(b)
    ]
    assert len(changed) == 1
