"""Per-partition lineage, metrics and exact resume.

The north rule requires every stage to be resumable from checkpoint with
per-partition lineage + metrics. Design (SURVEY.md §4 "custom infra"):

- Work is bucketed by ``pmod(xxhash64(conv_id), n_buckets)`` — a stable,
  content-derived partition id that survives cluster resizing (unlike
  Spark's physical partition ids).
- Each bucket's *input fingerprint* is an order-independent aggregate
  (sum of row hashes), computed with one cheap Catalyst aggregation.
- A checkpoint = Parquet output partitioned by bucket + a lineage table
  ``(stage, bucket, input_hash, rows_in, rows_out, wall_ms, ts)``.
- Resume: recompute ONLY buckets whose current input fingerprint differs
  from the lineage row (or that have no row); untouched buckets are read
  back from Parquet. Dynamic partition overwrite keeps the rewrite
  bucket-scoped.

At 10^12-turn scale this means a failed/preempted run re-executes only
the buckets it never finished, and incremental input (new conversations)
only touches the buckets they hash into.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["BucketCheckpoint"]

BUCKET_COL = "_bucket"


class BucketCheckpoint:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        n_buckets: int = 64,
        key_col: str = "conv_id",
    ):
        self.spark = spark
        self.base = base_path.rstrip("/")
        self.n_buckets = n_buckets
        self.key_col = key_col
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- helpers -------------------------------------------------------
    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)).cast(
                "int"
            ),
        )

    def _fingerprints(self, df: DataFrame) -> DataFrame:
        """Order-independent per-bucket content hash over all columns."""
        cols = [c for c in df.columns if c != BUCKET_COL]
        row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
        # decimal(38,0) accumulation: order-independent and overflow-safe
        # under ANSI mode (a long sum of xxhash64 values overflows)
        return df.groupBy(BUCKET_COL).agg(
            F.sum(row_hash.cast("decimal(38,0)")).alias("input_hash"),
            F.count(F.lit(1)).alias("rows_in"),
        )

    def _paths(self, stage: str) -> tuple[str, str]:
        return (
            f"{self.base}/{stage}/data",
            f"{self.base}/{stage}/lineage",
        )

    def _hadoop_fs(self, path: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(
            self.spark._jsc.hadoopConfiguration()
        )
        return fs, hpath

    def _delete_path(self, path: str) -> None:
        fs, hpath = self._hadoop_fs(path)
        if fs.exists(hpath):
            fs.delete(hpath, True)

    def _delete_dirty_partitions(self, data_path: str, dirty_buckets) -> int:
        """Remove the on-disk partitions of dirty/removed buckets before a
        dynamic-partition-overwrite rewrite (a dirty bucket recomputed to
        zero rows would otherwise keep its stale partition). Batched: ONE
        listStatus enumerates existing partitions, deletes touch only
        partitions that both exist and are dirty, and a full recompute
        collapses to a single parent delete — at n_buckets=10^5 the
        driver no longer issues one exists+delete RPC pair per bucket.
        Returns the number of FS delete calls (tested)."""
        fs, data_hpath = self._hadoop_fs(data_path)
        if not fs.exists(data_hpath):
            return 0
        if len(dirty_buckets) >= self.n_buckets:
            fs.delete(data_hpath, True)
            return 1
        dirty_names = {f"{BUCKET_COL}={b}" for b in dirty_buckets}
        deletes = 0
        for st in fs.listStatus(data_hpath):
            if st.getPath().getName() in dirty_names:
                fs.delete(st.getPath(), True)
                deletes += 1
        return deletes

    def lineage(self, stage: str) -> DataFrame | None:
        # Probe via the Hadoop FileSystem API, not os.path.exists — the
        # checkpoint base may be hdfs:// or s3a:// where a local stat is
        # always false and would silently force full recompute every run.
        _, lin = self._paths(stage)
        fs, hpath = self._hadoop_fs(lin)
        if not fs.exists(hpath):
            return None
        return self.spark.read.parquet(lin)

    # -- main entry ------------------------------------------------------
    def materialize(
        self,
        stage: str,
        input_df: DataFrame,
        compute_fn,
        dirty_from: DataFrame | None = None,
    ) -> DataFrame:
        """Compute ``compute_fn(bucketed_input)`` with bucket-level resume.

        ``compute_fn`` receives the bucketed input (including BUCKET_COL)
        and must return a DataFrame that retains BUCKET_COL (derive it from
        the same key column if the grain changes).

        ``dirty_from`` (r6, VERDICT r5 #2) makes change DETECTION
        O(batch) instead of O(corpus): when the caller knows exactly
        which input rows changed since the last materialize (a streaming
        micro-batch it just appended), passing them — same key column —
        derives the dirty-bucket set from the hint's keys alone, so no
        corpus-wide fingerprint scan runs. The dirty buckets' lineage
        hashes are then recomputed from their CURRENT full content (the
        same filtered slice the recompute itself reads, persisted so the
        table is scanned once per refresh), which keeps them
        content-derived — a replayed/overwritten batch still converges,
        and a later hint-less (full-scan/repair) resume agrees with
        them. Clean buckets keep their prior lineage rows verbatim.
        The hint must COVER every changed bucket (missing one leaves a
        stale partial — the same contract as naming the wrong key_col);
        hint-less calls keep the exhaustive fingerprint scan and remain
        the repair path. Falls back to the full path when no prior
        lineage exists."""
        if dirty_from is not None:
            prior = self.lineage(stage)
            if prior is not None:
                return self._materialize_hinted(
                    stage, input_df, compute_fn, dirty_from, prior
                )
        data_path, lin_path = self._paths(stage)
        bucketed = self._bucket(input_df)
        current = self._fingerprints(bucketed).persist()

        prior = self.lineage(stage)
        if prior is None:
            dirty_buckets = None  # everything
        else:
            joined = current.alias("c").join(
                prior.select(
                    F.col(BUCKET_COL), F.col("input_hash").alias("prior_hash")
                ).alias("p"),
                BUCKET_COL,
                "full",
            )
            dirty = joined.filter(
                F.col("prior_hash").isNull()
                | F.col("input_hash").isNull()
                | (F.col("input_hash") != F.col("prior_hash"))
            )
            dirty_buckets = [r[BUCKET_COL] for r in dirty.collect()]
            if not dirty_buckets:
                from pyspark.errors import AnalysisException

                try:
                    cached = self.spark.read.parquet(data_path)
                    current.unpersist()
                    return cached.drop(BUCKET_COL)
                except AnalysisException:
                    # previous run produced zero rows everywhere (no part
                    # files to infer a schema from): recompute fully
                    dirty_buckets = None
            # Dynamic partition overwrite only rewrites partitions the new
            # output *contains*: a dirty bucket whose recompute yields zero
            # rows, or a bucket whose input vanished entirely, would keep
            # its stale partition on disk and be read back as current.
            # Delete every dirty/removed bucket's partition up front
            # (batched: one listStatus, bounded deletes).
            if dirty_buckets:
                self._delete_dirty_partitions(data_path, dirty_buckets)

        t0 = time.time()
        if dirty_buckets is None:
            to_compute = bucketed
        else:
            to_compute = bucketed.filter(F.col(BUCKET_COL).isin(dirty_buckets))
        out = compute_fn(to_compute)
        if BUCKET_COL not in out.columns:
            out = self._bucket(out)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_path)
        wall_ms = int((time.time() - t0) * 1000)

        # An entirely-empty checkpoint (every bucket recomputed to zero
        # rows) has no part files, so a schemaless parquet read cannot
        # infer a schema — read back with the computed schema and fall
        # back to an empty frame.
        from pyspark.errors import AnalysisException

        try:
            data = self.spark.read.schema(out.schema).parquet(data_path)
        except AnalysisException:
            data = self.spark.createDataFrame([], out.schema)

        # lineage/metrics rows for the recomputed buckets
        out_counts = data.groupBy(BUCKET_COL).agg(
            F.count(F.lit(1)).alias("rows_out")
        )
        lineage_rows = (
            current.join(out_counts, BUCKET_COL, "left")
            .select(
                F.lit(stage).alias("stage"),
                F.col(BUCKET_COL),
                "input_hash",
                "rows_in",
                F.coalesce(F.col("rows_out"), F.lit(0)).alias("rows_out"),
                F.lit(wall_ms).alias("wall_ms"),
                F.current_timestamp().alias("ts"),
            )
        )
        lineage_rows.write.mode("overwrite").parquet(lin_path)
        current.unpersist()
        return data.drop(BUCKET_COL)

    def _materialize_hinted(
        self,
        stage: str,
        input_df: DataFrame,
        compute_fn,
        dirty_from: DataFrame,
        prior: DataFrame,
    ) -> DataFrame:
        """Hinted refresh (see ``materialize``): dirty buckets come from
        the hint's keys (one O(batch) distinct), fingerprints are taken
        only over those buckets' current content, prior lineage rows of
        clean buckets are carried over untouched."""
        data_path, lin_path = self._paths(stage)
        dirty_buckets = [
            r[BUCKET_COL]
            for r in self._bucket(dirty_from.select(self.key_col))
            .select(BUCKET_COL)
            .distinct()
            .collect()
        ]
        if not dirty_buckets:
            from pyspark.errors import AnalysisException

            try:
                return self.spark.read.parquet(data_path).drop(BUCKET_COL)
            except AnalysisException:
                # prior lineage without readable data (all-empty prior
                # run): repair through the exhaustive path
                return self.materialize(stage, input_df, compute_fn)

        bucketed = self._bucket(input_df)
        to_compute = bucketed.filter(
            F.col(BUCKET_COL).isin(dirty_buckets)
        ).persist()
        # exact content hashes of the dirty buckets (shares to_compute's
        # one scan with the recompute below — no full-corpus fingerprint)
        current = self._fingerprints(to_compute).persist()
        self._delete_dirty_partitions(data_path, dirty_buckets)

        t0 = time.time()
        out = compute_fn(to_compute)
        if BUCKET_COL not in out.columns:
            out = self._bucket(out)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_path)
        out_schema = out.schema
        wall_ms = int((time.time() - t0) * 1000)

        from pyspark.errors import AnalysisException

        try:
            data = self.spark.read.schema(out_schema).parquet(data_path)
        except AnalysisException:
            data = self.spark.createDataFrame([], out_schema)

        # rows_out for the recomputed buckets only: the data table IS
        # partitioned by bucket, so this read is partition-pruned
        out_counts = (
            data.filter(F.col(BUCKET_COL).isin(dirty_buckets))
            .groupBy(BUCKET_COL)
            .agg(F.count(F.lit(1)).alias("rows_out"))
        )
        dirty_rows = current.join(out_counts, BUCKET_COL, "left").select(
            F.lit(stage).alias("stage"),
            F.col(BUCKET_COL),
            "input_hash",
            "rows_in",
            F.coalesce(F.col("rows_out"), F.lit(0)).alias("rows_out"),
            F.lit(wall_ms).alias("wall_ms"),
            F.current_timestamp().alias("ts"),
        )
        clean_rows = prior.filter(~F.col(BUCKET_COL).isin(dirty_buckets))
        lineage_rows = clean_rows.select(dirty_rows.columns).unionByName(
            dirty_rows
        )
        # prior is read from lin_path — materialize the merge before the
        # overwrite truncates its own source
        merged = lineage_rows.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(lin_path)
        current.unpersist()
        to_compute.unpersist()
        return data.drop(BUCKET_COL)
