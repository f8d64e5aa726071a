"""SparkSession construction with the scale-oriented defaults this engine
assumes: AQE (runtime re-planning + skew-join splitting), Arrow-based
pandas UDF transfer, and a shuffle-partition count sized for the target
rather than Spark's legacy default of 200.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ship_package"]


def ship_package(spark: SparkSession) -> None:
    """Ship aida_spark to the executors (the programmatic equivalent of
    ``spark-submit --py-files aida_spark.zip``). Needed whenever the driver
    is not launched from the repo root; idempotent."""
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = sorted(
        os.path.join(root, f)
        for root, _dirs, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    )
    digest = hashlib.md5()
    for path in sources:
        with open(path, "rb") as fh:
            digest.update(path.encode())
            digest.update(fh.read())
    # Content-addressed filename + atomic rename: concurrent sessions must
    # never truncate a zip another session's workers are importing from.
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"aida_spark_pyfiles_{digest.hexdigest()[:12]}.zip",
    )
    if not os.path.exists(zip_path):
        tmp_path = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp_path, "w") as zf:
            for full in sources:
                rel = os.path.join("aida_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
        os.replace(tmp_path, zip_path)
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "aida_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting, plan re-optimization
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Data size is a bad proxy for the CPU cost of the per-conversation
        # solve UDF: without this, AQE coalesces the cogroup shuffle to a
        # couple of 1MB+ partitions and serializes the solve stage.
        # parallelismFirst + tiny minPartitionSize keeps coalescing bounded
        # below by defaultParallelism instead of by partition bytes.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8k")
        # Arrow for pandas UDF / applyInPandas transfer (vectorized batches)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # don't let tiny dim tables trigger shuffles
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark
