"""Executor-side KB artifacts: the word-level lookup structures the
spotting and solve UDFs need (mention-key set, word ids, expansions,
stopword ids) — written ONCE as Parquet by Spark executors and lazy-loaded
on each worker via SparkFiles.

Why not ``df.collect()`` + ``sc.broadcast`` (the reference's
DataAccessCache preload, DataAccessCache.java:46-110): at YAGO scale the
dictionary is ~3M entities / >10M surface forms — collecting that through
the driver is multi-GB of Python objects plus a pickled broadcast, a
single-node bottleneck in an otherwise distributed plan. Here the driver
never materializes a row:

- ``publish_table`` writes the table as one Parquet file (the write runs
  on an executor) and registers it with ``SparkContext.addFile`` — Spark's
  own torrent-style file distribution. On a real cluster, point
  ``dir_hint`` at shared storage (hdfs://, s3a://); addFile accepts those
  URIs directly.
- ``load_*`` lazy-load the artifact with pyarrow inside the UDF, once per
  Python worker process, into a module-level cache (workers are reused
  across tasks, so the parse cost amortizes like a broadcast's unpickle).

Memory note: each Python worker holds one copy of the loaded dict, same
as it would for a broadcast's deserialized value; the win is strictly the
driver's O(1) heap and the removal of the collect barrier at init.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "publish_table",
    "load_key_set",
    "load_int_set",
    "load_str_int_dict",
    "load_int_int_dict",
]

# per-worker-process artifact cache: artifact file name -> parsed object
_CACHE: dict = {}


def publish_table(
    spark: SparkSession, df: DataFrame, dir_hint: str | None = None
) -> str:
    """Write ``df`` as a single Parquet file via Spark and register it with
    addFile. Returns the artifact's unique file name (part files carry a
    per-write UUID, so repeated publishes never collide)."""
    import uuid

    base = dir_hint or tempfile.mkdtemp(prefix="aida_kb_artifacts_")
    path = os.path.join(base, f"t_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    if "://" in base:
        # shared storage: list via Hadoop FS
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        parts = [
            f.getPath().toString()
            for f in fs.listStatus(hpath)
            if f.getPath().getName().startswith("part-")
            and f.getPath().getName().endswith(".parquet")
        ]
    else:
        parts = glob.glob(os.path.join(path, "part-*.parquet"))
    assert len(parts) == 1, f"expected one part file, got {parts}"
    spark.sparkContext.addFile(parts[0])
    return os.path.basename(parts[0])


def _table(artifact: str):
    from pyspark import SparkFiles

    return pq.read_table(SparkFiles.get(artifact))


def load_key_set(artifact: str, col: str) -> frozenset:
    key = (artifact, "set", col)
    if key not in _CACHE:
        _CACHE[key] = frozenset(_table(artifact)[col].to_pylist())
    return _CACHE[key]


def load_first_words(artifact: str, col: str) -> frozenset:
    """Uppercased first words of the key set (spotting prefilter),
    derived once per worker from the cached key set."""
    key = (artifact, "fw", col)
    if key not in _CACHE:
        from .core.text import first_words_upper

        _CACHE[key] = first_words_upper(load_key_set(artifact, col))
    return _CACHE[key]


def load_int_set(artifact: str, col: str) -> frozenset:
    key = (artifact, "iset", col)
    if key not in _CACHE:
        _CACHE[key] = frozenset(int(v) for v in _table(artifact)[col].to_pylist())
    return _CACHE[key]


def load_str_int_dict(artifact: str, kcol: str, vcol: str) -> dict:
    key = (artifact, "si", kcol, vcol)
    if key not in _CACHE:
        t = _table(artifact)
        _CACHE[key] = dict(
            zip(t[kcol].to_pylist(), (int(v) for v in t[vcol].to_pylist()))
        )
    return _CACHE[key]


def load_int_int_dict(artifact: str, kcol: str, vcol: str) -> dict:
    key = (artifact, "ii", kcol, vcol)
    if key not in _CACHE:
        t = _table(artifact)
        _CACHE[key] = {
            int(k): int(v)
            for k, v in zip(t[kcol].to_pylist(), t[vcol].to_pylist())
        }
    return _CACHE[key]
