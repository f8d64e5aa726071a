"""Executor-side KB artifacts: the word-level lookup structures the
spotting and solve UDFs need (mention-key set, first-word prefilter,
word ids, expansions, stopword ids) — written ONCE by Spark executors and
lazy-loaded on each worker via SparkFiles.

Why not ``df.collect()`` + ``sc.broadcast`` (the reference's
DataAccessCache preload, DataAccessCache.java:46-110): at YAGO scale the
dictionary is ~3M entities / >10M surface forms — collecting that through
the driver is multi-GB of Python objects plus a pickled broadcast, a
single-node bottleneck in an otherwise distributed plan. Here the driver
never materializes a row.

Per-worker memory is bounded the way the reference's mmapped DMaps bound
it (access/DataAccessDMap.java, README.md:462-526), re-expressed for
Spark's process model:

- String-keyed structures are published as **64-bit hash columns**
  (deterministic blake2b-8, computed Spark-side in a vectorized UDF at
  publish time), so workers never materialize the strings at all — a
  10M-name set costs 80 MB of int64, not >1 GB of Python str objects.
- Probes are ``np.searchsorted`` over a **sorted array memory-mapped
  from a node-local .npy cache**: the first worker on a node sorts and
  writes the array next to the SparkFiles copy; every other worker on
  that node mmaps the same file, so the bytes live once per NODE in the
  OS page cache, not once per worker process (``load factor`` per extra
  worker ~ 0).
- Int-keyed maps (word expansions) keep exact keys — sorted int64
  key/value arrays, no hashing, no collisions.

Hash-membership false positives (p = n/2^64 per probe, ~5e-13 at 10M
keys) USUALLY only add a *no-candidate* spotted mention: the downstream
dictionary equi-join finds nothing for it, it resolves to OOKBE and
emits no triple. Two sharper failure modes exist and are accepted at
their measured odds rather than zero (at the 10^12-turn design point the
EXPECTED number of affected mentions is O(1) corpus-wide):

- spotting is longest-match-wins (core/text.py), so a false positive on
  a LONGER n-gram shadows a genuine shorter dictionary key inside it —
  that real mention is lost for the conversation, not merely turned into
  an extra OOKBE;
- a ``CompactHashMap`` word->id key collision silently returns the other
  word's id (two distinct context words conflated for scoring).

Deployments that cannot accept either can re-verify accepted spans
against the exact string dictionary (the equi-join in stage B already
carries the true mention strings) before letting a longer match suppress
shorter ones — at the cost of shipping candidate strings into stage A.

- ``publish_table`` writes a table as a small number of Parquet parts
  (the write runs on executors) and registers each with
  ``SparkContext.addFile`` — Spark's torrent-style file distribution. On
  a real cluster, point ``dir_hint`` at shared storage (hdfs://, s3a://);
  addFile accepts those URIs directly.
- ``load_*`` lazy-load the artifact with pyarrow inside the UDF, once per
  Python worker process, into a module-level cache (workers are reused
  across tasks, so the parse cost amortizes like a broadcast's unpickle).
"""

from __future__ import annotations

import atexit
import glob
import hashlib
import os
import shutil
import tempfile
from collections.abc import Mapping

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "hash64",
    "publish_table",
    "publish_hash_set",
    "publish_hash_map",
    "SortedHashSet",
    "CompactHashMap",
    "SortedIntMap",
    "load_hash_set",
    "load_hash_map",
    "load_int_int_map",
    "load_int_set",
    "cleanup_published_artifacts",
]

# per-worker-process artifact cache: artifact file name -> parsed object
_CACHE: dict = {}

# local temp dirs created by publish_* (cleaned at interpreter exit or
# via cleanup_published_artifacts); user-supplied dir_hints are not ours
_TEMP_DIRS: list[str] = []


def hash64(s: str) -> int:
    """Deterministic 64-bit string hash (blake2b, 8-byte digest) as a
    signed int64 — identical on every process/platform, so hashes
    computed Spark-side at publish time match worker-side probe hashes."""
    v = int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )
    return v - (1 << 64) if v >= (1 << 63) else v


def cleanup_published_artifacts() -> None:
    while _TEMP_DIRS:
        shutil.rmtree(_TEMP_DIRS.pop(), ignore_errors=True)


atexit.register(cleanup_published_artifacts)


# ---------------------------------------------------------------------------
# publish (driver side; writes run on executors)
# ---------------------------------------------------------------------------

def publish_table(
    spark: SparkSession,
    df: DataFrame,
    dir_hint: str | None = None,
    n_parts: int = 1,
):
    """Write ``df`` as ``<= n_parts`` Parquet part files via Spark and
    register each with addFile. Returns the artifact handle: one basename
    (str) for a single part, a tuple of basenames otherwise. Large tables
    should pass n_parts > 1 so the write is not funneled through a single
    executor task (part files carry a per-write UUID, so repeated
    publishes never collide)."""
    import uuid

    if dir_hint is None:
        base = tempfile.mkdtemp(prefix="aida_kb_artifacts_")
        _TEMP_DIRS.append(base)
    else:
        base = dir_hint
    path = os.path.join(base, f"t_{uuid.uuid4().hex}")
    df.coalesce(n_parts).write.mode("overwrite").parquet(path)
    if "://" in base:
        # shared storage: list via Hadoop FS
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        parts = sorted(
            f.getPath().toString()
            for f in fs.listStatus(hpath)
            if f.getPath().getName().startswith("part-")
            and f.getPath().getName().endswith(".parquet")
        )
    else:
        parts = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert parts, f"no part files under {path}"
    for p in parts:
        spark.sparkContext.addFile(p)
    names = tuple(os.path.basename(p) for p in parts)
    return names[0] if len(names) == 1 else names


def _hash_udf(first_word: bool = False):
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def h(col: pd.Series) -> pd.Series:
        if first_word:
            # EXACTLY core.text.first_words_upper's rule, evaluated in
            # Python: k.split(" ", 1)[0].upper(). Publish and probe must
            # share ONE case-mapping implementation — JVM
            # String.toUpperCase is default-locale-sensitive and its
            # Unicode mapping can diverge from Python's (Turkish-locale
            # 'i'->'İ', 'ß'->'SS' vs 'ẞ'), and a publish/probe hash
            # mismatch here is a silent false NEGATIVE (the mention is
            # never spotted), unlike the benign false-positive direction
            # of hash collisions.
            return col.map(lambda s: hash64(s.split(" ", 1)[0].upper()))
        return col.map(hash64)

    return h


def publish_hash_set(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    first_word: bool = False,
    dir_hint: str | None = None,
    n_parts: int = 8,
):
    """Publish the distinct blake2b-64 hashes of ``df[col]`` (optionally
    of each value's uppercased first word — the spotting prefilter). The
    artifact contains ONLY int64 hashes: workers never see the strings.
    The first-word transform runs inside the same Python UDF that hashes,
    so the publish-time case mapping is bit-identical to the probe-time
    one (``core.text.first_words_upper``) for all of Unicode."""
    from pyspark.sql import functions as F

    hashes = df.select(
        _hash_udf(first_word=first_word)(F.col(col)).alias("h")
    ).distinct()
    return publish_table(spark, hashes, dir_hint, n_parts=n_parts)


def publish_hash_map(
    spark: SparkSession,
    df: DataFrame,
    kcol: str,
    vcol: str,
    dir_hint: str | None = None,
    n_parts: int = 8,
):
    """Publish (hash64(key), value) for a string->int lookup table."""
    from pyspark.sql import functions as F

    kv = df.select(
        _hash_udf()(F.col(kcol)).alias("h"),
        F.col(vcol).cast("long").alias("v"),
    )
    return publish_table(spark, kv, dir_hint, n_parts=n_parts)


# ---------------------------------------------------------------------------
# compact lookup structures (worker side)
# ---------------------------------------------------------------------------

class SortedHashSet:
    """String membership via binary search over a sorted int64 hash
    array (possibly a read-only mmap shared by every worker on the node).
    8 bytes/key; O(log n) probes."""

    __slots__ = ("_arr",)

    def __init__(self, arr: np.ndarray):
        self._arr = arr

    def __contains__(self, key: str) -> bool:
        h = hash64(key)
        arr = self._arr
        i = int(arr.searchsorted(h))
        return i < arr.shape[0] and int(arr[i]) == h

    def __len__(self) -> int:
        return int(self._arr.shape[0])


class CompactHashMap:
    """str -> int lookup: sorted int64 hash keys + parallel int64 values.
    Supports only get/__contains__ (original keys are not recoverable)."""

    __slots__ = ("_keys", "_vals")

    def __init__(self, keys: np.ndarray, vals: np.ndarray):
        self._keys = keys
        self._vals = vals

    def get(self, key: str, default=None):
        h = hash64(key)
        keys = self._keys
        i = int(keys.searchsorted(h))
        if i < keys.shape[0] and int(keys[i]) == h:
            return int(self._vals[i])
        return default

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __len__(self) -> int:
        return int(self._keys.shape[0])


class SortedIntMap(Mapping):
    """Exact int -> int map over sorted parallel int64 arrays (full
    Mapping protocol, so it composes with ChainMap overlays)."""

    __slots__ = ("_keys", "_vals")

    def __init__(self, keys: np.ndarray, vals: np.ndarray):
        self._keys = keys
        self._vals = vals

    def __getitem__(self, k: int) -> int:
        keys = self._keys
        i = int(keys.searchsorted(k))
        if i < keys.shape[0] and int(keys[i]) == k:
            return int(self._vals[i])
        raise KeyError(k)

    def get(self, k, default=None):
        keys = self._keys
        i = int(keys.searchsorted(k))
        if i < keys.shape[0] and int(keys[i]) == k:
            return int(self._vals[i])
        return default

    def __iter__(self):
        return (int(k) for k in self._keys)

    def __len__(self) -> int:
        return int(self._keys.shape[0])


# ---------------------------------------------------------------------------
# load (worker side)
# ---------------------------------------------------------------------------

def _part_paths(artifact) -> list[str]:
    from pyspark import SparkFiles

    names = (artifact,) if isinstance(artifact, str) else tuple(artifact)
    return [SparkFiles.get(n) for n in names]


def _artifact_key(artifact) -> str:
    return artifact if isinstance(artifact, str) else "|".join(artifact)


def _read_columns(artifact, cols: list[str]) -> list[np.ndarray]:
    out: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    for path in _part_paths(artifact):
        t = pq.read_table(path, columns=cols)
        for c in cols:
            out[c].append(
                t[c].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            )
    return [
        np.concatenate(out[c]) if out[c] else np.empty(0, dtype=np.int64)
        for c in cols
    ]


def _node_cached_npy(artifact, tag: str, build) -> np.ndarray:
    """Node-local derived-array cache: the first worker on a node builds
    the sorted array and writes it (atomic rename) into the SparkFiles
    directory; everyone mmaps it read-only. This is the Spark analogue of
    the reference's mmapped DMaps — the array's pages live once per node
    in the OS page cache regardless of worker count. Falls back to a
    private in-memory array if the directory is not writable."""
    from pyspark import SparkFiles

    first = _part_paths(artifact)[0]
    path = f"{first}.{tag}.npy"
    try:
        if not os.path.exists(path):
            arr = build()
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, path)
        return np.load(path, mmap_mode="r")
    except OSError:
        return build()


def load_hash_set(artifact) -> SortedHashSet:
    key = (_artifact_key(artifact), "hset")
    if key not in _CACHE:
        arr = _node_cached_npy(
            artifact, "hset", lambda: np.sort(_read_columns(artifact, ["h"])[0])
        )
        _CACHE[key] = SortedHashSet(arr)
    return _CACHE[key]


def load_hash_map(artifact) -> CompactHashMap:
    key = (_artifact_key(artifact), "hmap")
    if key not in _CACHE:

        def build():
            k, v = _read_columns(artifact, ["h", "v"])
            order = np.argsort(k, kind="stable")
            return np.stack([k[order], v[order]])

        kv = _node_cached_npy(artifact, "hmap", build)
        _CACHE[key] = CompactHashMap(kv[0], kv[1])
    return _CACHE[key]


def load_int_int_map(artifact, kcol: str, vcol: str) -> SortedIntMap:
    key = (_artifact_key(artifact), "iimap", kcol, vcol)
    if key not in _CACHE:

        def build():
            k, v = _read_columns(artifact, [kcol, vcol])
            order = np.argsort(k, kind="stable")
            return np.stack([k[order], v[order]])

        kv = _node_cached_npy(artifact, f"ii_{kcol}_{vcol}", build)
        _CACHE[key] = SortedIntMap(kv[0], kv[1])
    return _CACHE[key]


def load_int_set(artifact, col: str) -> frozenset:
    """Small int sets (stopword ids: hundreds of entries) stay a real
    frozenset — O(1) probes beat searchsorted at this size."""
    key = (_artifact_key(artifact), "iset", col)
    if key not in _CACHE:
        _CACHE[key] = frozenset(int(v) for v in _read_columns(artifact, [col])[0])
    return _CACHE[key]
