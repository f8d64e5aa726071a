"""Approximate / exact nearest-neighbor search over an embedding column
(array<float>).

- ``brute_force_topk``: exact cosine top-k. The dot product is
  ``F.zip_with`` + ``F.aggregate`` — JVM-side, codegen'd. The query side is
  broadcast, so the plan is a BroadcastNestedLoopJoin over a narrow scan:
  at 100 TB the base table streams once, no shuffle of the big side.
- ``lsh_bucketed_topk``: random-hyperplane (sign) LSH — the scale path.
  Bucket ids are computed in one vectorized numpy pass (Arrow batch),
  candidates meet queries in an equi-join on bucket id, exact rerank
  within buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "cosine_sim_col",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
]


def cosine_sim_col(a, b):
    """Cosine similarity between two array<float/double> columns, as a
    Catalyst expression (zip_with dot product / norms)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, sim). Queries are
    broadcast; rank ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("bvec"),
    )
    joined = b.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "sim", cosine_sim_col(F.col("qvec"), F.col("bvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def lsh_bucketed_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Multi-table sign-LSH ANN: ``n_tables`` independent hash tables of
    ``n_planes`` sign bits each; candidates = same-(table, bucket) pairs,
    deduped, exact-cosine reranked. Recall grows with n_tables (union of
    probes), bucket size shrinks with n_planes — the classic tradeoff.
    The candidate join is an equi-join on (table, bucket): at scale the
    base side shuffles once on a uniform hash key.

    ``dim`` may be omitted: hyperplanes are derived lazily inside the
    Arrow UDF from the first batch's vector length (deterministic given
    the seed), so omitting it never costs a driver-side lookup job."""
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    plane_cache: dict[int, np.ndarray] = {}
    if dim is not None:
        plane_cache[dim] = np.stack(
            [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
        )  # (tables, dim, planes)

    def _planes_for(d: int) -> np.ndarray:
        if d not in plane_cache:
            plane_cache[d] = np.stack(
                [_hyperplanes(d, n_planes, seed + t) for t in range(n_tables)]
            )
        return plane_cache[d]

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim)
        all_planes = _planes_for(mat.shape[1])
        out = []
        codes = np.empty((len(mat), n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (mat @ all_planes[t]) > 0
            codes[:, t] = bits @ weights + (t << n_planes)
        for row in codes:
            out.append(row)
        return pd.Series(out)

    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("bvec"),
        F.explode(buckets_udf(F.col(vec_col))).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        F.explode(buckets_udf(F.col(vec_col))).alias("bucket"),
    )
    cand = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("sim", cosine_sim_col(F.col("qvec"), F.col("bvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _train_centroids_sample(
    sample: np.ndarray, n_centroids: int, seed: int, iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded driver-side sample
    (Lloyd iterations on L2-normalized vectors; empty cells re-seeded from
    the sample). The sample is O(sample_size), never O(corpus) — the same
    bounded-driver pattern MLlib's k-means uses for its aggregation step."""
    rng = np.random.RandomState(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    x = sample / np.maximum(norms, 1e-12)
    centers = x[rng.choice(len(x), size=n_centroids, replace=len(x) < n_centroids)]
    for _ in range(iters):
        assign = (x @ centers.T).argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members) == 0:
                centers[c] = x[rng.randint(len(x))]
                continue
            m = members.mean(axis=0)
            centers[c] = m / max(np.linalg.norm(m), 1e-12)
    return centers


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) ANN — the clustered alternative to sign-LSH:

    1. train ``n_centroids`` spherical k-means centroids on a BOUNDED
       sample (deterministic, seeded);
    2. assign every base vector to its nearest centroid (one narrow
       Arrow-batched pass) -> inverted lists keyed by ``cell``;
    3. each query probes its ``n_probe`` nearest cells; candidates meet
       queries in an equi-join on ``cell`` (broadcast query side);
    4. exact cosine rerank inside the probed cells only.

    Scale shape: the base table is scanned once for assignment and
    shuffles once on the cell key (cells are ~corpus/n_centroids wide —
    pick n_centroids ~ sqrt(corpus) so cells stay bounded); queries
    broadcast. Recall grows with n_probe (fraction of cells scanned).

    The training sample is the ``sample_size`` rows with the smallest
    ``xxhash64(id, seed)`` — a deterministic uniform sample executed as a
    distributed top-n (per-partition heaps, driver merge of sample_size
    rows only). Unlike ``limit()``, it is NOT first-partition-biased: on
    a corpus sorted/clustered by region the sample still spans all
    regions, so the k-means centroids cover every cluster.
    """
    take = (
        base.select(
            F.col(vec_col), F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h")
        )
        .orderBy("_h")
        .limit(sample_size)
        .collect()
    )
    sample = np.array([r[0] for r in take], dtype=np.float64)
    if dim is None:
        dim = sample.shape[1]
    centers = _train_centroids_sample(sample, n_centroids, seed)

    from pyspark.sql.types import LongType as _Long

    @F.pandas_udf(_Long())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ centers.T).argmax(axis=1).astype(np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ centers.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("bvec"),
        cell_udf(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"),
    )
    cand = b.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn("sim", cosine_sim_col(F.col("qvec"), F.col("bvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
