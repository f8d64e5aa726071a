"""Approximate / exact nearest-neighbor search over an embedding column
(array<float>).

- ``brute_force_topk``: exact cosine top-k. The candidate scoring is an
  Arrow-batched numpy kernel (``cosine_sim_arrow``): one BLAS-grade
  row-wise dot per batch. The earlier ``zip_with`` + ``aggregate`` form
  is kept as ``cosine_sim_col`` for SQL-expressible call sites, but note
  that Catalyst evaluates higher-order-function lambdas INTERPRETED, per
  element — measured ~6x slower than the Arrow kernel on the rerank
  paths (the same lesson as semantic_dedup's r5 rewrite, BENCH.md §5).
  The query side is broadcast, so the plan is a BroadcastNestedLoopJoin
  over a narrow scan: at 100 TB the base table streams once, no shuffle
  of the big side.
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
from pyspark.sql.types import ArrayType, DoubleType, LongType

__all__ = [
    "cosine_sim_col",
    "cosine_sim_arrow",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
    "IvfIndex",
    "ivf_build",
    "ivf_query",
    "ivf_load",
    "LshIndex",
    "lsh_build",
    "lsh_query",
]


def cosine_sim_col(a, b):
    """Cosine similarity between two array<float/double> columns, as a
    Catalyst expression (zip_with dot product / norms). CAUTION: Catalyst
    interprets HOF lambdas per element — use :func:`cosine_sim_arrow` on
    candidate-volume paths (guide §4.2)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


@F.pandas_udf(DoubleType())
def cosine_sim_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched exact cosine: one numpy pass per batch (row-wise dot
    + norms) instead of ~3*dim interpreted Catalyst lambda calls per row.
    Same math; float accumulation order differs from the sequential fold
    only at the last-ulp level, far below the 1e-9 value rounding of the
    oracle comparisons and the rank margins of the top-k paths."""
    if len(a) == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    dot = np.einsum("ij,ij->i", A, B)
    na = np.sqrt(np.einsum("ij,ij->i", A, A))
    nb = np.sqrt(np.einsum("ij,ij->i", B, B))
    return pd.Series(dot / (na * nb))


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
        "sim", cosine_sim_arrow(F.col("qvec"), F.col("bvec"))
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


def _sign_lsh_buckets_udf(n_planes: int, n_tables: int, seed: int,
                          dim: int | None = None):
    """Shared bucket-code UDF for the sign-LSH build and query sides —
    both MUST hash with the same seed-derived hyperplanes."""
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
        codes = np.empty((len(mat), n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (mat @ all_planes[t]) > 0
            codes[:, t] = bits @ weights + (t << n_planes)
        return pd.Series(list(codes))

    return buckets_udf


class LshIndex:
    """A built sign-LSH index: the bucketed base table plus the hashing
    parameters (hyperplanes are re-derived from the seed — only the
    params need to survive, not the matrices). Build once, serve many
    query batches; call :meth:`unpersist` when done."""

    def __init__(self, bucketed: DataFrame, n_planes: int, n_tables: int,
                 seed: int):
        self.bucketed = bucketed
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed

    def unpersist(self) -> None:
        self.bucketed.unpersist()


def lsh_build(
    base: DataFrame,
    dim: int | None = None,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    persist: bool = True,
) -> LshIndex:
    """Bucket-assignment phase of multi-table sign-LSH: one narrow
    Arrow-batched pass computes ``n_tables`` bucket codes per vector.
    ``dim`` may be omitted: hyperplanes are derived lazily inside the
    Arrow UDF from the first batch's vector length (deterministic given
    the seed), so omitting it never costs a driver-side lookup job."""
    buckets_udf = _sign_lsh_buckets_udf(n_planes, n_tables, seed, dim)
    bucketed = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("bvec"),
        F.explode(buckets_udf(F.col(vec_col))).alias("bucket"),
    )
    if persist:
        from pyspark import StorageLevel

        bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)
        bucketed.count()
    return LshIndex(bucketed, n_planes, n_tables, seed)


def lsh_query(
    index: LshIndex,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve one query batch from a built LSH index: candidates =
    same-(table, bucket) pairs, deduped, exact-cosine reranked."""
    buckets_udf = _sign_lsh_buckets_udf(
        index.n_planes, index.n_tables, index.seed
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        F.explode(buckets_udf(F.col(vec_col))).alias("bucket"),
    )
    cand = (
        index.bucketed.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("sim", cosine_sim_arrow(F.col("qvec"), F.col("bvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


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
    index: LshIndex | None = None,
) -> DataFrame:
    """One-shot multi-table sign-LSH ANN = :func:`lsh_build` +
    :func:`lsh_query`. Recall grows with n_tables (union of probes),
    bucket size shrinks with n_planes — the classic tradeoff. The
    candidate join is an equi-join on (table, bucket): at scale the base
    side shuffles once on a uniform hash key. The one-shot path builds
    WITHOUT persisting; pass a prebuilt ``index`` to serve repeated
    query batches from one bucket-assignment pass."""
    if index is None:
        index = lsh_build(
            base,
            dim=dim,
            n_planes=n_planes,
            n_tables=n_tables,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            persist=False,
        )
    return lsh_query(index, queries, k=k, id_col=id_col, vec_col=vec_col)


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


class IvfIndex:
    """A built IVF index: trained centroids + the cell-assigned base
    table. Build ONCE, serve many query batches — a 100-TB corpus must
    not re-train k-means and re-assign every vector per query batch
    (the r3 ``ivf_topk`` did exactly that). The Spark analogue of the
    reference's precomputed ``entity_lsh_signatures_2000`` table
    (DataAccessSQL.java:74,657).

    ``assigned`` is (neighbor_id, bvec, cell); when built with
    ``persist=True`` it is cached+materialized so every query batch
    reads the in-memory copy (plan shows InMemoryTableScan, no second
    assignment pass) — call :meth:`unpersist` when done. ``save``/
    :func:`ivf_load` round-trip the index through storage (Parquet +
    centroid .npy) for cross-session reuse."""

    def __init__(self, centers: np.ndarray, assigned: DataFrame):
        self.centers = centers
        self.assigned = assigned

    def unpersist(self) -> None:
        self.assigned.unpersist()

    def save(self, path: str) -> None:
        """Both parts write through Spark, so ``path`` may be any
        supported filesystem (file://, hdfs://, s3a://) — the centroid
        table is tiny (n_centroids rows) but storage-agnosticism beats
        a driver-local .npy that a cluster deployment cannot read."""
        spark = self.assigned.sparkSession
        self.assigned.write.mode("overwrite").parquet(f"{path}/assigned")
        rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(self.centers)
        ]
        spark.createDataFrame(
            rows, "cell long, center array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centers")


def ivf_load(spark, path: str) -> IvfIndex:
    """Load an :class:`IvfIndex` previously written by ``save`` (the
    assigned table streams from Parquet — partition pruning on ``cell``
    applies when the consumer filters cells; the centroid collect is
    bounded at n_centroids rows)."""
    crows = spark.read.parquet(f"{path}/centers").collect()
    centers = np.array(
        [r["center"] for r in sorted(crows, key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    assigned = spark.read.parquet(f"{path}/assigned")
    return IvfIndex(centers, assigned)


def ivf_build(
    base: DataFrame,
    n_centroids: int = 64,
    sample_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    persist: bool = True,
) -> IvfIndex:
    """Train + assign phase of IVF ANN:

    1. train ``n_centroids`` spherical k-means centroids on a BOUNDED
       sample (deterministic, seeded);
    2. assign every base vector to its nearest centroid (one narrow
       Arrow-batched pass) -> inverted lists keyed by ``cell``.

    The training sample is the ``sample_size`` rows with the smallest
    ``xxhash64(id, seed)`` — a deterministic uniform sample executed as a
    distributed top-n (per-partition heaps, driver merge of sample_size
    rows only). Unlike ``limit()``, it is NOT first-partition-biased: on
    a corpus sorted/clustered by region the sample still spans all
    regions, so the k-means centroids cover every cluster.

    ``persist=False`` keeps the assignment a lazy plan (for one-shot use
    where caching would only add memory pressure)."""
    take = (
        base.select(
            F.col(vec_col), F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h")
        )
        .orderBy("_h")
        .limit(sample_size)
        .collect()
    )
    sample = np.array([r[0] for r in take], dtype=np.float64)
    centers = _train_centroids_sample(sample, n_centroids, seed)

    @F.pandas_udf(LongType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ centers.T).argmax(axis=1).astype(np.int64))

    assigned = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("bvec"),
        cell_udf(F.col(vec_col)).alias("cell"),
    )
    if persist:
        from pyspark import StorageLevel

        assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        assigned.count()
    return IvfIndex(centers, assigned)


def ivf_query(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve one query batch from a built IVF index: each query probes
    its ``n_probe`` nearest cells; candidates meet queries in an
    equi-join on ``cell`` (broadcast query side); exact cosine rerank
    inside the probed cells only. Recall grows with n_probe (fraction of
    cells scanned)."""
    centers = index.centers
    n_probe_eff = min(n_probe, centers.shape[0])

    @F.pandas_udf(ArrayType(LongType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ centers.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe_eff]
        return pd.Series(list(order.astype(np.int64)))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"),
    )
    cand = index.assigned.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn("sim", cosine_sim_arrow(F.col("qvec"), F.col("bvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


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
    index: IvfIndex | None = None,
) -> DataFrame:
    """One-shot IVF ANN = :func:`ivf_build` + :func:`ivf_query` (see
    those for the scale shape). The one-shot path builds WITHOUT
    persisting (nothing outlives the returned plan); pass a prebuilt
    ``index`` to serve repeated query batches from one assignment pass.
    ``dim`` is accepted for API symmetry and ignored (centroid dim comes
    from the sample)."""
    if index is None:
        index = ivf_build(
            base,
            n_centroids=n_centroids,
            sample_size=sample_size,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            persist=False,
        )
    return ivf_query(
        index, queries, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )
