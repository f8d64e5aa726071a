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

__all__ = ["cosine_sim_col", "brute_force_topk", "lsh_bucketed_topk"]


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
    base side shuffles once on a uniform hash key."""
    if dim is None:
        dim = len(base.select(vec_col).first()[0])
    all_planes = np.stack(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (tables, dim, planes)

    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim)
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
