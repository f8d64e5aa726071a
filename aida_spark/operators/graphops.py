"""Distributed graph operators for dedup post-processing: connected
components over the near-duplicate pair graph, turning pairwise matches
into dedup CLUSTERS (pick one representative per component).

Scale shape: min-label propagation expressed as DataFrame joins — each
iteration is one equi-join (labels onto the symmetrized edge list) plus
one min-aggregate, i.e. two hash shuffles on uniformly distributed node
ids, no driver-side graph. Near-dup graphs from banded LSH are unions of
near-cliques (diameter ~2-3 after the exact-dedup pre-pass collapses
identical texts), so propagation converges in ~3 rounds; the loop is
capped and convergence-checked with a cheap count per round. For
general graphs with long chains, swap in large-star/small-star — for
dedup clusters the simple propagation is strictly less shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) where component = min node id reachable through
    the undirected ``edges``. Nodes absent from every edge keep their own
    id (singleton clusters). Deterministic; converges when a full round
    changes no label.

    The returned labels DataFrame is persisted (it was just used for the
    convergence check; re-deriving it would replay every round) — callers
    should ``unpersist()`` it once materialized. All intermediates are
    released before returning."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("u"), F.col(src_col).alias("v")
            )
        )
        .distinct()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    )
    sym = sym.persist()
    labels = labels.persist()
    try:
        for _ in range(max_iter):
            # each node proposes its current label to every neighbor
            proposals = sym.join(
                labels, sym["u"] == labels["node"]
            ).select(F.col("v").alias("node"), "component")
            new_labels = (
                labels.unionByName(proposals)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        sym.unpersist()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate clusters: connected components over a pair list
    (e.g. ``minhash_lsh_pairs`` output), every document included (docs
    with no near-dup form singleton clusters), plus the keep/drop
    decision (keep = the minimum id of the cluster). Returns
    (doc_id, cluster_id, keep)."""
    nodes = docs.select(F.col(id_col).alias("id")).distinct()
    cc = connected_components(nodes, pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )
