"""Distributed graph operators for dedup post-processing: connected
components over the near-duplicate pair graph, turning pairwise matches
into dedup CLUSTERS (pick one representative per component).

Two methods, both pure DataFrame joins (no driver-side graph):

- ``star`` (default): alternating large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) — O(log n) rounds regardless of diameter, and the edge set
  SHRINKS every round (stars collapse). Measured faster than
  propagation even on the near-clique graphs dedup produces (sf0.1
  near-dup graph: 2.3-3.0 s vs 3.2-4.8 s; synthetic 1M-node/200k-
  cluster graph: 8.8 s vs 18.4 s; 100k-node chain: 52 s where
  propagation cannot finish at all) — BENCH.md §Round 4.
- ``propagation``: min-label propagation — each round joins the FULL
  symmetrized edge list onto the labels and min-aggregates (two hash
  shuffles on uniform node ids, two hops per materialized round). The
  r3 theory that this is cheaper for shallow near-clique graphs was
  contradicted by measurement (the per-round re-join of the whole edge
  list outweighs star's edge rewriting); kept as the diameter-bounded
  alternative and as an independent implementation for cross-checking.

Both are deterministic, label every component by its minimum node id,
and RAISE (configurable) instead of silently returning wrong labels if
the round cap is exhausted before convergence.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters", "pagerank"]


def _edge_fingerprint(edges: DataFrame, a: str, b: str) -> tuple[int, int]:
    """(row count, order-independent checksum) of an edge set — one
    aggregate job; equal fingerprints on DISTINCT edge sets would need a
    summed-xxhash64 collision (~2^-64), which is below any practical
    convergence-misdetection risk."""
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(F.col(a), F.col(b)).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("chk"),
    ).collect()[0]
    return int(row["n"]), int(row["chk"])


def _star_rounds(
    edges: DataFrame, max_iter: int
) -> tuple[DataFrame, bool]:
    """Alternate large-star/small-star until the edge set is stable.
    Returns (star edges oriented (node=v > root=u), converged?).

    Each round's edge set is eagerly ``localCheckpoint``-ed: iterative
    self-referential plans DOUBLE in tree size per round (the round's
    output references its input twice — join + union), so without
    lineage truncation the logical plan grows exponentially and the
    driver OOMs just STRINGIFYING it by round ~10. Checkpointing also
    materializes the round before the previous round's blocks become
    unreferenced (the ContextCleaner reclaims them). Local checkpoints
    trade executor-loss recoverability for speed — an acceptable trade
    for a minutes-long CC loop whose input is re-derivable; a deployment
    needing fault tolerance mid-loop sets a reliable
    ``setCheckpointDir`` and swaps ``checkpoint()`` in."""
    e = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        # LAZY checkpoint: round 1's convergence probe is the
        # materializing action (the lineage truncation the checkpoint
        # exists for happens on the logical plan immediately)
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        # large-star: every neighbor v > u links to m = min(N(u) + {u});
        # works on the symmetrized view, emits edges oriented big->small
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.min("v").alias("_mn")
        ).select("u", F.least("_mn", F.col("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("c"), F.col("m").alias("p"))
            .filter(F.col("c") != F.col("p"))
            # no distinct here (r6): row count stays bounded by |sym| (one
            # row per oriented edge), the small-star min-aggregate is
            # duplicate-insensitive, and the round's OUTPUT distinct below
            # dedups — dropping it removes one shuffle per round
        )
        # small-star on the oriented (child, parent<child) list: all of a
        # child's parents collapse onto the minimum parent
        smins = large.groupBy("c").agg(F.min("p").alias("m"))
        small = (
            large.join(smins, "c")
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
            .filter(F.col("c") != F.col("p"))
            .unionByName(
                smins.select(F.col("c"), F.col("m").alias("p"))
            )
            .distinct()
            .localCheckpoint(eager=False)  # materialized by the
            # convergence probe below — one job per round (r6)
        )
        e = small.select(F.col("p").alias("u"), F.col("c").alias("v"))
        # Convergence = the edge set is already a star forest (no parent
        # is itself a child), which is exactly the two-phase contraction's
        # fixed point (Kiveris et al. §3: alternating rounds terminate on
        # rooted stars). Detecting the star DIRECTLY fires the round the
        # fixed point forms — the previous fingerprint-stability check
        # needed one extra full round to observe "no change", plus a
        # fingerprint job on the input (r6: both gone; one probe job per
        # round, which also materializes the round's checkpoint).
        nonroot_parent = (
            small.select(F.col("p").alias("n"))
            .join(small.select(F.col("c").alias("n")), "n", "left_semi")
            .limit(1)
            .count()
        )
        if nonroot_parent == 0:
            converged = True
            break
    # e holds (root=u < node=v) star edges at convergence
    return e, converged


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    method: str = "star",
    on_unconverged: str = "raise",
) -> DataFrame:
    """(node, component) where component = min node id reachable through
    the undirected ``edges``. Nodes absent from every edge keep their own
    id (singleton clusters). Deterministic.

    ``method='star'`` (default) converges in O(log n) rounds regardless
    of structure and measured fastest on dedup graphs too;
    ``method='propagation'`` advances the min label TWO hops per
    materialized round (ReuseExchange dedups the intermediate hop's
    shuffle), so ``max_iter`` rounds cover a diameter of ``2*max_iter``.
    If ``max_iter`` is exhausted before a stable round, the labels would
    be WRONG — by default this raises; ``on_unconverged='warn'``
    downgrades to a warning for callers that prefer partial progress.

    The returned labels DataFrame is persisted — callers should
    ``unpersist()`` it once materialized. All intermediates are released
    before returning."""
    canon = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    )
    all_nodes = nodes.select(F.col(node_col).alias("node"))

    if method == "star":
        # NOTE (r6): disabling AQE around this loop (the pagerank
        # trick) was tried and MEASURED SLOWER (3.1 s -> 4.4 s at
        # sf0.1): unlike pagerank's stable broadcast plan, the star
        # rounds' self-joins then plan as full-width sort-merge joins
        # (64-96 task stages on KB-sized data), costing more than the
        # per-exchange adaptive re-planning saved. AQE stays on here.
        star_edges, converged = _star_rounds(canon, max_iter)
        if not converged:
            # check BEFORE persisting labels: when this raises nothing
            # is left cached (ADVICE r4 — the r4 order persisted+counted
            # first and leaked the cache on raise)
            _unconverged(max_iter, "star", on_unconverged)
        star_labels = star_edges.select(
            F.col("v").alias("node"), F.col("u").alias("component")
        )
        labels = (
            all_nodes.join(star_labels, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("component"), F.col("node")).alias(
                    "component"
                ),
            )
            .persist()
        )
        labels.count()
        return labels
    if method != "propagation":
        raise ValueError(f"unknown method {method!r}")

    sym = (
        canon.unionByName(
            canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .persist()
    )
    labels = all_nodes.select(
        "node", F.col("node").alias("component")
    ).persist()

    def one_hop(lbl: DataFrame) -> DataFrame:
        # each node proposes its current label to every neighbor
        proposals = sym.join(lbl, sym["u"] == lbl["node"]).select(
            F.col("v").alias("node"), "component"
        )
        return (
            lbl.unionByName(proposals)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )

    converged = False
    try:
        for _ in range(max_iter):
            # TWO hops per materialized round: the intermediate hop is an
            # unpersisted subplan whose shuffle Spark's ReuseExchange
            # dedups within the round — so each driver sync (the change
            # check) advances the min label two hops, halving sync count
            # per hop vs the r3 loop. The eager localCheckpoint
            # truncates the round's lineage (self-referential plans grow
            # exponentially otherwise — see _star_rounds).
            new_labels = one_hop(one_hop(labels)).localCheckpoint(eager=True)
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
                converged = True
                break
        if not converged:
            try:
                _unconverged(max_iter, "propagation", on_unconverged)
            except Exception:
                # release the labels frame before propagating (ADVICE
                # r4): round-0 labels are persist()ed; later rounds are
                # localCheckpoint frames whose blocks the ContextCleaner
                # reclaims once this reference is dropped
                labels.unpersist()
                raise
        return labels
    finally:
        sym.unpersist()


def _unconverged(max_iter: int, method: str, on_unconverged: str) -> None:
    msg = (
        f"connected_components({method=}) exhausted max_iter={max_iter} "
        "before a stable round — labels are NOT converged (a component "
        "with diameter > max_iter keeps multiple labels). Raise max_iter"
        + (", or use method='star' (O(log n) rounds)."
           if method == "propagation" else ".")
    )
    if on_unconverged == "warn":
        warnings.warn(msg, stacklevel=3)
    else:
        raise RuntimeError(msg)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    method: str = "star",
) -> DataFrame:
    """Near-duplicate clusters: connected components over a pair list
    (e.g. ``minhash_lsh_pairs`` output), every document included (docs
    with no near-dup form singleton clusters), plus the keep/drop
    decision (keep = the minimum id of the cluster). Returns
    (doc_id, cluster_id, keep).

    EAGER + PERSISTED contract (same as the dedup pair operators): the
    result is materialized at call time and returned persisted — the
    internal label table is released here, so callers only need to
    ``unpersist()`` the returned frame when done with it."""
    from .dedup import _finalize

    nodes = docs.select(F.col(id_col).alias("id")).distinct()
    cc = connected_components(nodes, pairs, method=method)
    result = cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )
    return _finalize(result, cc)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    damping: float = 0.85,
    n_iter: int = 10,
    directed: bool = False,
    disable_aqe: bool = True,
) -> DataFrame:
    """PageRank over the (by default undirected) graph — the classic KG
    materialization for entity importance over the co-occurrence edge
    view. Fixed ``n_iter`` power iterations (deterministic, no
    convergence-threshold float drift across platforms); dangling nodes
    redistribute their mass uniformly each iteration, so ranks sum to
    ~1.0 throughout.

    Scale shape: per iteration, one equi-join of ranks onto the edge
    list (uniform node keys) + one sum-aggregate; ranks are eagerly
    ``localCheckpoint``-ed per iteration (self-referential iterative
    plans grow exponentially otherwise — see ``_star_rounds``). The
    dangling-node mass rides the SAME plan as a broadcast 1-row
    aggregate folded into the rank update — no per-iteration driver
    ``collect`` (VERDICT r4 #4). With ``disable_aqe`` (default) AQE is
    turned off around the loop (saved/restored on the session conf):
    the plan is byte-identical every iteration, so adaptive re-planning
    only adds a driver job per exchange — measured 12 -> 2 jobs per
    iteration and ~10% wall-clock (pinned by TestPageRankJobCount).
    Caveats: the conf toggle is session-global (pass False when other
    queries run concurrently on the session), and on heavily skewed
    hub-node graphs AQE's skew-join splitting may be worth the driver
    overhead — pass False and measure. Returns (node, rank)."""
    spark = nodes.sparkSession
    _AQE = "spark.sql.adaptive.enabled"
    prev_aqe = spark.conf.get(_AQE, "true")
    if disable_aqe:
        spark.conf.set(_AQE, "false")
    try:
        return _pagerank_loop(
            nodes, edges, node_col, src_col, dst_col, damping, n_iter,
            directed,
        )
    finally:
        if disable_aqe:
            spark.conf.set(_AQE, prev_aqe)


def _pagerank_loop(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    damping: float,
    n_iter: int,
    directed: bool,
) -> DataFrame:
    n_nodes_row = nodes.select(
        F.countDistinct(F.col(node_col)).alias("n")
    ).collect()[0]
    n = int(n_nodes_row["n"])
    if n == 0:
        return nodes.select(
            F.col(node_col).alias("node"), F.lit(0.0).alias("rank")
        )
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
    e = e.filter(F.col("u") != F.col("v")).distinct()
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    e = e.join(out_deg, "u").localCheckpoint(eager=True)

    all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    # flag dangling nodes (no out-edges) ONCE and carry the flag on the
    # ranks frame: the per-iteration dangling mass is then a filter +
    # 1-row aggregate over ranks itself — no join, no driver collect
    nodes_flagged = (
        all_nodes.join(
            out_deg.select(
                F.col("u").alias("node"), F.lit(True).alias("_o")
            ),
            "node",
            "left",
        )
        .select(
            "node", F.coalesce(F.col("_o"), F.lit(False)).alias("has_out")
        )
        .localCheckpoint(eager=True)
    )
    ranks = nodes_flagged.select(
        "node", "has_out", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["u"] == ranks["node"])
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # dangling nodes spread their rank uniformly — folded into the
        # rank update as a broadcast 1-row aggregate, not a collect
        dang_mass = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        ranks = (
            nodes_flagged.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang_mass))
            .select(
                "node",
                "has_out",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("m") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")
