"""Per-document coherence graph and the CocktailParty dense-subgraph solver.

From-scratch Python re-implementation of the reference algorithm chain:
- Milne-Witten inlink relatedness
  (``measure/MilneWittenEntityEntitySimilarity.java:59-97``),
- pair enumeration with same-mention-set skip
  (``util/ParallelEntityEntityRelatednessComputationThread.java:40-104``),
- graph construction with min-max rescaling, ME/EE scale equalization and
  alpha-weighting (``graph/extraction/ExtractGraph.java:61-346``,
  ``graph/Graph.java:173-178``),
- dangling-mention removal, distance-based initial pruning (CP and the
  size-constrained CPSC variant), the greedy min-weighted-degree loop,
  exhaustive final solving and closeness/weighted-degree confidence
  (``algorithms/CocktailParty.java``, ``CocktailPartySizeConstrained.java``,
  ``GreedyHillClimbing.java``, ``ShortestPath.java``,
  ``GraphConfidenceEstimator.java``).

Graphs here are tiny (<= #mentions * 5 entity nodes + #mentions), so plain
dict adjacency + heapq is faster than any distributed representation; the
Spark layer runs one instance of this per conversation inside
``applyInPandas``.
"""

from __future__ import annotations

import heapq
import itertools
import math
from dataclasses import dataclass, field

from .kb import KBData, OOKBE
from .scoring import normalize_to_sum
from .text import SpottedMention

__all__ = ["milne_witten", "GraphConfig", "DocGraph", "cocktail_party"]

INF = float("inf")


def milne_witten(
    inlinks_a: tuple[int, ...], inlinks_b: tuple[int, ...], collection_size: int
) -> float:
    """1 - (log max - log overlap) / (log N - log min); 0 when no overlap
    or distance > 1 (MilneWittenEntityEntitySimilarity.java:59-97)."""
    size_a, size_b = len(inlinks_a), len(inlinks_b)
    overlap = len(set(inlinks_a) & set(inlinks_b))
    if overlap == 0:
        return 0.0
    mx, mn = (size_a, size_b) if size_a >= size_b else (size_b, size_a)
    distance = (math.log(mx) - math.log(overlap)) / (
        math.log(collection_size) - math.log(mn)
    )
    sim = 1.0 - distance
    if distance > 1.0:
        sim = 0.0
    return sim


@dataclass
class GraphConfig:
    alpha: float = 0.6                       # CocktailPartyDisambiguationSettings.java:29
    entities_per_mention: int = 5            # :37
    # E8 ensemble: weighted sum of EE measures; default MilneWitten x1.0
    # (CocktailPartyDisambiguationSettings.java:43-45)
    ee_measures: tuple = (("milne_witten", 1.0),)
    use_exhaustive: bool = True
    use_normalized_objective: bool = True
    max_combinations: int = 1000             # CocktailParty.java:331-334
    algorithm: str = "cpsc"                  # "cp" | "cpsc"
    compute_confidence: bool = False
    confidence_balance: float = 1.0
    confidence_iterations_per_mention: int = 1000
    confidence_flip_percentage: float = 0.66
    random_seed: int = 1337                  # GraphConfidenceEstimator.java:86-87


class DocGraph:
    """Node ids: mentions [0, n_mentions), then entities. Adjacency as
    dict node -> {neighbor: weight}. Mirrors graph/Graph.java with the
    alpha weighting applied at edge insertion (Graph.java:173-178)."""

    def __init__(self, n_mentions: int, entity_names: list[str], alpha: float):
        self.alpha = alpha
        self.n_mentions = n_mentions
        self.entity_names = entity_names  # index -> name
        self.entity_node: dict[str, int] = {
            e: n_mentions + i for i, e in enumerate(entity_names)
        }
        self.adj: list[dict[int, float]] = [
            {} for _ in range(n_mentions + len(entity_names))
        ]
        self.removed: list[bool] = [False] * len(self.adj)
        self.avg_me_weight = 1.0
        self.avg_ee_weight = 1.0
        # all local similarities, kept even for dropped candidates
        # (Graph.localSimilarities)
        self.local_sims: list[dict[str, float]] = [dict() for _ in range(n_mentions)]

    def is_entity(self, node: int) -> bool:
        return node >= self.n_mentions

    def add_me_edge(self, mention_idx: int, entity: str, sim: float) -> None:
        w = sim * self.alpha
        e = self.entity_node[entity]
        self.adj[mention_idx][e] = w
        self.adj[e][mention_idx] = w

    def add_ee_edge(self, e1: str, e2: str, sim: float) -> None:
        w = sim * (1.0 - self.alpha)
        n1, n2 = self.entity_node[e1], self.entity_node[e2]
        self.adj[n1][n2] = w
        self.adj[n2][n1] = w

    def weighted_degree(self, node: int) -> float:
        return sum(self.adj[node].values())

    def live_neighbors(self, node: int):
        return (n for n in self.adj[node] if not self.removed[n])

    def live_snapshot(
        self, removed: list[bool] | None = None
    ) -> list[list[tuple[int, float, float]]]:
        """Adjacency snapshot over live nodes as (neighbor, weight,
        1.0 - weight) lists, valid while ``removed`` is unchanged. The
        prune phases and the final closeness sweep run one SSSP per
        mention over a FROZEN graph — sharing one snapshot replaces the
        per-relaxation removed checks, dict iteration and the repeated
        ``1.0 - w`` with a prebuilt list walk (identical arithmetic:
        the same doubles relax in the same order, so distances, tree
        parents and heap tie-breaks are bit-identical)."""
        if removed is None:
            removed = self.removed
        return [
            []
            if removed[u]
            else [
                (v, w, 1.0 - w)
                for v, w in nbrs.items()
                if not removed[v]
            ]
            for u, nbrs in enumerate(self.adj)
        ]

    def dijkstra(
        self,
        source: int,
        live: list[list[tuple[int, float, float]]] | None = None,
    ) -> list[float]:
        """SSSP with edge distance = 1 - weight (ShortestPath.java:25-96)."""
        if live is None:
            live = self.live_snapshot()
        push, pop = heapq.heappush, heapq.heappop
        n = len(live)
        dist = [INF] * n
        dist[source] = 0.0
        heap = [(0.0, source)]
        done = [False] * n
        while heap:
            d, u = pop(heap)
            if done[u]:
                continue
            done[u] = True
            for v, _w, c in live[u]:
                if done[v]:
                    continue
                nd = d + c
                if nd < dist[v]:
                    dist[v] = nd
                    push(heap, (nd, v))
        if self.removed[source]:
            return [INF] * n
        return dist

    def closeness(
        self,
        source: int,
        removed: list[bool],
        live: list[list[tuple[int, float, float]]] | None = None,
    ) -> list[float]:
        """Dijkstra by distance, accumulating weight along the shortest-path
        tree (ShortestPath.closeness)."""
        if live is None:
            live = self.live_snapshot(removed)
        push, pop = heapq.heappush, heapq.heappop
        n = len(live)
        dist = [INF] * n
        close = [-INF] * n
        dist[source] = 0.0
        close[source] = 0.0
        heap = [(0.0, source)]
        done = [False] * n
        while heap:
            d, u = pop(heap)
            if done[u]:
                continue
            done[u] = True
            cu = close[u]
            for v, w, c in live[u]:
                if done[v]:
                    continue
                nd = d + c
                if nd < dist[v]:
                    dist[v] = nd
                    close[v] = cu + w
                    push(heap, (nd, v))
        return close


def _ee_ensemble_fn(kb: KBData, cfg: GraphConfig):
    """EnsembleEntityEntitySimilarity: weighted sum of configured measures
    (EnsembleEntityEntitySimilarity.java:14-27)."""
    from . import ee_measures as eem

    ctx = None
    if any(name != "milne_witten" for name, _w in cfg.ee_measures):
        ctx = eem.EEWeightContext(kb)
    fns = {
        "milne_witten": lambda a, b: milne_witten(
            kb.inlinks.get(a, ()), kb.inlinks.get(b, ()), kb.collection_size
        ),
        "kore": lambda a, b: eem.kore_similarity(a, b, ctx),
        "keyword_cosine": lambda a, b: eem.keyword_cosine_similarity(a, b, ctx),
        "jaccard": lambda a, b: eem.jaccard_similarity(a, b, ctx),
        "weighted_jaccard": lambda a, b: eem.weighted_jaccard_similarity(a, b, ctx),
        "ngd": lambda a, b: eem.ngd_similarity(a, b, ctx),
    }

    def ensemble(a: str, b: str) -> float:
        return sum(w * fns[name](a, b) for name, w in cfg.ee_measures)

    return ensemble


def build_graph(
    mentions: list[SpottedMention],
    ensemble_sims: dict[tuple[int, str], float],
    kb: KBData,
    cfg: GraphConfig,
    all_local_sims: dict[tuple[int, str], float] | None = None,
) -> DocGraph:
    """ExtractGraph.generateGraph: EE sims, min-max rescaling of ME and EE
    weights, scale equalization, then node/edge insertion with alpha."""
    # unique candidate entities, in first-seen order over sorted mentions
    entity_order: list[str] = []
    seen: set[str] = set()
    entity_mentions: dict[str, set[int]] = {}
    for mi, m in enumerate(mentions):
        for cand, _p in m.candidates:
            if cand not in seen:
                seen.add(cand)
                entity_order.append(cand)
            entity_mentions.setdefault(cand, set()).add(mi)

    me = {k: v for k, v in ensemble_sims.items()}

    # --- EE similarities: pairs in lexicographic (name) order, skipping
    # pairs whose mention sets are identical; negatives clamped to 0;
    # computed pairs are *stored* even when 0 (they participate in
    # rescaling), but only > 0 pairs become edges.
    ee: dict[tuple[str, str], float] = {}
    ee_fn = _ee_ensemble_fn(kb, cfg)
    ordered = sorted(entity_order)
    for i, e1 in enumerate(ordered):
        for e2 in ordered[i + 1 :]:
            if entity_mentions[e1] == entity_mentions[e2]:
                continue  # same-mention competitor pair: no coherence edge
            ee[(e1, e2)] = max(0.0, ee_fn(e1, e2))

    # --- min-max rescale ME (ExtractGraph.rescaleMentionEdgeWeights)
    me_vals = list(me.values())
    if len(me_vals) > 1 and sum(me_vals) != 0.0:
        lo = min(me_vals)
        hi = max(0.0, max(me_vals))
        if hi != lo:
            me = {k: (v - lo) / (hi - lo) for k, v in me.items()}

    # --- min-max rescale EE (rescaleEntityEdgeWeights)
    if len(ee) > 1:
        lo = min(ee.values())
        hi = max(0.0, max(ee.values()))
        if hi != lo:
            ee = {k: (v - lo) / (hi - lo) for k, v in ee.items()}

    # --- equalize average scales (ExtractGraph.java:135-156)
    def avg_positive(vals) -> float:
        pos = [v for v in vals if v > 0.0]
        return sum(pos) / len(pos) if pos else 0.0

    if ee:
        avg_me = avg_positive(me.values())
        avg_ee = avg_positive(ee.values())
        if avg_me > 0.0 and avg_ee > 0.0:
            scaling = avg_me / avg_ee
            if scaling > 1.0:
                me = {k: v / scaling for k, v in me.items()}
            else:
                ee = {k: v * scaling for k, v in ee.items()}

    g = DocGraph(len(mentions), entity_order, cfg.alpha)
    g.avg_me_weight = avg_positive(me.values())
    g.avg_ee_weight = avg_positive(ee.values()) if ee else 0.0

    for (mi, cand), sim in me.items():
        g.add_me_edge(mi, cand, sim)
    # Keep the *raw* local similarities for every original candidate (even
    # ones dropped by the pre-graph heuristics) — the confidence estimator
    # normalizes over them (Graph.localSimilarities,
    # GraphConfidenceEstimator.getMentionEntityLocalScores).
    for (mi, cand), sim in (all_local_sims or ensemble_sims).items():
        g.local_sims[mi][cand] = sim
    for (e1, e2), sim in ee.items():
        if sim > 0.0:
            g.add_ee_edge(e1, e2, sim)
    return g


class _Solver:
    """The CocktailParty greedy min-weighted-degree loop with the
    removable / not-removable entity bookkeeping (CocktailParty.java:109-399).

    The reference keeps "id:::degree" strings in priority queues; we use
    lazy-deletion heaps keyed by (degree, node_id) — ties break by node id,
    which is deterministic (the reference's tie order is heap-internal)."""

    def __init__(self, g: DocGraph, cfg: GraphConfig):
        self.g = g
        self.cfg = cfg
        self.entity_wd: dict[int, float] = {}
        self.not_removable_wd: dict[int, float] = {}
        self.heap: list[tuple[float, int]] = []       # removable entities
        self.nr_heap: list[tuple[float, int]] = []    # not-removable
        self.mention_degrees: dict[int, int] = {}

    # -- heap helpers with lazy deletion ------------------------------
    def _heap_min(self, heap, live: dict[int, float]):
        while heap:
            d, node = heap[0]
            if node in live and live[node] == d:
                return d
            heapq.heappop(heap)
        return INF

    def _set_removable(self, node: int, degree: float) -> None:
        self.entity_wd[node] = degree
        heapq.heappush(self.heap, (degree, node))

    def _set_not_removable(self, node: int, degree: float) -> None:
        self.not_removable_wd[node] = degree
        heapq.heappush(self.nr_heap, (degree, node))

    def first_scan(self) -> float:
        """firstScanAndCalculateInitialObjective (CocktailParty.java:1039-1082)."""
        g = self.g
        initial = INF
        for node in range(len(g.adj)):
            if g.removed[node]:
                continue
            if not g.is_entity(node):
                self.mention_degrees[node] = len(g.adj[node])
                continue
            wd = g.weighted_degree(node)
            not_removable = any(
                not g.is_entity(s) and len(g.adj[s]) == 1 for s in g.adj[node]
            )
            if not_removable:
                self._set_not_removable(node, wd)
            else:
                self._set_removable(node, wd)
            initial = min(initial, wd)
        return initial

    def is_removable(self, node: int) -> bool:
        g = self.g
        for s in g.adj[node]:
            if not g.is_entity(s) and self.mention_degrees.get(s) == 1:
                return False
        return True

    def pop_removable_minimum(self) -> int:
        while True:
            d = self._heap_min(self.heap, self.entity_wd)
            if d == INF:
                return -1
            node = self.heap[0][1]
            if self.is_removable(node):
                return node
            del self.entity_wd[node]
            heapq.heappop(self.heap)
            self._set_not_removable(node, d)

    def update_neighbors(self, removed_node: int) -> None:
        """updateNeighboringNodes (CocktailParty.java:745-811)."""
        g = self.g
        for s, w in g.adj[removed_node].items():
            if not g.is_entity(s):
                deg = self.mention_degrees[s] - 1
                self.mention_degrees[s] = deg
                if deg == 1:
                    for cand in g.adj[s]:
                        if not g.removed[cand]:
                            if cand in self.entity_wd:
                                wd = self.entity_wd.pop(cand)
                                self._set_not_removable(cand, wd)
                            break
            else:
                if s in self.entity_wd:
                    self._set_removable(s, self.entity_wd[s] - w)
                elif s in self.not_removable_wd:
                    self._set_not_removable(s, self.not_removable_wd[s] - w)

    def remove_entities_batch(
        self,
        to_remove: list[int],
        check_mention_degree: dict[int, int],
        mention_max_entity: dict[int, int],
        mention_max_wd: dict[int, float],
    ) -> None:
        """removeAndUpdateEntities (CocktailParty.java:936-1017): keep each
        mention's best entity, then remove the rest and update degrees."""
        g = self.g
        for mention, count in check_mention_degree.items():
            if count == self.mention_degrees[mention]:
                best = mention_max_entity[mention]
                if best in to_remove:
                    to_remove.remove(best)
                if best in self.entity_wd:
                    wd = self.entity_wd.pop(best)
                    self._set_not_removable(best, wd)
        for node in to_remove:
            for s, w in g.adj[node].items():
                if not g.is_entity(s):
                    self.mention_degrees[s] -= 1
                else:
                    if s in self.entity_wd:
                        self._set_removable(s, self.entity_wd[s] - w)
                    elif s in self.not_removable_wd:
                        self._set_not_removable(s, self.not_removable_wd[s] - w)
            self.entity_wd.pop(node, None)
            g.removed[node] = True

    def distance_prune(self, distance_threshold: float) -> None:
        """CP variant: drop entities whose mean finite distance to mentions
        exceeds the threshold (CocktailParty.removeInitialEntitiesByDistance)."""
        g = self.g
        live = g.live_snapshot()
        dists = {m: g.dijkstra(m, live) for m in self.mention_degrees}
        to_remove: list[int] = []
        check_md: dict[int, int] = {}
        max_wd: dict[int, float] = {}
        max_ent: dict[int, int] = {}
        for node in range(len(g.adj)):
            if g.removed[node] or not g.is_entity(node):
                continue
            if node not in self.entity_wd:
                continue  # not-removable entities are never distance-pruned
            finite = [dists[m][node] for m in self.mention_degrees
                      if dists[m][node] != INF]
            if not finite:
                continue
            d = sum(finite) / len(finite)
            if d > distance_threshold:
                self._mark_for_removal(node, to_remove, check_md, max_wd, max_ent)
        self.remove_entities_batch(to_remove, check_md, max_ent, max_wd)

    def size_constrained_prune(self) -> None:
        """CPSC variant: keep only ceil(#mentions * K) entities closest by
        sum-of-squared distances (CocktailPartySizeConstrained.java:38-149)."""
        g = self.g
        cfg = self.cfg
        live = g.live_snapshot()
        dists = {m: g.dijkstra(m, live) for m in self.mention_degrees}
        entity_distance: dict[int, float] = {}
        for node in list(self.entity_wd.keys()):
            if g.removed[node]:
                continue
            total = 0.0
            for m in self.mention_degrees:
                d = dists[m][node]
                if d != INF:
                    total += d * d
            entity_distance[node] = total
        number_to_keep = math.ceil(len(self.mention_degrees) * cfg.entities_per_mention)
        ranked = sorted(entity_distance.items(), key=lambda kv: (kv[1], kv[0]))
        to_remove: list[int] = []
        check_md: dict[int, int] = {}
        max_wd: dict[int, float] = {}
        max_ent: dict[int, int] = {}
        for i, (node, _d) in enumerate(ranked):
            if i + 1 > number_to_keep:
                self._mark_for_removal(node, to_remove, check_md, max_wd, max_ent)
        self.remove_entities_batch(to_remove, check_md, max_ent, max_wd)

    def _mark_for_removal(self, node, to_remove, check_md, max_wd, max_ent):
        g = self.g
        to_remove.append(node)
        wd = self.entity_wd[node]
        for s in g.adj[node]:
            if not g.is_entity(s):
                check_md[s] = check_md.get(s, 0) + 1
                if s not in max_wd or wd > max_wd[s]:
                    max_wd[s] = wd
                    max_ent[s] = node

    def objective(self, minimum_degree: float) -> float:
        """calculateObjective (CocktailParty.java:625-632). Java divides by
        ewd.size() without guarding 0 — x/0.0 is +Inf for x>0 and NaN for
        x==0, and the +Inf case is load-bearing: when the distance pruning
        empties the removable set in iteration 1, objective=Inf captures the
        pruned state as best (the path the golden scores take)."""
        if self.cfg.use_normalized_objective:
            n = len(self.entity_wd)
            if n == 0:
                if minimum_degree > 0:
                    return INF
                return float("nan") if minimum_degree == 0 else -INF
            return minimum_degree / n
        return minimum_degree

    def current_minimum(self) -> float:
        rem = self._heap_min(self.heap, self.entity_wd)
        nrem = self._heap_min(self.nr_heap, self.not_removable_wd)
        return min(rem, nrem)


def _exhaustive_search(
    g: DocGraph, mention_nodes: list[int], max_combinations: int
) -> dict[int, int] | None:
    """GreedyHillClimbing.runExhaustive + computeWeight. Returns None when
    the combination count exceeds the cap (the reference then falls back to
    seeded random local search; with top-5 pruning this effectively never
    happens — we keep the best-first exhaustive as the deterministic path)."""
    successors: dict[int, list[int]] = {}
    combos = 1
    for m in sorted(mention_nodes):
        if g.removed[m]:
            continue
        alive = [s for s in g.adj[m] if not g.removed[s]]
        if alive:
            successors[m] = alive
            combos *= len(alive)
    if combos > max_combinations:
        return None
    mention_ids = sorted(successors.keys())
    if not mention_ids:
        return {}

    # Precompute alive ME weights and the EE weight table among candidate
    # entities once; the per-combination cost is then O(m + |chosen|^2)
    # dict lookups instead of full adjacency scans.
    me_w = {m: {e: g.adj[m][e] for e in successors[m]} for m in mention_ids}
    all_entities = {e for alive in successors.values() for e in alive}
    ee_w: dict[int, dict[int, float]] = {
        e: {
            s: w
            for s, w in g.adj[e].items()
            if s in all_entities and not g.removed[s]
        }
        for e in all_entities
    }

    # bind the tables as defaults (locals) and align the ME dicts to the
    # assignment order once — same additions in the same order, just
    # without per-call closure/dict-key lookups
    me_dicts = [me_w[m] for m in mention_ids]

    def weight(
        assign: tuple[int, ...],
        me_dicts=me_dicts,
        ee_w=ee_w,
        zip=zip,
        set=set,
        len=len,
    ) -> float:
        total = 0.0
        chosen = set(assign)
        for d, e in zip(me_dicts, assign):
            total += d[e]
        for e in chosen:
            adj = ee_w[e]
            for s in chosen:
                if e < s and s in adj:
                    total += adj[s]
        return total / len(chosen)

    best_assign = None
    best_weight = -INF
    for assign in itertools.product(*(successors[m] for m in mention_ids)):
        w = weight(assign)
        if w > best_weight:
            best_weight = w
            best_assign = assign
    return dict(zip(mention_ids, best_assign))


def _local_search(
    g: DocGraph, mention_nodes: list[int], moves: int, seed: int
) -> dict[int, int]:
    """Seeded random-restart one-swap local search
    (GreedyHillClimbing.localSearch, simplified but deterministic)."""
    import random

    rng = random.Random(seed)
    successors = {
        m: [s for s in g.adj[m] if not g.removed[s]]
        for m in sorted(mention_nodes)
        if not g.removed[m] and any(not g.removed[s] for s in g.adj[m])
    }
    mention_ids = sorted(successors.keys())
    current = {m: successors[m][0] for m in mention_ids}

    def weight(assign: dict[int, int], adj=g.adj, set=set, len=len) -> float:
        total = 0.0
        chosen = set(assign.values())
        for m, e in assign.items():
            w = adj[m].get(e)
            if w is not None:
                total += w
        for e in chosen:
            for s, w in adj[e].items():
                if s in chosen and e < s:
                    total += w
        return total / len(chosen) if chosen else 0.0

    best = dict(current)
    if not mention_ids:
        return best
    best_w = weight(current)
    randrange = rng.randrange
    n_m = len(mention_ids)
    for _ in range(moves):
        m = mention_ids[randrange(n_m)]
        cands = successors[m]
        if len(cands) <= 1:
            continue
        e = cands[randrange(len(cands))]
        old = current[m]
        current[m] = e
        w = weight(current)
        if w > best_w:
            best_w = w
            best = dict(current)
        else:
            current[m] = old
    return best


@dataclass
class MentionResult:
    mention: SpottedMention
    entity: str  # OOKBE for no-match
    score: float
    candidates: dict[str, float] = field(default_factory=dict)


def cocktail_party(
    mentions: list[SpottedMention],
    ensemble_sims: dict[tuple[int, str], float],
    kb: KBData,
    cfg: GraphConfig,
    all_local_sims: dict[tuple[int, str], float] | None = None,
) -> list[MentionResult]:
    """Full CocktailParty solve for one document/conversation.

    ``ensemble_sims``: (mention_idx, entity) -> local ensemble similarity
    (already reduced to a single fixed candidate where the pre-graph
    heuristics fired — see disambiguate.py). ``all_local_sims`` keeps the
    pre-heuristic similarities for confidence normalization.
    """
    g = build_graph(mentions, ensemble_sims, kb, cfg, all_local_sims)
    results: dict[int, MentionResult] = {}
    dangling_solved: set[int] = set()

    # --- dangling-mention removal (CocktailParty.java:411-458)
    mentions_to_remove: set[int] = set()
    nm = g.n_mentions
    gadj = g.adj
    for mi in range(len(mentions)):
        cands = gadj[mi]
        if not cands:
            continue
        # inlined "no candidate has an entity neighbor" scan (a node is an
        # entity iff id >= n_mentions); short-circuits exactly like the
        # original any() over the nested generator
        is_local = True
        for cand in cands:
            for nb in gadj[cand]:
                if nb >= nm:
                    is_local = False
                    break
            if not is_local:
                break
        if is_local:
            mentions_to_remove.add(mi)
            best_e, best_s = None, -1.0
            for e_node, w in cands.items():
                if w > best_s:
                    best_s, best_e = w, e_node
            score = best_s
            if cfg.compute_confidence:
                score = normalize_to_sum(dict(cands))[best_e]
            results[mi] = MentionResult(
                mentions[mi], g.entity_names[best_e - g.n_mentions], score
            )
            dangling_solved.add(mi)
    if mentions_to_remove:
        entity_nodes_to_remove = set()
        for e_node in range(g.n_mentions, len(g.adj)):
            nbrs = g.adj[e_node]
            if nbrs and all(nb in mentions_to_remove for nb in nbrs):
                entity_nodes_to_remove.add(e_node)
        for node in mentions_to_remove | entity_nodes_to_remove:
            g.removed[node] = True
            for nb in list(g.adj[node]):
                g.adj[nb].pop(node, None)
            g.adj[node] = {}

    solver = _Solver(g, cfg)
    initial_objective = solver.first_scan()

    # --- main loop
    diameter = 1  # getDiameter() is hardcoded to 1 in the reference
    global_avg = (g.avg_me_weight + g.avg_ee_weight) / 2.0
    distance_threshold = diameter * (1.0 - global_avg) * 0.5

    best_value = initial_objective
    best_removed = list(g.removed)
    best_mention_degrees = dict(solver.mention_degrees)
    no_min_removed = False
    iterations = 0
    while True:
        iterations += 1
        if iterations == 1:
            if cfg.algorithm == "cpsc":
                solver.size_constrained_prune()
            else:
                solver.distance_prune(distance_threshold)
        node = solver.pop_removable_minimum()
        if node == -1:
            if iterations == 1:
                no_min_removed = True
            break
        del solver.entity_wd[node]
        g.removed[node] = True
        solver.update_neighbors(node)

        removable_min = solver._heap_min(solver.heap, solver.entity_wd)
        if removable_min == INF:
            break
        minimum = min(
            removable_min,
            solver._heap_min(solver.nr_heap, solver.not_removable_wd),
        )
        objective = solver.objective(minimum)
        if objective > best_value:
            best_value = objective
            best_removed = list(g.removed)
            best_mention_degrees = dict(solver.mention_degrees)

    if no_min_removed:
        minimum = solver.current_minimum()
        objective = solver.objective(minimum)
        if objective > best_value:
            best_value = objective
            best_removed = list(g.removed)
            best_mention_degrees = dict(solver.mention_degrees)

    g.removed = best_removed
    live_mentions = sorted(best_mention_degrees.keys())

    # --- final solving
    need_extra = any(best_mention_degrees[m] > 1 for m in live_mentions)
    mapping: dict[int, int] = {}
    if not need_extra:
        # every mention has exactly one live candidate; confidence =
        # ME weight + average closeness (fillInSolutionObject)
        final_entities = {
            n for n in range(g.n_mentions, len(g.adj)) if not g.removed[n]
        }
        live_snap = g.live_snapshot()
        closeness: dict[int, list[float]] = {
            m: g.closeness(m, g.removed, live_snap) for m in live_mentions
        }
        for m in live_mentions:
            alive = [
                (e, w) for e, w in g.adj[m].items()
                if e in final_entities
            ]
            if not alive:
                results[m] = MentionResult(mentions[m], OOKBE, 0.0)
                mapping[m] = -1
                continue
            for e_node, w in alive:
                conf = w
                others = [
                    closeness[om][e_node]
                    for om in live_mentions
                    if om != m and closeness[om][e_node] != -INF
                ]
                n_other = len(live_mentions) - 1
                if n_other > 0:
                    conf += sum(others) / n_other
                mapping[m] = e_node
                results[m] = MentionResult(
                    mentions[m], g.entity_names[e_node - g.n_mentions], conf
                )
    else:
        mapping = _exhaustive_search(g, live_mentions, cfg.max_combinations) \
            if cfg.use_exhaustive else None
        if mapping is None:
            mapping = _local_search(
                g, live_mentions, len(g.adj), cfg.random_seed
            )
        for m in live_mentions:
            e_node = mapping.get(m, -1)
            if e_node is not None and e_node != -1:
                w = g.adj[m][e_node]
                results[m] = MentionResult(
                    mentions[m], g.entity_names[e_node - g.n_mentions], w
                )
            else:
                results[m] = MentionResult(mentions[m], OOKBE, 0.0)
                mapping[m] = -1

    # mentions with zero candidates never entered the graph bookkeeping
    for mi, m in enumerate(mentions):
        if mi not in results:
            results[mi] = MentionResult(m, OOKBE, 0.0)
            mapping.setdefault(mi, -1)

    if cfg.compute_confidence:
        _apply_confidence(g, mentions, mapping, results, cfg, dangling_solved)

    return [results[mi] for mi in sorted(results.keys())]


def _sampling_confidence(
    g: DocGraph,
    mentions: list[SpottedMention],
    mapping: dict[int, int],
    cfg: GraphConfig,
) -> dict[int, dict[int, float]]:
    """G10 random-flip coherence confidence
    (GraphConfidenceEstimator.java:160-260): repeatedly flip a random
    subset of mention assignments (flip target sampled proportionally to
    ME edge weight, excluding the solution), re-pick the best entity by
    weighted degree for the stable mentions, and count how often each
    candidate wins. Deterministic via the reference's seed (1337), though
    not bit-identical to java.util.Random sequences."""
    import random

    rng = random.Random(cfg.random_seed)
    solution = {
        m: e for m, e in mapping.items() if e is not None and e != -1
    }
    flip_candidates = [m for m in solution if len(g.adj[m]) > 1]
    if not solution:
        return {}
    counts: dict[int, dict[int, int]] = {}
    total_iterations = min(
        cfg.confidence_iterations_per_mention * len(solution), 10000
    )
    for _ in range(total_iterations):
        mention_size = max(1, round(len(solution) * cfg.confidence_flip_percentage))
        num_flips = max(1, rng.randrange(mention_size))
        pool = list(flip_candidates)
        flipped: set[int] = set()
        for _k in range(min(num_flips, len(pool))):
            flipped.add(pool.pop(rng.randrange(len(pool))))
        config = dict(solution)
        for m in flipped:
            cands = {e: w for e, w in g.adj[m].items() if e != solution[m]}
            if cands:
                norm = normalize_to_sum(cands)
                r = rng.random()
                acc = 0.0
                pick = next(iter(norm))
                for e, p in sorted(norm.items()):
                    acc += p
                    if r <= acc:
                        pick = e
                        break
                config[m] = pick
            else:
                config[m] = -1
        present = set(config.keys()) | set(config.values())
        wd_cache: dict[int, float] = {}

        def wd(e: int) -> float:
            if e not in wd_cache:
                wd_cache[e] = sum(
                    w for nb, w in g.adj[e].items() if nb in present
                )
            return wd_cache[e]

        for m in solution:
            if m in flipped:
                continue
            cands = list(g.adj[m].keys())
            if not cands:
                continue
            best_wd = max(wd(e) for e in cands)
            tied = [e for e in cands if wd(e) == best_wd]
            pick = tied[rng.randrange(len(tied))] if len(tied) > 1 else tied[0]
            counts.setdefault(m, {})[pick] = counts.setdefault(m, {}).get(pick, 0) + 1
    out: dict[int, dict[int, float]] = {}
    for m, ec in counts.items():
        total = sum(ec.values())
        cand_conf = {e: 0.0 for e in g.adj[m]}
        if len(cand_conf) == 1:
            for e in cand_conf:
                cand_conf[e] = 1.0
        else:
            for e, c in ec.items():
                cand_conf[e] = c / total
        out[m] = cand_conf
    return out


def _apply_confidence(
    g: DocGraph,
    mentions: list[SpottedMention],
    mapping: dict[int, int],
    results: dict[int, MentionResult],
    cfg: GraphConfig,
    dangling_solved: set[int],
) -> None:
    """GraphConfidenceEstimator.estimate for confidenceBalance >= 1.0
    (LOCAL-only path, scoreType WEIGHTED_DEGREE): per mention, normalized
    weighted-degree (or stored local scores) of its candidates w.r.t. the
    solution configuration; single candidates get confidence 1.0; mentions
    without candidates get OOKBE at 0.95."""
    present: set[int] = set()
    for m, e in mapping.items():
        present.add(m)
        if e is not None and e != -1:
            present.add(e)

    def weighted_degree(entity_node: int) -> float:
        return sum(
            w for nb, w in g.adj[entity_node].items() if nb in present
        )

    coherence_conf: dict[int, dict[int, float]] = {}
    if cfg.confidence_balance < 1.0:
        coherence_conf = _sampling_confidence(g, mentions, mapping, cfg)

    for mi in range(len(mentions)):
        if mi in dangling_solved:
            continue  # solved with normalized local score before the graph
        chosen = mapping.get(mi, -1)
        if chosen is None or chosen == -1:
            # out-of-dictionary / unresolved: OOKBE at default confidence
            # (createConfidenceSolution, CocktailParty.java:596-598)
            results[mi] = MentionResult(mentions[mi], OOKBE, 0.95)
            continue
        chosen_name = g.entity_names[chosen - g.n_mentions]
        succ = g.adj[mi]
        if len(succ) > 1:
            # WEIGHTED_DEGREE score type (ConfidenceSettings default):
            # candidate's degree restricted to solution nodes
            scores = {e: weighted_degree(e) for e in succ}
            norm = normalize_to_sum(scores)
            conf = norm.get(chosen, 0.0)
        else:
            # single graph successor: normalize the stored local sims over
            # the *original* candidate set (handles heuristic-dropped ones)
            sims = g.local_sims[mi]
            norm = normalize_to_sum(dict(sims)) if sims else {}
            conf = norm.get(chosen_name, 0.0)
        if mi in coherence_conf and cfg.confidence_balance < 1.0:
            coh = coherence_conf[mi].get(chosen, 0.0)
            conf = (
                cfg.confidence_balance * conf
                + (1.0 - cfg.confidence_balance) * coh
            )
        results[mi] = MentionResult(mentions[mi], chosen_name, conf)
