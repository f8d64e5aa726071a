"""Chunk-result reconciliation and person-name merging.

- ``reconcile_chunks``: group identical surface forms across chunks of the
  same document, sum scores per entity, re-rank
  (resultreconciliation/ResultsReconciler.java:66-130).
- ``merge_person_names``: mentions whose token set is a subset of a longer
  mention's token set inherit that mention's entity ("Verdi" <-
  "Giuseppe Verdi"); the type restriction to persons is disabled in the
  reference itself (PersonMerger.java:54-56 returns all mentions)
  (resultreconciliation/PersonMerger.java:40-131).
"""

from __future__ import annotations

from .graph import MentionResult

__all__ = ["reconcile_chunks", "merge_person_names"]


def reconcile_chunks(
    chunk_results: list[list[MentionResult]],
) -> list[MentionResult]:
    """Aggregate scores per (surface, entity) across chunks; every mention
    is re-assigned the entity with the highest aggregated score for its
    surface form."""
    if len(chunk_results) <= 1:
        return chunk_results[0] if chunk_results else []
    agg: dict[str, dict[str, float]] = {}
    for results in chunk_results:
        for r in results:
            agg.setdefault(r.mention.surface, {})
            agg[r.mention.surface][r.entity] = (
                agg[r.mention.surface].get(r.entity, 0.0) + r.score
            )
    out: list[MentionResult] = []
    for results in chunk_results:
        for r in results:
            scores = agg[r.mention.surface]
            best, score = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            out.append(MentionResult(r.mention, best, score, dict(scores)))
    return out


def merge_person_names(results: list[MentionResult]) -> list[MentionResult]:
    """Shorter mentions inherit the entity of the *longest* containing
    mention (the reference scans from the longest down and takes the
    first hit, PersonMerger.java:110-130)."""
    order = sorted(
        range(len(results)), key=lambda i: results[i].mention.char_length
    )
    token_sets = [set(r.mention.surface.split(" ")) for r in results]
    out = list(results)
    for pos, i in enumerate(order):
        for j in reversed(order[pos + 1 :]):
            if token_sets[j] >= token_sets[i]:
                if out[i].entity != out[j].entity:
                    out[i] = MentionResult(
                        out[i].mention,
                        out[j].entity,
                        out[j].score,
                        out[i].candidates,
                    )
                break
    return out
