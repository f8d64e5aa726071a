"""Minimum-cover computation for keyphrase keyword positions.

Given one position list per matched keyword, find the shortest token window
containing at least one position of every keyword. Faithful port of the
sweep in the reference (``util/MinCoverCalculator.java:12-108``), including
its early-exit condition (stop once the cover equals the symbol count or
the occurrence stream is exhausted) and its tie handling (equal-length
covers append additional start/end positions).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field


@dataclass
class MinCover:
    length: int = -1
    start_positions: list[int] = field(default_factory=list)
    end_positions: list[int] = field(default_factory=list)


def min_cover_length(positions: list[list[int]]) -> int:
    """``min_cover(positions).length`` without building the window lists —
    the scoring hot path only consumes the length. Same sweep, same
    integer arithmetic, so the value is identical by construction."""
    if not positions:
        return -1
    if len(positions) == 1:
        return 1
    k = len(positions)
    heap: list[tuple[int, int]] = []
    for sym, plist in enumerate(positions):
        for p in plist:
            heap.append((p, sym))
    heapq.heapify(heap)
    pop = heapq.heappop
    covered = [-1] * k
    covered_count = 0
    while covered_count < k:
        pos, sym = pop(heap)
        if covered[sym] == -1:
            covered_count += 1
        covered[sym] = pos
    lo = min(covered)
    hi = max(covered)
    best = hi - lo + 1
    while best > k and heap:
        pos, sym = pop(heap)
        hi = pos
        if covered[sym] == lo:
            covered[sym] = pos
            lo = min(covered)
        else:
            covered[sym] = pos
        length = hi - lo + 1
        if length < best:
            best = length
    return best


def min_cover(positions: list[list[int]]) -> MinCover:
    mc = MinCover()
    if not positions:
        return mc
    if len(positions) == 1:
        mc.length = 1
        mc.start_positions = list(positions[0])
        mc.end_positions = list(positions[0])
        return mc

    k = len(positions)
    heap: list[tuple[int, int]] = []  # (position, symbol id)
    for sym, plist in enumerate(positions):
        for p in plist:
            heap.append((p, sym))
    heapq.heapify(heap)

    covered = [-1] * k
    covered_count = 0
    while covered_count < k:
        pos, sym = heapq.heappop(heap)
        if covered[sym] == -1:
            covered_count += 1
        covered[sym] = pos

    lo = min(covered)
    hi = max(covered)
    best = hi - lo + 1
    mc.length = best
    mc.start_positions = [lo]
    mc.end_positions = [hi]

    while best > k and heap:
        pos, sym = heapq.heappop(heap)
        hi = pos
        if covered[sym] == lo:
            covered[sym] = pos
            lo = min(covered)
        else:
            covered[sym] = pos
        length = hi - lo + 1
        if length < best:
            best = length
            mc.length = length
            mc.start_positions = [lo]
            mc.end_positions = [hi]
        elif length == best:
            mc.start_positions.append(lo)
            mc.end_positions.append(hi)
    return mc
