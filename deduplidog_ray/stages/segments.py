"""Vectorized within-segment pair generation.

Shared by every kernel that expands sorted same-key segments into all
C(d,2) unordered pairs (LSH candidate buckets in ``pipelines/similarity``,
degree-ordered wedges and co-occurrence segments in ``pipelines/graph``).
Pure integer repeat/cumsum arithmetic — no floating point, no Python loop
over segments.
"""

from __future__ import annotations

import numpy as np


def segment_pairs(
    seg_start: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment position pairs (left < right), fully vectorized.

    Replaces the per-bucket Python loop (np.unique + triu per segment):
    with centered/balanced band keys a corpus produces MANY SMALL buckets
    — 100k+ segments — and a Python iteration per segment dominates the
    whole candidate stage. Here every pair position is computed with
    repeat/cumsum arithmetic: element at local index l contributes l pairs
    as the right member, paired with the l elements before it.

    Returns ``(left, right)`` GLOBAL positions (indices into the sorted
    segment-concatenated array), left < right within each segment.
    """
    n = int(sizes.sum())
    loc = np.arange(n, dtype=np.int64) - np.repeat(seg_start, sizes)
    total = int(loc.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    right = np.repeat(np.arange(n, dtype=np.int64), loc)
    before = np.concatenate(([0], np.cumsum(loc)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(before, loc)
    left = np.repeat(np.repeat(seg_start, sizes), loc) + within
    return left, right
