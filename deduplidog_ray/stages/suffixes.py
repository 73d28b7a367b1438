"""Generalized suffix array for exact substring (contained-doc) detection.

≙ the reference's shrunk/partial-copy duplicate case (docs/index.md:20-22)
— the suffix-array axis named alongside MinHash/SimHash in SURVEY.md §2.8.
The winnowing path (`pipelines/containment.py`) generates candidates at
corpus scale; this module is the EXACT detection kernel that runs where
texts are co-located: over a verify partition's fetched texts, or over a
whole small corpus in one task.

Algorithm (public): Manber & Myers rank-doubling suffix-array
construction (SIAM J. Comput. 1993), vectorized as O(log n) numpy
argsort rounds — no per-character Python. Queries are equal-range
binary searches: all occurrence positions of pattern ``q`` are the SA
interval of suffixes prefixed by ``q``, found with O(log n) suffix
comparisons, each one vectorized numpy slice compare. Containment of
doc a in doc b never crosses a document boundary because documents are
joined with a 0 sentinel and patterns are sentinel-free (bytes map to
1..256), so an occurrence interval maps to exactly one container doc.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "suffix_array",
    "GeneralizedSuffixArray",
    "gsa_containment_pairs",
    "exact_containment_mask",
]


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence via rank doubling.

    O(n log^2 n) total work, but every round is whole-array numpy
    (argsort + vectorized rank recompute); terminates early once ranks
    are all distinct. Alphabet: any int values (compared numerically).
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    _, rank = np.unique(np.asarray(s), return_inverse=True)
    rank = rank.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        # sort key: (rank[i], rank[i+k]), absent second half = -1 (fits
        # in one int64 because rank < n: key < n*(n+1) + n + 1)
        second = np.full(n, 0, dtype=np.int64)
        second[: n - k] = rank[k:] + 1
        key = rank * np.int64(n + 1) + second
        sa = np.argsort(key, kind="stable")
        sorted_key = key[sa]
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.concatenate(
            ([0], np.cumsum(sorted_key[1:] != sorted_key[:-1]))
        )
        rank = new_rank
        if rank[sa[-1]] == n - 1:  # all ranks distinct — fully sorted
            break
        k *= 2
    return sa


class GeneralizedSuffixArray:
    """Suffix array over the 0-sentinel-joined concatenation of documents.

    ``find_containers(text)`` returns the ids of every document whose
    text contains ``text`` as an exact byte substring (including
    documents equal to it). Empty patterns match every document —
    mirroring SQL ``position('' IN x) = 1``.
    """

    _SENTINEL_HI = np.int32(257)  # > any mapped byte: upper-bound probe

    def __init__(self, ids: np.ndarray, texts: list) -> None:
        self.ids = np.asarray(ids, dtype=np.int64)
        blobs = [
            (t if isinstance(t, bytes) else (t or "").encode("utf-8"))
            for t in texts
        ]
        lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                           count=len(blobs))
        # doc i occupies [starts[i], starts[i] + lens[i]) in the buffer,
        # followed by one 0 sentinel
        self.starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
        total = int((lens + 1).sum())
        buf = np.zeros(total, dtype=np.int32)
        for st, b in zip(self.starts, blobs):
            if len(b):
                buf[st : st + len(b)] = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int32) + 1
                )
        self.buf = buf
        self.sa = suffix_array(buf)

    def _suffix_lt(self, pos: int, q: np.ndarray) -> bool:
        """buf[pos:] < q, one vectorized slice compare."""
        m = len(q)
        seg = self.buf[pos : pos + m]
        k = len(seg)
        neq = np.flatnonzero(seg != q[:k])
        if neq.size:
            i = int(neq[0])
            return bool(seg[i] < q[i])
        return k < m  # proper prefix sorts first

    def _lower_bound(self, q: np.ndarray) -> int:
        lo, hi = 0, len(self.sa)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._suffix_lt(int(self.sa[mid]), q):
                lo = mid + 1
            else:
                hi = mid
        return lo

    def find_containers(self, text) -> np.ndarray:
        """ids of documents containing ``text`` (sorted, deduplicated)."""
        b = text if isinstance(text, bytes) else (text or "").encode("utf-8")
        if not b:
            return np.sort(self.ids)  # '' is in everything (SQL position)
        q = np.frombuffer(b, dtype=np.uint8).astype(np.int32) + 1
        lo = self._lower_bound(q)
        hi = self._lower_bound(np.concatenate((q, [self._SENTINEL_HI])))
        if hi <= lo:
            return np.empty(0, dtype=np.int64)
        pos = np.asarray(self.sa[lo:hi])
        # occurrences are sentinel-free, so each lies inside one doc
        docs = np.searchsorted(self.starts, pos, side="right") - 1
        return np.unique(self.ids[docs])


def exact_containment_mask(
    aa: np.ndarray, bb: np.ndarray, ids: list, texts: list
) -> np.ndarray:
    """For each pair (aa[p], bb[p]): is one text an exact substring of the
    other? One generalized suffix array over ``texts``; each DISTINCT
    shorter-side text is probed once (equal-range binary search) and its
    container set cached. Probing only the shorter side is sufficient:
    for equal lengths, substring either way means string equality, which
    the probe also reports (a doc always contains itself — the probe
    returns the OTHER doc exactly when texts are equal).
    """
    m = len(aa)
    out = np.zeros(m, dtype=bool)
    if m == 0:
        return out
    idx_of = {i: k for k, i in enumerate(ids)}
    gsa = GeneralizedSuffixArray(np.arange(len(ids), dtype=np.int64), texts)
    lens = np.fromiter(
        (len(t) if t is not None else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    cache: dict[int, np.ndarray] = {}
    for p in range(m):
        ia, ib = idx_of[aa[p]], idx_of[bb[p]]
        short, other = (ia, ib) if lens[ia] <= lens[ib] else (ib, ia)
        hits = cache.get(short)
        if hits is None:
            hits = gsa.find_containers(texts[short])
            cache[short] = hits
        pos = int(np.searchsorted(hits, other))
        out[p] = pos < len(hits) and hits[pos] == other
    return out


def gsa_containment_pairs(
    ids: np.ndarray, texts: list
) -> tuple[np.ndarray, np.ndarray]:
    """All ordered (contained_id, container_id) pairs among the given
    documents, a != b — exact, one generalized suffix array, one
    equal-range probe per distinct text. Equal texts contain each other
    in both directions, matching ``position(a.text IN b.text) > 0``.
    """
    gsa = GeneralizedSuffixArray(ids, texts)
    ids64 = np.asarray(ids, dtype=np.int64)
    # probe once per distinct text; fan results out to its doc ids
    by_text: dict[bytes, list[int]] = {}
    for i, t in enumerate(texts):
        b = t if isinstance(t, bytes) else (t or "").encode("utf-8")
        by_text.setdefault(b, []).append(int(ids64[i]))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for b, doc_ids in by_text.items():
        containers = gsa.find_containers(b)
        for d in doc_ids:
            others = containers[containers != d]
            if len(others):
                out_a.append(np.full(len(others), d, dtype=np.int64))
                out_b.append(others)
    if not out_a:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(out_a), np.concatenate(out_b)
