"""Union-find connected components over verified duplicate pairs.

≙ the reference's first-match + tombstone grouping
(deduplidog/deduplidog.py:492-494, :630 — sequential, order-dependent),
generalized to the order-independent transitive closure (SURVEY.md §7
semantics decision 1): cluster = connected component of the verified pair
relation; cluster id = lexicographically smallest member (deterministic
regardless of pair arrival order).

Scale note: the DSU holds only clips that appear in at least one verified
pair — a small fraction of rows (pairs, not rows, concentrate on the
driver). The pair stream is consumed via ``iter_batches`` so the pair
table itself is never materialized driver-side. If the pair set outgrew
driver memory, the documented upgrade path is partitioned DSU forests
merged pairwise (each partition unions its pairs, emits (member, local
root) edges, iterate — à la BTS/two-phase label propagation, PAPERS.md);
the merge is associative so the driver only ever sees forest edges.
"""

from __future__ import annotations

from collections.abc import Iterable


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:                  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def add_pairs(self, pairs: Iterable[tuple[str, str]]) -> None:
        for a, b in pairs:
            self.union(a, b)

    def components(self) -> dict[str, str]:
        """member → cluster id (= min member of its component)."""
        groups: dict[str, list[str]] = {}
        for x in self.parent:
            groups.setdefault(self.find(x), []).append(x)
        out: dict[str, str] = {}
        for members in groups.values():
            cid = min(members)
            for m in members:
                out[m] = cid
        return out


def components_from_pair_batches(batches) -> dict[str, str]:
    """Stream (a, b) pair batches (pyarrow) into a DSU → member → cluster id."""
    uf = UnionFind()
    for batch in batches:
        uf.add_pairs(zip(batch["a"].to_pylist(), batch["b"].to_pylist()))
    return uf.components()
