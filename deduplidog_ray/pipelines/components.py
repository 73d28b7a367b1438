"""Distributed connected components over an edge (pair) stream.

The near-dedup family (flagship audio, text MinHash, embedding cosine)
reduces every modality to a verified pair stream and then needs the
transitive closure: cluster id = min member of the connected component.
Up to now that closure ran driver-side (``state/unionfind.py`` DSU or
the vectorized min-label ``dedup.py:cluster``) — fine while pairs fit
one process, and documented there as having a partitioned upgrade path.
This module IS that upgrade path: the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014 — a
public algorithm), re-expressed as Ray Data shuffles.

Shape per round (everything is (int64, int64) edges — no payload ever
moves):

- **large-star**: double each edge to both directions, hash-partition
  by the source node (``_part = mix64(u) % P``, ONE ``groupby``
  shuffle, P-bounded UDF dispatch — the exact.py pattern), and inside
  each partition one lexsort groups all segments: for every node ``u``
  with neighbors ``N(u)``, attach every *larger* neighbor to
  ``m = min(N(u) ∪ {u})``.
- **small-star**: direct each edge large→small, partition by the large
  end, attach every smaller neighbor (and ``u`` itself) to ``m``.

Both kernels canonicalize + dedupe their partition's output, so the
edge multiset stays ≤ one copy per partition and shrinks toward the
star fixed point. Convergence: the round operator is deterministic, so
the edge set is a fixed point iff one more round reproduces it — we
detect that with a content signature (count + sum and xor of per-edge
64-bit hashes, an order-independent set fingerprint; a false "equal"
needs a simultaneous sum+xor+count collision, ~2⁻¹²⁸). At the fixed
point the graph is a union of stars whose centers are component minima
(any non-min center is rewired by one of the two stars), so labels
read directly off the edges: ``hi → lo`` plus ``lo → lo``.

Rounds are O(log² n) worst case, ~log n in practice (SoCC '14 §5);
each round's cost is two pair-stream shuffles. The driver only ever
sees the 3-number signature per round.

Semantics match ``state/unionfind.py`` and the recursive-CTE min-label
SQL oracle used by ``embedding_clusters`` — proven by
``queries[embedding_clusters_dist]`` (same oracle, this engine) and
``tests/test_components.py`` (DSU parity on adversarial graphs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.hashing import combine64, mix64

DEFAULT_PARTITIONS = 32


def _canon_dedupe(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Canonical (lo, hi) orientation, self-loops dropped, exact dedupe."""
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    if not len(lo):
        return lo, hi
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    first = np.empty(len(lo), dtype=bool)
    first[0] = True
    np.logical_or(lo[1:] != lo[:-1], hi[1:] != hi[:-1], out=first[1:])
    return lo[first], hi[first]


def _star_kernel(
    u: np.ndarray, v: np.ndarray, large: bool
) -> tuple[np.ndarray, np.ndarray]:
    """One partition's star step, fully vectorized.

    Input: directed edges (u → v), every edge of a node's star
    co-located because the partition key is ``mix64(u) % P`` (the hash
    only routes; grouping below is on the true int64 ids, so 64-bit
    routing can never merge distinct nodes). One lexsort finds the
    segments; ``v[seg_start]`` is each segment's min neighbor because
    v is the secondary sort key.
    """
    if not len(u):
        return u, v
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    new_seg = np.empty(len(u), dtype=bool)
    new_seg[0] = True
    np.not_equal(u[1:], u[:-1], out=new_seg[1:])
    seg_start = np.flatnonzero(new_seg)
    seg_id = np.cumsum(new_seg) - 1
    m = np.minimum(v[seg_start], u[seg_start])  # min(N(u) ∪ {u})
    mm = m[seg_id]
    if large:
        mask = v > u
        return _canon_dedupe(mm[mask], v[mask])
    a = np.concatenate([mm, m])
    b = np.concatenate([v, u[seg_start]])
    return _canon_dedupe(a, b)


def _edges_table(lo: np.ndarray, hi: np.ndarray) -> pa.Table:
    return pa.table(
        {"lo": pa.array(lo, type=pa.int64()), "hi": pa.array(hi, type=pa.int64())}
    )


def _with_part(
    ds: ray.data.Dataset, key: str, partitions: int
) -> ray.data.Dataset:
    def _p(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (mix64(k, seed=0xC0C0) % np.uint64(partitions)).astype(np.int64)
        if "_part" in t.column_names:
            t = t.drop_columns(["_part"])
        return t.append_column("_part", pa.array(part))

    return ds.map_batches(_p, batch_format="pyarrow", zero_copy_batch=True)


def _star_pass(
    edges: ray.data.Dataset, large: bool, partitions: int
) -> ray.data.Dataset:
    """One star step = one keyed shuffle over the pair stream."""

    def _direct(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        if large:  # both directions — every node sees its full star
            u = np.concatenate([lo, hi])
            v = np.concatenate([hi, lo])
        else:  # large end owns the segment
            u, v = hi, lo
        return pa.table(
            {"u": pa.array(u, type=pa.int64()), "v": pa.array(v, type=pa.int64())}
        )

    def _star(t: pa.Table) -> pa.Table:
        lo, hi = _star_kernel(
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False),
            large,
        )
        return _edges_table(lo, hi)

    directed = edges.map_batches(
        _direct, batch_format="pyarrow", zero_copy_batch=True
    )
    return _with_part(directed, "u", partitions).groupby("_part").map_groups(
        _star, batch_format="pyarrow"
    )


def _edge_hash(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return mix64(
        combine64(lo.astype(np.uint64), hi.astype(np.uint64)), seed=0x51D
    )


def _signature(edges: ray.data.Dataset) -> tuple[int, int, int]:
    """Order-independent set fingerprint: (count, sum, xor) of per-edge
    hashes. Cross-partition duplicate edges (≤1 copy per partition,
    deterministic given the round's routing) are part of the state being
    fingerprinted, so a fixed point of the round operator still reads as
    equal signatures."""

    mask = (1 << 64) - 1

    def _h(t: pa.Table) -> pa.Table:
        h = _edge_hash(
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False),
        )
        # int64 columns carry the u64 bit patterns (lossless reinterpret);
        # the driver decodes each block's value back to u64 before folding,
        # so the fold is independent of how many blocks the data landed in
        x = int(np.bitwise_xor.reduce(h, initial=np.uint64(0)))
        s = int(np.sum(h, dtype=np.uint64))
        return pa.table(
            {
                "n": pa.array([len(h)], type=pa.int64()),
                "s": pa.array(np.array([s], dtype=np.uint64).view(np.int64)),
                "x": pa.array(np.array([x], dtype=np.uint64).view(np.int64)),
            }
        )

    parts = edges.map_batches(_h, batch_format="pyarrow", zero_copy_batch=True)
    n = s = x = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        n += int(np.sum(b["n"].to_numpy()))
        for piece in b["s"].to_numpy().view(np.uint64):
            s = (s + int(piece)) & mask
        for piece in b["x"].to_numpy().view(np.uint64):
            x ^= int(piece)
    return n, s, x


def connected_components(
    pairs: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    partitions: int = DEFAULT_PARTITIONS,
    max_rounds: int = 100,
) -> ray.data.Dataset:
    """(id, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id of the connected component. Node ids are
    int64; string ids go through the pairs-bounded hash→resolve pattern
    of ``similarity.py:audio_embedding_near_dup``.

    Input edges may repeat, be self-loops, or be arbitrarily oriented —
    the first canonicalization pass normalizes all of that.
    """

    def _canon_batch(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = _canon_dedupe(a, b)
        # nodes appearing ONLY in self-loops must still be labeled
        # ((id, id)): carry them as lo==hi rows AROUND the star rounds
        singles = np.unique(a[a == b])
        if len(singles):
            lo = np.concatenate([lo, singles])
            hi = np.concatenate([hi, singles])
        return _edges_table(lo, hi)

    def _real_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t["lo"], t["hi"]))

    def _self_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["lo"], t["hi"]))

    canon = pairs.map_batches(
        _canon_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    selfloops = canon.map_batches(
        _self_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    cur = canon.map_batches(
        _real_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    prev_sig = _signature(cur)
    converged = False
    for _ in range(max_rounds):
        cur = _star_pass(cur, large=True, partitions=partitions)
        cur = _star_pass(cur, large=False, partitions=partitions).materialize()
        sig = _signature(cur)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixed point in {max_rounds} rounds"
        )

    # At the fixed point every edge is (component_min, member). Labels:
    # hi → lo plus lo → lo; a second keyed pass collapses the ≤1-copy-
    # per-partition duplicates (min over identical values — exact).
    def _label_rows(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        ids = np.concatenate([hi, lo])
        lbl = np.concatenate([lo, lo])
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(lbl, type=pa.int64()),
            }
        )

    def _label_dedupe(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        lbl = t["cluster_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lbl, ids))
        ids, lbl = ids[order], lbl[order]
        first = np.empty(len(ids), dtype=bool)
        if len(ids):
            first[0] = True
            np.not_equal(ids[1:], ids[:-1], out=first[1:])
        return pa.table(
            {
                "id": pa.array(ids[first], type=pa.int64()),
                "cluster_id": pa.array(lbl[first], type=pa.int64()),
            }
        )

    # self-loop-only nodes join as (id, id) label rows; nodes with real
    # edges may get both (id, id) and (id, component_min) rows — the
    # min-per-id dedupe keeps the component min (labels are minima ≤ id)
    rows = cur.union(selfloops).map_batches(
        _label_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        _with_part(rows, "id", partitions)
        .groupby("_part")
        .map_groups(_label_dedupe, batch_format="pyarrow")
    )
