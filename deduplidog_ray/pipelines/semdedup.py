"""SemDeDup — semantic deduplication via k-means bucketing + within-
cluster cosine pruning (Abbas, Tirumala, Simig, Ganguli, Morcos,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540 — a public method).

The near-dup family's other members prune by *content* similarity
(MinHash shingles, Hamming fingerprints, exact cosine pairs at a high
threshold). SemDeDup prunes by *semantic* similarity at scale by never
forming a global candidate graph at all: a spherical k-means pass
buckets the corpus into k clusters, the pairwise cosine graph is formed
only *inside* each cluster, and each within-cluster duplicate component
keeps exactly one representative — per the paper, the member with the
LOWEST cosine to its cluster centroid (the least prototypical example;
deterministic tie-break: smaller id).

Ray-Data shape:

- centroid training reuses ``clustering.kmeans_centroids`` (per-batch
  combiner partials; shuffle volume O(blocks × k × d) per iteration,
  never the corpus);
- ONE assignment ``map_batches`` emits ``(id, cluster, ccos, vec)`` —
  assignment and vector travel together, so no join back;
- ONE ``groupby(cluster)`` shuffle co-locates each semantic bucket;
  the per-cluster kernel tiles the similarity matmul (``tile × |c|``
  memory, never ``|c|²`` at once), extracts above-threshold pairs, and
  runs a vectorized min-label component propagation.

Partitioning assumption (document per the operator contract): cluster
sizes are bounded by the CHOICE of k — the paper's regime is
k ≈ n/10⁴..10⁵ so a cluster fits one worker. A pathological giant
cluster concentrates one task; the fix is raising k (semantics change
tracks the paper, which also re-clusters at fixed per-cluster size).

Verified by ``tests/test_semdedup.py`` (bit-equal parity vs a driver-
side numpy reference implementing the same spec end-to-end on separated
fixtures, planted duplicate families, keep-rule check, layout
invariance) and exposed as ``queries[semantic_dedup]`` (rows-only:
k-means is iterative — same class as ``embedding_kmeans``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.pipelines.clustering import kmeans_centroids
from deduplidog_ray.pipelines.similarity import _mat_from_list_col, _normalize


def _components_min_label(
    n: int, pa_: np.ndarray, pb: np.ndarray
) -> np.ndarray:
    """Vectorized min-label propagation over an edge list on [0, n):
    labels converge to the component minimum in O(diameter) rounds of
    two ``np.minimum.at`` scatters — no per-row Python."""
    lbl = np.arange(n, dtype=np.int64)
    while True:
        prev = lbl.copy()
        # pull the smaller label across each edge, both directions
        m = np.minimum(lbl[pa_], lbl[pb])
        np.minimum.at(lbl, pa_, m)
        np.minimum.at(lbl, pb, m)
        # pointer jumping: chase labels-of-labels to speed convergence
        lbl = np.minimum(lbl, lbl[lbl])
        if np.array_equal(lbl, prev):
            return lbl


def _prune_cluster(
    ids: np.ndarray,
    m: np.ndarray,
    ccos: np.ndarray,
    threshold: float,
    tile: int,
) -> np.ndarray:
    """Keep-mask for one cluster: pairwise cosine ≥ threshold connects;
    each component keeps argmin(ccos) (ties → smaller id)."""
    n = len(ids)
    if n <= 1:
        return np.ones(n, dtype=bool)
    order = np.argsort(ids, kind="stable")  # id-order: determinism anchor
    ids, m, ccos = ids[order], m[order], ccos[order]
    pas, pbs = [], []
    for s in range(0, n, tile):
        e = min(n, s + tile)
        sim = m[s:e] @ m.T  # (tile, n) — never (n, n) at once
        ii, jj = np.nonzero(sim >= threshold)
        keep = (ii + s) < jj  # upper triangle only
        pas.append((ii + s)[keep])
        pbs.append(jj[keep])
    pa_ = np.concatenate(pas) if pas else np.empty(0, dtype=np.int64)
    pb = np.concatenate(pbs) if pbs else np.empty(0, dtype=np.int64)
    if not len(pa_):
        keep_mask = np.ones(n, dtype=bool)
    else:
        lbl = _components_min_label(n, pa_, pb)
        # representative per component: lowest centroid-cosine, tie →
        # smallest id; lexsort on (ccos, position) — position IS id order
        rep = np.zeros(n, dtype=bool)
        comp_order = np.lexsort((np.arange(n), ccos, lbl))
        lbl_sorted = lbl[comp_order]
        first = np.empty(n, dtype=bool)
        first[0] = True
        np.not_equal(lbl_sorted[1:], lbl_sorted[:-1], out=first[1:])
        rep[comp_order[first]] = True
        keep_mask = rep
    out = np.zeros(n, dtype=bool)
    out[order] = keep_mask  # back to input positions
    return out


def semantic_dedup(
    ds: ray.data.Dataset,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
    tile: int = 4096,
) -> ray.data.Dataset:
    """(id, cluster, ccos, keep) for every row; ``keep`` marks the rows
    surviving semantic dedup. Filter on ``keep`` for the pruned corpus;
    the full table is emitted so the drop set is auditable (the same
    results-table-is-the-plan contract as the flagship)."""
    cent = kmeans_centroids(
        ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    ref = ray.put(cent)

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_mat_from_list_col(t[vec_col], np.float64))
        scores = m @ c.T
        a = np.argmax(scores, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "ccos": pa.array(scores[np.arange(len(a)), a]),
                vec_col: t[vec_col],
            }
        )

    assigned = ds.map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True
    )

    def _cluster_kernel(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_mat_from_list_col(t[vec_col], np.float64))
        ccos = t["ccos"].to_numpy(zero_copy_only=False)
        keep = _prune_cluster(ids, m, ccos, threshold, tile)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": t["cluster"],
                "ccos": t["ccos"],
                "keep": pa.array(keep),
            }
        )

    return assigned.groupby("cluster").map_groups(
        _cluster_kernel, batch_format="pyarrow"
    )


def semantic_dedup_reference(
    ids: np.ndarray,
    mat: np.ndarray,
    k: int,
    threshold: float,
    iters: int = 8,
    seed: int = 0x5EED,
) -> dict[int, bool]:
    """Driver-side numpy reference implementing the identical spec
    (kmeans_reference init+Lloyd, full |c|² similarity, min-ccos keep)
    — the pytest parity oracle. Returns id → keep."""
    from deduplidog_ray.pipelines.clustering import kmeans_reference

    assign, cent = kmeans_reference(ids, mat, k=k, iters=iters, seed=seed)
    m = _normalize(mat.astype(np.float64))
    out: dict[int, bool] = {}
    for c in range(k):
        mask = assign == c
        cids = ids[mask]
        if not len(cids):
            continue
        cm = m[mask]
        order = np.argsort(cids, kind="stable")
        cids, cm = cids[order], cm[order]
        ccos = cm @ cent[c]
        sim = cm @ cm.T
        n = len(cids)
        adj_a, adj_b = np.nonzero(np.triu(sim >= threshold, k=1))
        lbl = _components_min_label(n, adj_a, adj_b) if len(adj_a) else (
            np.arange(n)
        )
        for comp in np.unique(lbl):
            members = np.flatnonzero(lbl == comp)
            rep = members[np.lexsort((members, ccos[members]))[0]]
            for i in members:
                out[int(cids[i])] = bool(i == rep)
    return out
