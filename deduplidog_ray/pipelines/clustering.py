"""Distributed spherical k-means over an embedding column.

The clustering step of a training-data pipeline (SemDeDup-style semantic
bucketing, data-mixing strata, IVF coarse quantizers at corpus scale):
assign every row of a ``(vec_id, embedding: list<float>)`` table to one
of ``k`` cosine clusters, without the corpus ever leaving the workers.

Execution shape (the Ray-Data-native Lloyd's iteration):

- **Init** is a pure key function: the centroid seeds are the embeddings
  of the ``k`` rows with the smallest ``mix64(vec_id)`` — a streaming
  per-batch partial top-k followed by a tiny driver merge, so the seed
  set is identical for every run, resume and block layout (same rule as
  ``sampling.sample_hash`` membership; no RNG state anywhere).
- **Each iteration** broadcasts the ``(k, d)`` centroid matrix once via
  ``ray.put`` and runs one ``map_batches`` pass: a single ``(B, k)``
  matmul assigns the batch, ``np.add.at`` folds per-cluster float64
  partial sums, and the batch emits exactly ``k`` rows
  ``(cluster, sum[d], count)``. The driver reduces ``num_blocks × k``
  tiny rows — the corpus itself is never collected. At 100 TB this is
  the textbook combiner pattern: shuffle volume is O(blocks × k × d)
  floats per iteration, independent of row count.
- **Empty clusters** keep their previous centroid (deterministic, no
  re-seeding draw).
- **Final pass** re-broadcasts the converged centroids and emits the
  assignment ``(vec_id, cluster, cos)`` as a streaming transform.

Determinism note: per-cluster sums are accumulated in float64 and the
driver folds partials in sorted block order, so results are stable
across runs on the same layout; across *different* layouts, float
summation order can differ by ~1 ulp — enough to flip a point lying
exactly on a Voronoi boundary, never a separated one (the pytest gate
plants separated clusters and asserts bit-equal assignments against a
driver-side numpy Lloyd reference with the same init).

Reference analog: deduplidog groups duplicates by pairwise compare
(deduplidog.py:517-519); clustering by centroid is the scale-path
generalization used when "similar" must be decided corpus-wide, not
pairwise. The IVF coarse quantizer (similarity.py:_spherical_kmeans)
trains on a driver-side sample; this operator is the full-corpus,
all-rows-assigned variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.stages.hashing import mix64
from deduplidog_ray.pipelines.similarity import _mat_from_list_col, _normalize


def _seed_centroids(
    ds: ray.data.Dataset, k: int, id_col: str, vec_col: str, seed: int
) -> np.ndarray:
    """Embeddings of the k rows with smallest mix64(id) — deterministic,
    layout-invariant, one streaming pass (per-batch partial top-k, driver
    merges blocks × k candidate rows)."""

    def _partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.uint64)
        h = mix64(ids, seed=seed)
        take = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "_h": pa.array(h[take].astype(np.uint64)),
                id_col: pa.array(ids[take].astype(np.int64)),
                vec_col: t[vec_col].take(pa.array(take)),
            }
        )

    cand = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    hs = np.array([r["_h"] for r in cand], dtype=np.uint64)
    order = np.argsort(hs, kind="stable")[:k]
    mat = np.stack([np.asarray(cand[i][vec_col], dtype=np.float64)
                    for i in order])
    return _normalize(mat)


def kmeans_centroids(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
) -> np.ndarray:
    """Train the ``(k, d)`` unit centroid matrix only (no assignment
    pass) — the reusable half of ``kmeans_embeddings``, consumed by
    downstream operators that need both the assignment and the vectors
    in one pass (``semdedup.semantic_dedup``)."""
    cent = _seed_centroids(ds, k, id_col, vec_col, seed)
    # fewer rows than k: degrade to k' = n clusters (the seeding pass
    # found every row); k-sized count/sum arrays over a (<k, d) centroid
    # matrix would IndexError on the first update otherwise
    k = cent.shape[0]
    d = cent.shape[1]

    def _partials_fn(ref):
        def _p(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_mat_from_list_col(t[vec_col], np.float64))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "count": pa.array(counts),
                }
            )

        return _p

    for _ in range(iters):
        ref = ray.put(cent)
        parts = ds.map_batches(
            _partials_fn(ref), batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for row in parts:  # blocks × k tiny rows; fold in arrival order of
            c = row["cluster"]  # per-cluster float64 partials (see module note)
            sums[c] += np.asarray(row["vsum"], dtype=np.float64)
            counts[c] += row["count"]
        nz = counts > 0
        new = cent.copy()  # empty clusters keep previous centroid
        new[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(new)
    return cent


def kmeans_embeddings(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
) -> ray.data.Dataset:
    """Full-corpus spherical k-means → assignment dataset
    ``(vec_id, cluster:int64, cos:float64)``.

    ``k × d`` centroids broadcast per iteration; per-batch combiner
    partials keep every pass streaming. See module docstring for the
    execution shape and determinism contract.
    """
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
                "cos": pa.array(scores[np.arange(len(a)), a]),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_reference(
    ids: np.ndarray, mat: np.ndarray, k: int, iters: int, seed: int = 0x5EED
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side numpy Lloyd with the operator's exact init rule — the
    pytest parity oracle. Returns (assignments, centroids)."""
    h = mix64(ids.astype(np.uint64), seed=seed)
    order = np.argsort(h, kind="stable")[:k]
    cent = _normalize(mat[order].astype(np.float64))
    m = _normalize(mat.astype(np.float64))
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        new = cent.copy()
        for c in range(k):
            mask = assign == c
            if mask.any():
                new[c] = m[mask].mean(axis=0)
        cent = _normalize(new)
    return np.argmax(m @ cent.T, axis=1), cent
