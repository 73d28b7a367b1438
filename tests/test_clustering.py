"""Distributed spherical k-means: parity vs a driver-side numpy Lloyd
with the identical deterministic init, plus layout invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.clustering import (
    kmeans_embeddings,
    kmeans_reference,
)


def _separated(n_per: int = 120, k: int = 4, d: int = 16, seed: int = 7):
    """k well-separated unit clusters (axis-aligned cones) — assignment
    parity is then robust to float-summation-order differences."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(k):
        base = np.zeros(d)
        base[c] = 1.0
        pts = base + 0.05 * rng.normal(size=(n_per, d))
        rows.append(pts)
    mat = np.vstack(rows).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    perm = rng.permutation(len(mat))  # shuffle so clusters span blocks
    return ids[perm], mat[perm]


def _tbl(ids, mat):
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
        }
    )


def test_kmeans_matches_numpy_reference(ray_session):
    ids, mat = _separated()
    got = (
        kmeans_embeddings(rd.from_arrow(_tbl(ids, mat)), k=4, iters=6)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    want_assign, cent = kmeans_reference(ids, mat, k=4, iters=6)
    order = np.argsort(ids)
    assert (got["cluster"].to_numpy() == want_assign[order]).all()
    # cos column = similarity to the assigned centroid
    m = mat[order].astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    want_cos = np.einsum("ij,ij->i", m, cent[want_assign[order]])
    assert np.allclose(got["cos"].to_numpy(), want_cos, atol=1e-9)
    # every planted cluster recovered as a distinct label, sizes equal
    sizes = got.groupby("cluster").size()
    assert len(sizes) == 4 and (sizes == 120).all()


def test_kmeans_layout_invariant(ray_session):
    ids, mat = _separated(n_per=80, k=3)
    a = (
        kmeans_embeddings(rd.from_arrow(_tbl(ids, mat)), k=3, iters=5)
        .to_pandas().set_index("vec_id").sort_index()
    )
    b = (
        kmeans_embeddings(
            rd.from_arrow(_tbl(ids, mat)).repartition(13), k=3, iters=5
        )
        .to_pandas().set_index("vec_id").sort_index()
    )
    assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()
