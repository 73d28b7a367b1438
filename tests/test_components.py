"""Distributed connected components (alternating large-star/small-star):
parity vs a driver-side DSU on adversarial graphs, layout invariance,
and input normalization (duplicates / self-loops / arbitrary orientation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.components import connected_components


def _dsu_reference(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """min-label components via a plain numpy DSU (independent of the
    engine's UnionFind and of the distributed algorithm)."""
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            parent[rx] = ry
    lbl: dict[int, int] = {}
    for n in nodes:
        r = find(idx[int(n)])
        lbl.setdefault(r, int(n))
        lbl[r] = min(lbl[r], int(n))
    return {int(n): lbl[find(idx[int(n)])] for n in nodes}


def _pairs_ds(a, b, parallelism: int = 4) -> rd.Dataset:
    t = pa.table(
        {
            "a": pa.array(np.asarray(a, dtype=np.int64)),
            "b": pa.array(np.asarray(b, dtype=np.int64)),
        }
    )
    return rd.from_arrow(t).repartition(parallelism)


def _got(ds: rd.Dataset) -> dict[int, int]:
    df = ds.to_pandas()
    assert df["id"].is_unique
    return dict(zip(df["id"].astype(int), df["cluster_id"].astype(int)))


def test_random_graph_matches_dsu(ray_session):
    rng = np.random.default_rng(11)
    n, m = 600, 900
    a = rng.integers(0, n, size=m) * 7 + 3  # non-contiguous ids
    b = rng.integers(0, n, size=m) * 7 + 3
    keep = a != b
    a, b = a[keep], b[keep]
    got = _got(connected_components(_pairs_ds(a, b), partitions=8))
    assert got == _dsu_reference(a, b)


def test_long_path_worst_case(ray_session):
    # a single 3000-node path: the slowest-converging shape for
    # star-contraction — exercises the round loop, not just 1-hop stars
    n = 3000
    ids = np.arange(n, dtype=np.int64)[::-1] * 5 + 1  # descending, sparse
    a, b = ids[:-1], ids[1:]
    got = _got(connected_components(_pairs_ds(a, b), partitions=8))
    want = _dsu_reference(a, b)
    assert got == want
    assert set(got.values()) == {int(ids.min())}


def test_input_normalization_and_layout_invariance(ray_session):
    # duplicates, self-loops, both orientations; two different layouts
    a = np.array([1, 2, 2, 5, 5, 9, 9, 7, 30, 30], dtype=np.int64)
    b = np.array([2, 1, 3, 5, 6, 7, 7, 9, 31, 32], dtype=np.int64)
    want = _dsu_reference(*(lambda k: (a[k], b[k]))(a != b))
    for par in (1, 5):
        got = _got(connected_components(_pairs_ds(a, b, par), partitions=3))
        assert got == want


def test_two_components_and_labels_are_minima(ray_session):
    a = np.array([100, 101, 200, 201], dtype=np.int64)
    b = np.array([101, 102, 201, 202], dtype=np.int64)
    got = _got(connected_components(_pairs_ds(a, b), partitions=4))
    assert got == {100: 100, 101: 100, 102: 100, 200: 200, 201: 200, 202: 200}


def test_empty_pairs(ray_session):
    ds = connected_components(_pairs_ds([], []))
    assert ds.count() == 0
