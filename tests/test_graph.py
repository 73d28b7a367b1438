"""Graph operators: transition-edge extraction + integer PageRank.

Semantics pinned here (tie-break order, null-node chain break, null-ts
drop, local vs distributed bit-parity, overflow guard); SQL-oracle
parity for the real events table lives in test_queries_oracle.py
(click_edges, pagerank_clicks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(rows):
    import ray.data

    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "node"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["node"] = df["node"].astype("Int64")
    return ray.data.from_pandas(df)


def _edges_dict(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return {
        (int(s), int(d)): int(w)
        for s, d, w in zip(
            t["src"].to_pylist(), t["dst"].to_pylist(), t["w"].to_pylist()
        )
    }


def test_transition_edges_semantics(ray_session):
    from deduplidog_ray.pipelines.graph import transition_edges

    ds = _events(
        [
            # user 1: 10 -> 20 -> 10 (ordered by ts)
            (1, 1, "2024-01-01 00:00:00", 10),
            (2, 1, "2024-01-01 00:01:00", 20),
            (3, 1, "2024-01-01 00:02:00", 10),
            # user 2: same-ts tie broken by event_id: 30 -> 40
            (5, 2, "2024-01-01 00:00:00", 40),
            (4, 2, "2024-01-01 00:00:00", 30),
            # user 3: null node breaks the chain (no 10 -> 20 edge)
            (6, 3, "2024-01-01 00:00:00", 10),
            (7, 3, "2024-01-01 00:01:00", None),
            (8, 3, "2024-01-01 00:02:00", 20),
            # user 4: single event, no transitions
            (9, 4, "2024-01-01 00:00:00", 99),
        ]
    )
    got = _edges_dict(transition_edges(ds))
    assert got == {(10, 20): 1, (20, 10): 1, (30, 40): 1}


def test_transition_edges_null_ts_dropped(ray_session):
    from deduplidog_ray.pipelines.graph import transition_edges

    ds = _events(
        [
            (1, 1, "2024-01-01 00:00:00", 10),
            (2, 1, None, 55),  # dropped at the scan
            (3, 1, "2024-01-01 00:02:00", 20),
        ]
    )
    assert _edges_dict(transition_edges(ds)) == {(10, 20): 1}


def test_transition_edges_weights_aggregate(ray_session):
    from deduplidog_ray.pipelines.graph import transition_edges

    rows = []
    eid = 0
    for u in range(20):  # spread across hash partitions
        for i in range(5):  # 10->20->10->20->10 per user
            rows.append(
                (eid, u, f"2024-01-01 00:0{i}:00", 10 if i % 2 == 0 else 20)
            )
            eid += 1
    got = _edges_dict(transition_edges(_events(rows)))
    assert got == {(10, 20): 40, (20, 10): 40}


def _ring_edges():
    import ray.data

    # 4-cycle with one heavy shortcut: hand-checkable, no symmetry
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": [0, 1, 2, 3, 0],
                "dst": [1, 2, 3, 0, 2],
                "w": [3, 1, 1, 1, 1],
            }
        ).astype(np.int64)
    )


def test_pagerank_local_matches_reference_loop(ray_session):
    from deduplidog_ray.pipelines.graph import pagerank

    got = pagerank(_ring_edges(), iters=10, mode="local")
    # independent re-derivation with python ints (no numpy)
    edges = [(0, 1, 3), (1, 2, 1), (2, 3, 1), (3, 0, 1), (0, 2, 1)]
    od = {0: 4, 1: 1, 2: 1, 3: 1}
    r = {v: 10**9 for v in range(4)}
    for _ in range(10):
        nxt = {v: 150_000_000 for v in range(4)}
        for s, d, w in edges:
            nxt[d] += (85 * r[s] * w) // (100 * od[s])
        r = nxt
    want = {v: r[v] for v in range(4)}
    got_map = dict(
        zip(got["node"].to_pylist(), got["rank_scaled"].to_pylist())
    )
    assert got_map == want


def test_pagerank_dist_bit_identical_to_local(ray_session):
    from deduplidog_ray.pipelines.graph import pagerank

    a = pagerank(_ring_edges(), iters=7, mode="local")
    b = pagerank(_ring_edges(), iters=7, mode="dist")
    assert a.sort_by("node").equals(b.sort_by("node"))


def test_pagerank_dangling_mass_drops(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.graph import pagerank

    # 0 -> 1, 1 is dangling: its mass evaporates each step
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": [0], "dst": [1], "w": [1]}).astype(np.int64)
    )
    t = pagerank(ds, iters=10, mode="local")
    total = sum(t["rank_scaled"].to_pylist())
    assert total < 2 * 10**9  # strictly below the initial mass
    m = dict(zip(t["node"].to_pylist(), t["rank_scaled"].to_pylist()))
    # node 0 converges to base alone (no in-edges)
    assert m[0] == 150_000_000


def test_pagerank_overflow_guard(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.graph import pagerank

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"src": [0], "dst": [1], "w": [2**40]}
        ).astype(np.int64)
    )
    with pytest.raises(OverflowError):
        pagerank(ds, iters=2, mode="local", scale=10**12)


def test_pagerank_empty_edges(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.graph import pagerank

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": pd.Series([], dtype=np.int64),
                "dst": pd.Series([], dtype=np.int64),
                "w": pd.Series([], dtype=np.int64),
            }
        )
    )
    t = pagerank(ds, iters=3, mode="local")
    assert t.num_rows == 0
    # regression: dist mode crashed on the empty concat
    t2 = pagerank(ds, iters=3, mode="dist")
    assert t2.num_rows == 0 and t2.schema.equals(t.schema)


# ---------------------------------------------------------------- triangles


def _brute_triangles(src, dst):
    from itertools import combinations

    nodes = sorted({*src, *dst})
    adj = {n: set() for n in nodes}
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return sum(
        1
        for a, b, c in combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def test_triangle_count_random_vs_brute(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.graph import triangle_count

    rng = np.random.default_rng(11)
    for nv, ne in [(1, 1), (30, 90), (80, 600), (25, 25)]:
        src = rng.integers(0, nv, ne)
        dst = rng.integers(0, nv, ne)
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"src": src, "dst": dst, "w": np.ones(ne, np.int64)}
            ).astype(np.int64)
        )
        got = triangle_count(ds)["n_triangles"][0].as_py()
        assert got == _brute_triangles(src, dst), (nv, ne)


def test_triangle_count_direction_and_multiplicity(ray_session):
    """One triangle regardless of edge direction, duplicates, self-loops."""
    import ray.data

    from deduplidog_ray.pipelines.graph import triangle_count

    src = [0, 1, 2, 2, 0, 0, 1]
    dst = [1, 2, 0, 0, 1, 0, 1]   # (2,0) twice reversed, (0,1) dup, loops
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"src": src, "dst": dst, "w": [1] * len(src)}
        ).astype(np.int64)
    )
    assert triangle_count(ds)["n_triangles"][0].as_py() == 1


def test_triangle_count_hub_star_plus_clique(ray_session):
    """A 500-spoke star (0 triangles) + K6 (20 triangles): the degree-
    ordered wedge kernel must not blow up on the hub and must unrank
    large C(d,2) segments exactly."""
    import ray.data

    from deduplidog_ray.pipelines.graph import triangle_count

    hub_src = np.zeros(500, np.int64)
    hub_dst = np.arange(10, 510, dtype=np.int64)
    k6 = np.array(
        [(a, b) for a in range(1000, 1006) for b in range(a + 1, 1006)],
        np.int64,
    )
    src = np.r_[hub_src, k6[:, 0]]
    dst = np.r_[hub_dst, k6[:, 1]]
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"src": src, "dst": dst, "w": np.ones(len(src), np.int64)}
        )
    )
    assert triangle_count(ds)["n_triangles"][0].as_py() == 20


def test_wedge_unranking_exact():
    """The vectorized segment-pair expansion inside _wedge_partition
    (stages/segments.py, shared with the LSH candidate stage) must
    reproduce itertools.combinations for every segment size."""
    from itertools import combinations

    from deduplidog_ray.pipelines.graph import _wedge_partition

    # one node with d higher-rank neighbors → C(d,2) wedge rows
    for d in [2, 3, 7, 50, 331]:
        nbrs = np.arange(1, d + 1, dtype=np.int64)
        g = pd.DataFrame(
            {"n": np.zeros(d, np.int64), "nbr": nbrs}
        )
        nodes_sorted = np.arange(0, d + 1, dtype=np.int64)
        rank_of = np.arange(0, d + 1, dtype=np.int64)  # node 0 lowest
        out = _wedge_partition(g, (nodes_sorted, rank_of)).to_pandas()
        exp = np.array(list(combinations(nbrs, 2)))
        got = out.sort_values(["u", "v"]).to_numpy()
        exp = exp[np.lexsort((exp[:, 1], exp[:, 0]))]
        assert np.array_equal(got, exp), d


# ------------------------------------------------------------- co-occurrence


def test_cooccurrence_pairs_vs_brute(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.graph import cooccurrence_pairs

    rng = np.random.default_rng(5)
    n = 800
    df = pd.DataFrame({
        "key": rng.integers(0, 40, n),
        "item": rng.integers(0, 25, n),
    }).astype(np.int64)
    got = (
        cooccurrence_pairs(
            ray.data.from_pandas(df), "key", "item", min_support=2
        )
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    # brute force over distinct (key, item)
    ki = df.drop_duplicates()
    m = ki.merge(ki, on="key")
    m = m[m.item_x < m.item_y]
    exp = (
        m.groupby(["item_x", "item_y"]).size().reset_index(name="n_keys")
    )
    exp = exp[exp.n_keys >= 2].rename(
        columns={"item_x": "item_a", "item_y": "item_b"}
    ).sort_values(["item_a", "item_b"]).reset_index(drop=True)
    exp["n_keys"] = exp["n_keys"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_cooccurrence_pairs_strings_nulls_dups(ray_session):
    """String items pair in VALUE order; nulls and duplicate (key, item)
    rows are ignored (DISTINCT + join semantics)."""
    import ray.data

    from deduplidog_ray.pipelines.graph import cooccurrence_pairs

    df = pd.DataFrame({
        "key": ["u1", "u1", "u1", "u2", "u2", "u2", None, "u3"],
        "item": ["b", "a", "a", "a", "b", None, "a", "a"],
    })
    got = (
        cooccurrence_pairs(
            ray.data.from_pandas(df), "key", "item", min_support=1
        )
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {"item_a": "a", "item_b": "b", "n_keys": 2}
    ]


def test_triangle_count_string_nodes(ray_session):
    """String node tables (what transition_edges emits for string node
    columns) count triangles correctly — wedges run in node-index
    space, so the kernel never casts node values to int64."""
    import ray.data as rd

    from deduplidog_ray.pipelines.graph import triangle_count

    src = ["a", "b", "c", "c", "d"]
    dst = ["b", "c", "a", "d", "a"]
    ds = rd.from_pandas(pd.DataFrame(
        {"src": src, "dst": dst, "w": [1] * len(src)}
    ))
    got = triangle_count(ds, partitions=4)["n_triangles"][0].as_py()
    assert got == _brute_triangles(src, dst) == 2


def test_cooccurrence_int32_with_empty_partitions(ray_session):
    """Empty/all-null partitions must emit partials with the SAME item
    Arrow type as non-empty ones (int32 here), or the downstream pair
    groupby sees mismatched block schemas."""
    import ray.data as rd

    from deduplidog_ray.pipelines.graph import cooccurrence_pairs

    t = pa.table({
        "key": pa.array([1, 1, 2, 2, None], type=pa.int64()),
        "item": pa.array([10, 20, 10, 20, 30], type=pa.int32()),
    })
    out = cooccurrence_pairs(
        rd.from_arrow(t), key_col="key", item_col="item",
        min_support=1, partitions=16,   # >> |keys|: most partitions empty
    ).to_pandas().sort_values(["item_a", "item_b"]).reset_index(drop=True)
    assert out["item_a"].tolist() == [10]
    assert out["item_b"].tolist() == [20]
    assert out["n_keys"].tolist() == [2]
