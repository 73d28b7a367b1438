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
