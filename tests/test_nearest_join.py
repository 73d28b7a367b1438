"""nearest_join_keyed semantics: reference are_contained probe order
(utils.py:138-147) — nearest |Δts| within ±range wins, ties prefer the
earlier side, a self-join row never matches itself but a distinct row at
the identical timestamp does."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.joins import nearest_join_keyed


def _events(rows):
    ids, users, ts = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(ids, type=pa.int64()),
            "user_id": pa.array(users, type=pa.int64()),
            "ts": pa.array(
                pd.to_datetime(list(ts), unit="s").astype("datetime64[us]")
            ),
        }
    )


def _run(t, range_seconds=600.0, exclude_self=True):
    ds = rd.from_arrow(t)
    out = nearest_join_keyed(
        ds,
        ds,
        key_col="user_id",
        ts_col="ts",
        payload_cols=["event_id"],
        range_seconds=range_seconds,
        exclude_self=exclude_self,
    ).to_pandas()
    if len(out) == 0 or "event_id" not in out.columns:
        return {}
    return dict(
        zip(
            out["event_id"].astype(int),
            out["nearest_ts"].astype("datetime64[s]").astype(np.int64),
        )
    )


def test_nearest_tie_prefers_earlier(ray_session):
    # event 2 at t=100 has neighbors at 90 and 110 (both Δ=10) → earlier
    got = _run(_events([(1, 7, 90), (2, 7, 100), (3, 7, 110)]))
    assert got[2] == 90
    assert got[1] == 100 and got[3] == 100


def test_nearest_strictly_closer_wins_either_side(ray_session):
    got = _run(_events([(1, 7, 90), (2, 7, 100), (3, 7, 104)]))
    assert got[2] == 104  # +4 beats −10
    assert got[3] == 100


def test_window_bound_and_self_exclusion(ray_session):
    # lone user-8 event: no match at all (itself excluded);
    # user-9 events 2000s apart: outside ±600 s window
    got = _run(
        _events([(1, 8, 100), (2, 9, 0), (3, 9, 2000)]), range_seconds=600.0
    )
    assert 1 not in got and 2 not in got and 3 not in got


def test_duplicate_timestamp_matches_at_delta_zero(ray_session):
    # two distinct events share (user, ts) → each matches the other (Δ=0),
    # beating a closer-than-anything-else neighbor at Δ=5
    got = _run(_events([(1, 7, 100), (2, 7, 100), (3, 7, 105)]))
    assert got[1] == 100 and got[2] == 100
    assert got[3] == 100


def test_matches_quadratic_reference(ray_session):
    rng = np.random.default_rng(11)
    rows = [
        (i, int(rng.integers(0, 5)), int(rng.integers(0, 3000)))
        for i in range(300)
    ]
    got = _run(_events(rows), range_seconds=300.0)
    # brute-force reference with the same tie rule
    want = {}
    for i, u, t in rows:
        best = None
        for j, u2, t2 in rows:
            if j == i or u2 != u or abs(t2 - t) > 300:
                continue
            key = (abs(t2 - t), t2)
            if best is None or key < best:
                best = key
        if best is not None:
            want[i] = best[1]
    assert got == want


def test_range_join_matches_quadratic_reference(ray_session):
    """range_join_keyed vs a brute-force all-pairs window scan, including
    same-ts pairs, key isolation, and the exclude-self guard."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from deduplidog_ray.pipelines.joins import range_join_keyed

    rng = np.random.default_rng(23)
    n = 400
    users = rng.integers(0, 9, n).astype(np.int64)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + rng.integers(0, 3_600_000_000, n).astype("timedelta64[us]")
    ts[10] = ts[11]; users[10] = users[11]        # planted same-ts pair
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(ts),
    })
    w_us = 120_000_000                             # ±120 s
    got = range_join_keyed(
        rd.from_arrow(t), rd.from_arrow(t),
        key_col="user_id", ts_col="ts",
        probe_cols=["event_id"], build_cols={"event_id": "match_id"},
        range_seconds=120.0, exclude_equal=("event_id", "match_id"),
    ).to_pandas()
    tsi = ts.astype(np.int64)
    want = set()
    for i in range(n):
        for j in range(n):
            if i != j and users[i] == users[j] and abs(tsi[i] - tsi[j]) <= w_us:
                want.add((i, j))
    got_pairs = set(zip(got["event_id"], got["match_id"]))
    assert got_pairs == want
    assert (10, 11) in want                        # planted pair is live
    # match_ts carries the BUILD row's timestamp
    m = got.set_index(["event_id", "match_id"])["match_ts"]
    for (i, j) in list(want)[:50]:
        assert np.datetime64(m.loc[(i, j)], "us") == ts[j]
    # layout invariance
    re6 = range_join_keyed(
        rd.from_arrow(t).repartition(6), rd.from_arrow(t).repartition(5),
        key_col="user_id", ts_col="ts",
        probe_cols=["event_id"], build_cols={"event_id": "match_id"},
        range_seconds=120.0, exclude_equal=("event_id", "match_id"),
    ).to_pandas()
    assert set(zip(re6["event_id"], re6["match_id"])) == want
