"""debounce_events: survivors are exactly the session-opening rows of
sessionize at the same gap — pandas-reference parity, tie handling at
equal timestamps, and block-layout invariance."""

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.windows import debounce_events, sessionize


def _frame(n=3000, keys=23, seed=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    ts_us = base + rng.integers(0, 6 * 3600, n) * 1_000_000
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "event_type": rng.choice(["a", "b"], n),
    })


def _ref(df, gap=1800.0):
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev = s.groupby("user_id", sort=False)["ts"].shift(1)
    keep = prev.isna() | (
        (s["ts"] - prev).dt.total_seconds() > gap
    )
    return s[keep.to_numpy()]["event_id"].sort_values().to_numpy()


def _run(df, partitions=9):
    ds = rd.from_pandas(df)
    out = debounce_events(
        ds, gap_seconds=1800.0,
        out_cols=["event_id", "user_id", "ts", "event_type"],
        partitions=partitions,
    ).to_pandas()
    return out


def test_matches_pandas_reference(ray_session):
    df = _frame()
    out = _run(df)
    assert sorted(out["event_id"]) == sorted(_ref(df))
    # full-row passthrough: surviving rows carry their original payload
    merged = out.merge(df, on="event_id", suffixes=("", "_orig"))
    assert (merged["event_type"] == merged["event_type_orig"]).all()
    assert (merged["user_id"] == merged["user_id_orig"]).all()


def test_one_survivor_per_session(ray_session):
    """|debounce(ds)| == total sessionize sessions at the same gap."""
    df = _frame(seed=11)
    ds = rd.from_pandas(df)
    n_debounced = len(_run(df))
    sess = sessionize(ds, gap_seconds=1800.0, partitions=9).to_pandas()
    assert n_debounced == len(sess)


def test_equal_ts_ties_keep_lowest_tie_once(ray_session):
    """Two events at the identical timestamp: the lower event_id opens the
    session, the other is a 0-second gap and is dropped."""
    df = pd.DataFrame({
        "event_id": np.array([5, 2], dtype=np.int64),
        "user_id": np.array([1, 1], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
        "event_type": ["x", "y"],
    })
    out = _run(df, partitions=3)
    assert out["event_id"].tolist() == [2]


def test_layout_invariance(ray_session):
    df = _frame(seed=3)
    a = _run(df, partitions=4)
    b = _run(df.sample(frac=1.0, random_state=0), partitions=17)
    assert sorted(a["event_id"]) == sorted(b["event_id"])
