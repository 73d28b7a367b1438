"""dense_hourly_counts: gap-filled per-key time series — pandas
reference parity, zero-bucket coverage, span guard, layout invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.windows import dense_hourly_counts


def _frame(n=2500, keys=11, seed=13):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 1000
    ts_us = base + rng.integers(0, 96 * 3600, n) * 1_000_000
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": pd.to_datetime(ts_us, unit="us"),
    })


def _ref(df):
    hb = (df["ts"].astype("int64") // 10**9 // 3600).astype(np.int64)
    d = pd.DataFrame({"user_id": df["user_id"], "hb": hb})
    rows = []
    for u, g in d.groupby("user_id"):
        counts = g["hb"].value_counts()
        for h in range(g["hb"].min(), g["hb"].max() + 1):
            rows.append((u, h, int(counts.get(h, 0))))
    return pd.DataFrame(rows, columns=["user_id", "hour_bucket",
                                       "n_events"]) \
        .sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)


def _run(df, partitions=5):
    return dense_hourly_counts(
        rd.from_pandas(df), partitions=partitions,
    ).to_pandas().sort_values(["user_id", "hour_bucket"]) \
        .reset_index(drop=True)


def test_matches_pandas_reference(ray_session):
    df = _frame()
    out = _run(df)
    pd.testing.assert_frame_equal(out, _ref(df))
    assert (out["n_events"] == 0).any()       # gaps actually filled


def test_zero_buckets_between_sparse_events(ray_session):
    df = pd.DataFrame({
        "user_id": np.array([7, 7], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01 00:30", "2024-01-01 05:10"]),
    })
    out = _run(df, partitions=2)
    assert len(out) == 6                       # hours 0..5 inclusive
    assert out["n_events"].tolist() == [1, 0, 0, 0, 0, 1]


def test_span_guard_raises(ray_session):
    df = pd.DataFrame({
        "user_id": np.array([1, 1], dtype=np.int64),
        "ts": pd.to_datetime(["2000-01-01", "2024-01-01"]),
    })
    with pytest.raises(Exception, match="max_rows"):
        dense_hourly_counts(
            rd.from_pandas(df), partitions=1,
            max_rows_per_partition=10_000,
        ).to_pandas()


def test_layout_invariance(ray_session):
    df = _frame(seed=29)
    a = _run(df, partitions=3)
    b = _run(df.sample(frac=1.0, random_state=1), partitions=13)
    pd.testing.assert_frame_equal(a, b)
