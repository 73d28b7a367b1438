"""argmax_per_key: greatest-row-per-group as an associative combiner —
pandas parity, deterministic tie-break, string keys, layout invariance
(the partial reduce must commute with block structure)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from deduplidog_ray.pipelines.stats import argmax_per_key


def _events(n=2000, keys=23, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, 50, n).astype(np.int64),   # heavy ts ties
        "event_type": rng.choice(list("abc"), n),
    })


def _ref(df, ascending=False):
    s = df.sort_values(["ts", "event_id"],
                       ascending=[ascending, True], kind="stable")
    return s.groupby("user_id", sort=False).head(1) \
        .sort_values("user_id").reset_index(drop=True)


def _run(ds, ascending=False):
    return (
        argmax_per_key(ds, key_col="user_id", order_col="ts",
                       tie_col="event_id", ascending=ascending,
                       partitions=7)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)[["event_id", "user_id", "ts", "event_type"]]
    )


def test_parity_and_ties(ray_session):
    df = _events()
    for asc in (False, True):
        got = _run(rd.from_arrow(pa.Table.from_pandas(df)), asc)
        pd.testing.assert_frame_equal(
            got, _ref(df, asc)[got.columns], check_dtype=False
        )


def test_layout_invariance(ray_session):
    df = _events(n=900, keys=4, seed=8)
    t = pa.Table.from_pandas(df)
    a = _run(rd.from_arrow(t))
    parts = [t.slice(0, 1), t.slice(1, 450), t.slice(451, 449)]
    b = _run(rd.from_arrow_refs([ray.put(p) for p in parts]))
    pd.testing.assert_frame_equal(a, b)


def test_string_keys(ray_session):
    df = _events(n=300, keys=3, seed=1)
    df["user_id"] = df["user_id"].map({0: "u0", 1: "u1", 2: "u2"})
    got = (
        argmax_per_key(
            rd.from_arrow(pa.Table.from_pandas(df)),
            key_col="user_id", order_col="ts", tie_col="event_id",
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ref = _ref(df)
    assert got["event_id"].tolist() == ref["event_id"].tolist()
