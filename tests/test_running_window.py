"""running_agg_per_key: per-key cumulative sums + ordinals (the ROWS
UNBOUNDED PRECEDING frame) — pandas-reference parity, tie ordering by
the tiebreak column, and block-layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from deduplidog_ray.pipelines.windows import running_agg_per_key


def _frame(n=2000, keys=17, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, 500, n).astype(np.int64),  # many ts ties
        "val_cents": rng.integers(-50, 100, n).astype(np.int64),
    })


def _ref(df):
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    g = s.groupby("user_id", sort=False)
    return pd.DataFrame({
        "event_id": s["event_id"].to_numpy(),
        "rn_k": g.cumcount().to_numpy() + 1,
        "run_sum": g["val_cents"].cumsum().to_numpy(),
    }).set_index("event_id").sort_index()


def _run(ds):
    out = running_agg_per_key(
        ds, key_col="user_id", ts_col="ts", tie_col="event_id",
        val_col="val_cents", out_cols=["event_id", "user_id"],
        partitions=11,
    ).to_pandas()
    return out.set_index("event_id").sort_index()[["rn_k", "run_sum"]]


def test_running_parity(ray_session):
    df = _frame()
    got = _run(rd.from_arrow(pa.Table.from_pandas(df)))
    pd.testing.assert_frame_equal(got, _ref(df), check_dtype=False)


def test_layout_invariance(ray_session):
    df = _frame(n=900, keys=5, seed=4)
    t = pa.Table.from_pandas(df)
    a = _run(rd.from_arrow(t))
    parts = [t.slice(0, 123), t.slice(123, 456), t.slice(579, 321)]
    b = _run(rd.from_arrow_refs([ray.put(p) for p in parts]))
    pd.testing.assert_frame_equal(a, b)


def test_single_key_all_in_one_partition(ray_session):
    df = _frame(n=300, keys=1, seed=7)
    got = _run(rd.from_arrow(pa.Table.from_pandas(df)))
    ref = _ref(df)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # the last row in (ts, event_id) order carries the grand total
    last = df.sort_values(["ts", "event_id"]).iloc[-1]["event_id"]
    assert int(got.loc[last, "run_sum"]) == int(df["val_cents"].sum())
