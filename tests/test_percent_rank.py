"""group_percent_rank: SQL percent_rank() parity — min-rank tie
sharing, single-row groups, and block-layout invariance."""

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.stats import group_percent_rank


def _frame(n=2000, keys=13, seed=21):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"s{k}" for k in rng.integers(0, keys, n)],
        "n_chars": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
    })


def _ref(df):
    def _pr(s):
        r = s.rank(method="min")
        n = len(s)
        return (r - 1) / (n - 1) if n > 1 else pd.Series(0.0, index=s.index)
    out = df.copy()
    out["pct_rank"] = df.groupby("source")["n_chars"].transform(_pr)
    return out.sort_values("doc_id").reset_index(drop=True)


def _run(df, partitions=7):
    return group_percent_rank(
        rd.from_pandas(df), key_col="source", val_col="n_chars",
        partitions=partitions,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_matches_pandas_reference(ray_session):
    df = _frame()
    out = _run(df)
    ref = _ref(df)
    assert np.array_equal(
        out["pct_rank"].to_numpy().view(np.int64),
        ref["pct_rank"].to_numpy().view(np.int64),
    )  # bit-exact, not just allclose


def test_single_row_group_is_zero(ray_session):
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "source": ["solo", "pair", "pair"],
        "n_chars": np.array([5, 1, 9], dtype=np.int64),
    })
    out = _run(df, partitions=3).set_index("doc_id")
    assert out.loc[1, "pct_rank"] == 0.0
    assert out.loc[2, "pct_rank"] == 0.0 and out.loc[3, "pct_rank"] == 1.0


def test_all_ties_share_zero(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["s"] * 4,
        "n_chars": np.array([7, 7, 7, 7], dtype=np.int64),
    })
    out = _run(df, partitions=2)
    assert (out["pct_rank"] == 0.0).all()


def test_layout_invariance(ray_session):
    df = _frame(seed=4)
    a = _run(df, partitions=3)
    b = _run(df.sample(frac=1.0, random_state=0), partitions=17)
    pd.testing.assert_frame_equal(a, b)
