"""key_skew_report: exact counts/shares on a planted-skew key
distribution, cross-batch partial merging, layout invariance."""

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.stats import key_skew_report


def _frame(seed=5):
    rng = np.random.default_rng(seed)
    # one mega-key (40%), one hot key (20%), long tail
    n = 10_000
    keys = np.r_[
        np.full(4000, 0), np.full(2000, 1),
        rng.integers(2, 500, 4000),
    ].astype(np.int64)
    rng.shuffle(keys)
    return pd.DataFrame({"k": keys})


def test_planted_skew_measured_exactly(ray_session):
    df = _frame()
    out = key_skew_report(rd.from_pandas(df).repartition(8), "k", top=5)
    assert out["k"].tolist()[:2] == [0, 1]
    assert out["n_rows"].tolist()[:2] == [4000, 2000]
    assert out["share_bp"].tolist()[:2] == [4000, 2000]  # 40.00%, 20.00%
    vc = df["k"].value_counts()
    for _, row in out.iterrows():
        assert vc[row["k"]] == row["n_rows"]


def test_layout_invariance(ray_session):
    df = _frame(seed=9)
    a = key_skew_report(rd.from_pandas(df).repartition(3), "k", top=10)
    b = key_skew_report(
        rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(11),
        "k", top=10,
    )
    pd.testing.assert_frame_equal(a, b)


def test_string_keys(ray_session):
    df = pd.DataFrame({"k": ["a"] * 6 + ["b"] * 3 + ["c"]})
    out = key_skew_report(rd.from_pandas(df), "k", top=3)
    assert out["k"].tolist() == ["a", "b", "c"]
    assert out["share_bp"].tolist() == [6000, 3000, 1000]
