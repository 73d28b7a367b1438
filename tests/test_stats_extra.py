"""weighted_sample / mad_outliers / group_corr: reference parity,
saturation and degenerate-group behavior, layout invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.sampling import weighted_sample
from deduplidog_ray.pipelines.stats import group_corr, mad_outliers


# ---------------------------------------------------------------- weighted
def _wdf(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "w": rng.integers(0, 2048, n).astype(np.int64),
    })


def test_weighted_rate_tracks_expectation(ray_session):
    df = _wdf()
    out = weighted_sample(
        rd.from_pandas(df), key_col="doc_id", weight_col="w",
        denom_log2=12,
    ).to_pandas()
    expect = df["w"].sum() / 4096
    assert abs(len(out) - expect) / expect < 0.05
    # kept rows are biased long: mean weight of kept ≫ population mean
    assert out["w"].mean() > 1.3 * df["w"].mean()


def test_weighted_saturation_and_zero(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "w": np.r_[np.full(50, 1 << 13), np.zeros(50)].astype(np.int64),
    })
    out = weighted_sample(rd.from_pandas(df), key_col="doc_id",
                          weight_col="w", denom_log2=12).to_pandas()
    assert sorted(out["doc_id"]) == list(range(50))  # w>=2^d kept, w=0 never


def test_weighted_layout_invariance_and_validation(ray_session):
    df = _wdf(seed=9)
    a = weighted_sample(rd.from_pandas(df), "doc_id", "w").to_pandas()
    b = weighted_sample(
        rd.from_pandas(df.sample(frac=1.0, random_state=0)), "doc_id", "w"
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    with pytest.raises(ValueError):
        weighted_sample(rd.from_pandas(df), "doc_id", "w", denom_log2=31)
    bad = df.copy()
    bad.loc[0, "w"] = -1
    with pytest.raises(Exception, match="negative"):
        weighted_sample(rd.from_pandas(bad), "doc_id", "w").to_pandas()


# ---------------------------------------------------------------- MAD
def test_mad_outliers_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"s{k}" for k in rng.integers(0, 9, n)],
        "n_chars": rng.integers(50, 400, n).astype(np.int64),
    })
    df.loc[:20, "n_chars"] = 100_000          # planted extremes
    out = mad_outliers(
        rd.from_pandas(df), key_col="source", val_col="n_chars", k=3,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    def _disc_median(s):                       # quantile_disc(0.5) rule
        v = np.sort(s.to_numpy())
        return v[int(np.ceil(0.5 * len(v))) - 1]

    med = df.groupby("source")["n_chars"].apply(_disc_median)
    absdev = (df["n_chars"] - df["source"].map(med)).abs()
    mad = absdev.groupby(df["source"]).apply(_disc_median)
    ref = (df["n_chars"] - df["source"].map(med)).abs() \
        > 3 * df["source"].map(mad)
    assert (out["is_outlier"].to_numpy() == ref.to_numpy()).all()
    assert out.loc[:20, "is_outlier"].all()    # extremes flagged


# ---------------------------------------------------------------- corr
def test_group_corr_matches_numpy(ray_session):
    rng = np.random.default_rng(11)
    n = 4000
    x = rng.integers(1, 1000, n).astype(np.int64)
    noise = rng.integers(-50, 50, n)
    df = pd.DataFrame({
        "source": [f"s{k}" for k in rng.integers(0, 6, n)],
        "x": x,
        "y": (x // 3 + noise).astype(np.int64),   # strongly correlated
    })
    out = group_corr(rd.from_pandas(df), "source", "x", "y") \
        .to_pandas().set_index("source")["corr_xy"]
    for s, g in df.groupby("source"):
        ref = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(out[s] - ref) < 1e-12, s
        assert out[s] > 0.9


def test_group_corr_zero_variance_nan(ray_session):
    df = pd.DataFrame({
        "source": ["a"] * 4,
        "x": np.array([5, 5, 5, 5], dtype=np.int64),
        "y": np.array([1, 2, 3, 4], dtype=np.int64),
    })
    out = group_corr(rd.from_pandas(df), "source", "x", "y").to_pandas()
    assert np.isnan(out["corr_xy"]).all()
