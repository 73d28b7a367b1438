"""peak_concurrency: global prefix-sum sweep with driver carry fold."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.sweep import peak_concurrency

US = 1_000_000


def _tbl(ts_us, types):
    return pa.table({
        "ts": pa.array(np.asarray(ts_us, dtype=np.int64)
                       .astype("datetime64[us]")),
        "event_type": pa.array(list(types)),
    })


def test_planted_peak_and_first_instant(ray_session):
    # three overlapping 10s intervals starting at 0, 2, 4 s; a fourth
    # at 100 s never overlaps. Peak 3, first attained at t=4 s.
    t = _tbl([0, 2 * US, 4 * US, 100 * US], ["a"] * 4)
    out = peak_concurrency(rd.from_arrow(t), window_ms=10_000,
                           bucket_seconds=60)
    assert out.to_pydict()["peak_concurrent"] == [3]
    assert out.to_pydict()["peak_ts"][0].timestamp() == 4.0


def test_half_open_boundary(ray_session):
    # interval [0, 10s) closes exactly when [10s, 20s) opens: the -1
    # sorts before the +1 at t=10s, so they never overlap — peak 1.
    t = _tbl([0, 10 * US], ["a", "a"])
    out = peak_concurrency(rd.from_arrow(t), window_ms=10_000,
                           bucket_seconds=60)
    assert out.to_pydict()["peak_concurrent"] == [1]
    assert out.to_pydict()["peak_ts"][0].timestamp() == 0.0


def test_cross_bucket_carry(ray_session):
    # 1-second buckets; long 10s intervals opened in bucket 0 stay open
    # into bucket 5, where a third opens: the peak needs the carry from
    # earlier buckets (each bucket alone sees at most +2 / +1 deltas).
    t = _tbl([0, int(0.5 * US), 5 * US], ["a"] * 3)
    out = peak_concurrency(rd.from_arrow(t), window_ms=10_000,
                           bucket_seconds=1)
    assert out.to_pydict()["peak_concurrent"] == [3]
    assert out.to_pydict()["peak_ts"][0].timestamp() == 5.0


def test_types_are_independent(ray_session):
    t = _tbl([0, 0, 0, 1 * US], ["a", "b", "a", "b"])
    out = peak_concurrency(rd.from_arrow(t), window_ms=5_000,
                           bucket_seconds=60)
    d = dict(zip(out.to_pydict()["event_type"],
                 out.to_pydict()["peak_concurrent"]))
    assert d == {"a": 2, "b": 2}


def test_null_ts_dropped_and_empty(ray_session):
    t = pa.table({
        "ts": pa.array([None, None], type=pa.timestamp("us")),
        "event_type": pa.array(["a", "b"]),
    })
    out = peak_concurrency(rd.from_arrow(t))
    assert out.num_rows == 0
    assert out.schema.names == ["event_type", "peak_concurrent",
                                "peak_ts"]


def test_random_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    ts = rng.integers(0, 3 * 3600 * US, n)
    types = rng.choice(["x", "y"], n)
    out = peak_concurrency(
        rd.from_arrow(_tbl(ts, types)), window_ms=120_000,
        bucket_seconds=600,
    ).to_pydict()
    W = 120_000_000
    for i, tname in enumerate(out["event_type"]):
        pts = sorted(
            [(int(t), 1) for t in ts[types == tname]]
            + [(int(t) + W, -1) for t in ts[types == tname]]
        )
        cur = peak = 0
        peak_t = None
        for t, d in pts:
            cur += d
            if cur > peak:
                peak, peak_t = cur, t
        assert out["peak_concurrent"][i] == peak
        assert out["peak_ts"][i] == pd.Timestamp(peak_t, unit="us")


def test_max_partials_guard(ray_session):
    t = _tbl([0, 3600 * US * 10], ["a", "a"])
    with pytest.raises(ValueError, match="max_partials"):
        peak_concurrency(rd.from_arrow(t), bucket_seconds=1,
                         max_partials=3)


def test_null_event_type_dropped(ray_session):
    """Null types drop at the scan: factorize would fold them into the
    LAST type's counts (codes -1 wrap). The SQL oracle's peaks-join on
    event_type never matches NULL, so exclusion IS oracle parity."""
    t = pa.table({
        "ts": pa.array(np.array([0, 1, 2, 3], dtype=np.int64)
                       .astype("datetime64[us]")),
        "event_type": pa.array([None, None, "a", "z"]),
    })
    out = peak_concurrency(rd.from_arrow(t), window_ms=1000,
                           bucket_seconds=3600).to_pydict()
    assert out["event_type"] == ["a", "z"]
    assert out["peak_concurrent"] == [1, 1]


def test_integer_type_column(ray_session):
    """A non-string type column (int64 category codes) round-trips: the
    output event_type column keeps the input Arrow type."""
    t = pa.table({
        "ts": pa.array(np.array([0, 1_000, 2_000], dtype=np.int64)
                       .astype("datetime64[us]")),
        "event_type": pa.array([7, 7, 9], type=pa.int64()),
    })
    out = peak_concurrency(rd.from_arrow(t), window_ms=5,
                           bucket_seconds=3600)
    assert out.schema.field("event_type").type == pa.int64()
    d = out.to_pydict()
    assert d["event_type"] == [7, 9]
    assert d["peak_concurrent"] == [2, 1]
