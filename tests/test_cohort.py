"""Cohort retention matrix + distinct-user timeline: planted scenarios
(dup rows, null user/ts, cross-partition users); SQL-oracle parity on
the real events table lives in test_queries_oracle.py
(cohort_retention, users_timeline)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplidog_ray.pipelines.cohort import (
    cohort_retention,
    distinct_users_timeline,
)

DAY_US = 86_400 * 1_000_000


def _events(user_day_pairs):
    us, ds_ = zip(*user_day_pairs)
    return rd.from_arrow(pa.table({
        "user_id": pa.array(us, pa.int64()),
        "ts": pa.array(
            (np.asarray(ds_, dtype=np.int64) * DAY_US + 12345)
            .astype("datetime64[us]")
        ),
    }))


def test_planted_matrix(ray_session):
    # u1 first day 0, active 0/1/2 (day-1 twice: distinct);
    # u2 first day 1, active 1; u3 first day 0, active 0 and 2
    ds = _events([(1, 0), (1, 1), (1, 1), (1, 2), (2, 1), (3, 0), (3, 2)])
    got = (
        cohort_retention(ds, partitions=8)
        .to_pandas()
        .sort_values(["cohort", "period"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame({
        "cohort": [0, 0, 0, 1],
        "period": [0, 1, 2, 1],
        "n_users": [2, 1, 2, 1],
    }).sort_values(["cohort", "period"]).reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))


def test_null_user_and_ts_dropped(ray_session):
    t = pa.table({
        "user_id": pa.array([1, None, 1], pa.int64()),
        "ts": pa.array(
            np.array([0, DAY_US, 2 * DAY_US], dtype=np.int64)
            .astype("datetime64[us]")
        ),
    })
    # null ts on the remaining real user
    t2 = pa.table({
        "user_id": pa.array([7], pa.int64()),
        "ts": pa.array([None], pa.timestamp("us")),
    })
    got = cohort_retention(
        rd.from_arrow(t).union(rd.from_arrow(t2)), partitions=4
    ).to_pandas()
    assert set(map(tuple, got.to_numpy())) == {(0, 0, 1), (0, 2, 1)}


def test_timeline_counts(ray_session):
    ds = _events([(1, 0), (2, 0), (1, 2), (3, 2), (3, 3)])
    got = distinct_users_timeline(ds, partitions=8).to_pydict()
    assert got["period"] == [0, 2, 3]
    assert got["new_users"] == [2, 1, 0]
    assert got["active_users"] == [2, 2, 1]
    assert got["cum_users"] == [2, 3, 3]


def test_empty_input(ray_session):
    t = pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
    })
    tl = distinct_users_timeline(rd.from_arrow(t), partitions=4)
    assert tl.num_rows == 0
    assert tl.schema.names == [
        "period", "new_users", "active_users", "cum_users"
    ]
