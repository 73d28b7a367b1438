"""funnel(): ordered per-key sequence matching (view → click → purchase).

Semantics under test:
- stage k counts only STRICTLY after stage k-1 (same-microsecond ties
  do not advance the funnel);
- events arriving out of order / before stage 1 are ignored;
- a missing middle stage blocks the funnel (no skipping);
- keys that never reach stage 1 are absent from the output;
- ``within_seconds`` caps every stage relative to first_ts;
- partition-layout invariance.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.windows import funnel

STAGES = ["view", "click", "purchase"]


def _ev(user, sec, typ):
    return {"user_id": user, "ts": pd.Timestamp("2024-01-01") +
            pd.Timedelta(seconds=sec), "event_type": typ}


ROWS = [
    # u1: click ties view at the same microsecond -> not strictly after
    _ev(1, 0, "view"), _ev(1, 0, "click"), _ev(1, 5, "purchase"),
    # u2: clean three-stage journey
    _ev(2, 0, "view"), _ev(2, 10, "click"), _ev(2, 20, "purchase"),
    # u3: pre-view click ignored; purchase BEFORE its click -> stage 2
    _ev(3, 0, "click"), _ev(3, 5, "view"), _ev(3, 6, "purchase"),
    _ev(3, 7, "click"),
    # u4: never views -> absent
    _ev(4, 0, "purchase"), _ev(4, 1, "click"),
    # u5: missing middle stage blocks the funnel
    _ev(5, 0, "view"), _ev(5, 5, "purchase"),
    # u6/u7: exercised by the within_seconds test
    _ev(6, 0, "view"), _ev(6, 2, "click"), _ev(6, 100, "purchase"),
    _ev(7, 0, "view"), _ev(7, 20, "click"),
    # non-stage noise everywhere
    _ev(1, 1, "error"), _ev(2, 1, "signup"), _ev(5, 1, "error"),
]


def _table():
    df = pd.DataFrame(ROWS)
    return pa.table({
        "user_id": pa.array(df["user_id"], type=pa.int64()),
        "ts": pa.array(df["ts"], type=pa.timestamp("us")),
        "event_type": pa.array(df["event_type"], type=pa.string()),
    })


def _run(**kw):
    out = funnel(rd.from_arrow(_table()), STAGES, **kw).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def test_funnel_semantics(ray_session):
    out = _run()
    got = out.set_index("user_id")
    assert sorted(got.index) == [1, 2, 3, 5, 6, 7]       # u4 absent
    assert got.loc[1, "stage_reached"] == 1              # tie != after
    assert got.loc[2, "stage_reached"] == 3
    assert got.loc[3, "stage_reached"] == 2              # purchase too early
    assert got.loc[5, "stage_reached"] == 1              # no click
    sec = (got["last_ts"] - got["first_ts"]).dt.total_seconds()
    assert sec.loc[2] == 20.0
    assert sec.loc[3] == 2.0                              # view@5 -> click@7
    assert sec.loc[1] == 0.0                              # last == first


def test_funnel_within_window(ray_session):
    got = _run(within_seconds=10.0).set_index("user_id")
    assert got.loc[6, "stage_reached"] == 2              # purchase@100 > 10s
    assert got.loc[7, "stage_reached"] == 1              # click@20 > 10s
    # u2: click at exactly +10s is INSIDE (<=); purchase at +20s is out
    assert got.loc[2, "stage_reached"] == 2


def test_funnel_layout_invariance(ray_session):
    a = _run()
    b = funnel(
        rd.from_arrow(_table()).repartition(7), STAGES, partitions=3
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_funnel_duplicate_stage_rejected(ray_session):
    with pytest.raises(ValueError):
        funnel(rd.from_arrow(_table()), ["view", "view"])


def test_funnel_null_ts_dropped(ray_session):
    # a NULL-ts stage event must not win the scatter-min (NaT would
    # round-trip to INT64_MIN) nor unlock later stages — SQL semantics
    t = pa.table({
        "user_id": pa.array([9, 9, 9], type=pa.int64()),
        "ts": pa.array([None, pd.Timestamp("2024-01-01 00:00:05"), None],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["view", "view", "click"]),
    })
    out = funnel(rd.from_arrow(t), STAGES).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "stage_reached"] == 1
    assert out.loc[0, "first_ts"] == pd.Timestamp("2024-01-01 00:00:05")
