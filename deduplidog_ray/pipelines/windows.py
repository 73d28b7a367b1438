"""Stream-shaped window operators over an ordered, keyed events table.

Ray Data is a batch engine with no event-time watermarks (ray_guide):
stream semantics are expressed as "partition by key, sort by ts within the
partition, window with pandas" — the reference has no streaming concepts
either (SURVEY.md §2.10; its one ordered construct is the mtime-window
probe J3, utils.py:128-166). Ordering assumption: windows are computed
per key over that key's events sorted by ``ts``; cross-key order is
irrelevant.

Operators: tumbling aggregate (see also __ray_entry__ events_hourly),
sliding-window counts, and session windows (gap-based), each
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def sessionize(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> ray.data.Dataset:
    """Session windows: a new session starts when the gap from the previous
    event of the same key exceeds ``gap_seconds``.

    Output: (key, session_id [1-based per key], n_events, start_ts, end_ts).
    Key cardinality is the parallelism unit here; for high-cardinality keys
    group by ``hash(key) % P`` instead (the engine's standard partition
    pattern) — the windowing inside is unchanged.
    """

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy()
        gaps = np.diff(ts.astype("datetime64[ns]").astype(np.int64)) / 1e9
        new_sess = np.concatenate([[1], (gaps > gap_seconds).astype(np.int64)])
        sess = np.cumsum(new_sess)
        g = g.assign(_sess=sess)
        agg = g.groupby("_sess", sort=True).agg(
            n_events=(ts_col, "size"),
            start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max"),
        )
        agg = agg.reset_index().rename(columns={"_sess": "session_id"})
        agg.insert(0, key_col, g[key_col].iloc[0])
        return agg

    return ds.groupby(key_col).map_groups(_sessions, batch_format="pandas")


def sliding_window_counts(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: float = 3600.0,
    slide_seconds: float = 1800.0,
) -> ray.data.Dataset:
    """Sliding windows: event counts per (key, window_start) where windows
    advance by ``slide_seconds`` and span ``window_seconds``. An event in
    k = window/slide consecutive windows. Output: (key, window_start
    [epoch-seconds], n_events)."""
    k = int(round(window_seconds / slide_seconds))

    def _slide(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64) / 1e9
        base = np.floor(ts / slide_seconds).astype(np.int64)
        # event at slide-bucket b belongs to windows starting b-k+1 .. b
        starts = np.concatenate([base - i for i in range(k)])
        uniq, cnt = np.unique(starts, return_counts=True)
        return pd.DataFrame(
            {
                key_col: g[key_col].iloc[0],
                "window_start": (uniq * int(slide_seconds)).astype(np.int64),
                "n_events": cnt.astype(np.int64),
            }
        )

    return ds.groupby(key_col).map_groups(_slide, batch_format="pandas")
