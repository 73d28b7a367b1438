"""Global timeline sweeps — distributed prefix sums with carry.

The windows family (``pipelines/windows.py``) partitions every kernel by
a KEY: each user's sessions, each user's running totals. A concurrency
sweep has no key — "how many sessions are open right now" is a running
sum over the WHOLE timeline, and its maximum depends on every earlier
event. That is the classic parallel-scan shape: no hash partition makes
it embarrassingly parallel, but a two-pass scan does:

1. endpoints: each event opens an interval [ts, ts+window) → two skinny
   rows (+1 at ts, −1 at ts+window). Half-open, so a −1 at time t is
   processed BEFORE a +1 at the same t (sort key (t, delta)).
2. bucket pass (ONE groupby by coarse time bucket, e.g. hour): each
   bucket sorts its endpoints and computes three per-type partials —
   total delta, max running prefix, first timestamp attaining it. The
   bucket id gives a total order with no tie ambiguity (a bucket owns a
   disjoint time range by construction).
3. carry pass (driver): per type, the running sum of earlier buckets'
   totals is the carry into each bucket; the global peak is
   ``max(carry + bucket_max_prefix)`` and its timestamp comes from the
   EARLIEST bucket attaining it (buckets are time-ordered, so the first
   attaining bucket holds the earliest attaining instant).

Driver state is |types| × |buckets| partial rows — bounded by the data's
time range over the bucket width (the token_freq vocabulary-bound
argument), never by the event count. At 100 TB the event set streams
through one groupby; nothing else moves.

Reference analog: deduplidog has no timeline analytics — this is a
target-addition operator (SURVEY.md §2.10 streaming-shaped patterns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.pipelines.windows import _drop_null_ts

_PARTIAL_COLS = ("event_type", "bucket", "delta_sum", "max_prefix",
                 "peak_t")


def _sweep_partition(g: pd.DataFrame) -> pd.DataFrame:
    """One time bucket's endpoints → per-type partials. One lexsort by
    (type, t, delta) + segment prefix sums — no per-row Python."""
    if not len(g):
        return pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            "bucket": pd.Series(dtype=np.int64),
            "delta_sum": pd.Series(dtype=np.int64),
            "max_prefix": pd.Series(dtype=np.int64),
            "peak_t": pd.Series(dtype=np.int64),
        })
    codes, uniq = pd.factorize(g["event_type"], sort=False)
    t = g["t"].to_numpy()
    d = g["delta"].to_numpy()
    order = np.lexsort((d, t, codes))
    c, t_s, d_s = codes[order], t[order], d[order]
    n = len(c)
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    ends = np.r_[starts[1:], n]
    cs = np.cumsum(d_s)
    seg_off = np.r_[np.int64(0), cs[starts[1:] - 1]]
    seg_id = np.repeat(np.arange(len(starts)), ends - starts)
    prefix = cs - seg_off[seg_id]
    max_prefix = np.maximum.reduceat(prefix, starts)
    # first row of each segment attaining its max prefix
    at_max = prefix == max_prefix[seg_id]
    first_idx = np.minimum.reduceat(
        np.where(at_max, np.arange(n), n), starts
    )
    return pd.DataFrame({
        "event_type": uniq[c[starts]],
        "bucket": np.full(len(starts), g["bucket"].iloc[0],
                          dtype=np.int64),
        "delta_sum": cs[ends - 1] - seg_off,
        "max_prefix": max_prefix,
        "peak_t": t_s[first_idx],
    })


def peak_concurrency(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_ms: int = 300_000,
    bucket_seconds: int = 3600,
    max_partials: int = 50_000_000,
) -> pa.Table:
    """Per-type peak interval concurrency over the global timeline:
    (event_type, peak_concurrent, peak_ts) — the maximum number of
    simultaneously open [ts, ts+window) intervals and the FIRST instant
    attaining it. Bit-exact integers/timestamps vs a SQL window oracle
    (``SUM(delta) OVER (ORDER BY t, delta)`` + argmin-at-max).

    Two-pass distributed scan (module docstring): one groupby by coarse
    time bucket computes per-bucket partials; the driver folds the
    |types|×|buckets|-bounded carries. ``max_partials`` turns a
    pathological bucket count (nanosecond buckets over a decade) into an
    explicit error instead of a driver OOM."""
    import pyarrow.compute as pc

    win_us = np.int64(window_ms) * 1000
    bucket_us = np.int64(bucket_seconds) * 1_000_000
    # preserve the type column's Arrow type end-to-end (int codes, etc.);
    # fall back to string when the upstream schema can't say
    try:
        sch = ds.schema()
        ty_type = dict(zip(sch.names, sch.types)).get(type_col)
    except Exception:  # pragma: no cover - schema probe only
        ty_type = None
    if not isinstance(ty_type, pa.DataType):
        ty_type = pa.string()

    def _endpoints(tbl: pa.Table) -> pa.Table:
        # null event_type drops at the scan: factorize would fold those
        # rows into another type's counts, and the SQL oracle's
        # peaks-join on event_type never matches NULL anyway
        tbl = tbl.filter(pc.is_valid(tbl[type_col]))
        ts = tbl[ts_col].to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        ty = tbl[type_col]
        t = np.concatenate([ts, ts + win_us])
        delta = np.concatenate([
            np.ones(len(ts), dtype=np.int64),
            np.full(len(ts), -1, dtype=np.int64),
        ])
        return pa.table({
            "event_type": pa.concat_arrays(
                [ty.combine_chunks(), ty.combine_chunks()]
            ),
            "t": pa.array(t),
            "delta": pa.array(delta),
            "bucket": pa.array(t // bucket_us),
        })

    partials_ds = (
        _drop_null_ts(ds.select_columns([ts_col, type_col]), ts_col)
        .map_batches(_endpoints, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_sweep_partition, batch_format="pandas")
    )
    # the guard must fire WHILE partials stream in — materializing them
    # all first would be the very driver OOM it exists to prevent
    parts: list[pd.DataFrame] = []
    n_partials = 0
    for b in partials_ds.iter_batches(batch_format="pandas"):
        if not len(b):
            continue
        n_partials += len(b)
        if n_partials > max_partials:
            raise ValueError(
                f">{max_partials} sweep partials (max_partials); "
                f"raise bucket_seconds to bound driver state"
            )
        parts.append(b)
    out_schema = pa.schema([
        ("event_type", ty_type),
        ("peak_concurrent", pa.int64()),
        ("peak_ts", pa.timestamp("us")),
    ])
    if not parts:
        return out_schema.empty_table()
    p = pd.concat(parts, ignore_index=True)
    p = p.sort_values(["event_type", "bucket"], kind="stable")
    codes, uniq = pd.factorize(p["event_type"], sort=True)
    dsum = p["delta_sum"].to_numpy()
    # carry into each bucket: per-type exclusive prefix sum of totals
    cs = np.cumsum(dsum)
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    ends = np.r_[starts[1:], len(codes)]
    seg_off = np.r_[np.int64(0), cs[starts[1:] - 1]]
    seg_id = np.repeat(np.arange(len(starts)), ends - starts)
    carry = np.r_[np.int64(0), cs[:-1]] - seg_off[seg_id]
    carry[starts] = 0
    cand = carry + p["max_prefix"].to_numpy()
    peak = np.maximum.reduceat(cand, starts)
    at_max = cand == peak[seg_id]
    first_idx = np.minimum.reduceat(
        np.where(at_max, np.arange(len(codes)), len(codes)), starts
    )
    return pa.table({
        "event_type": pa.array(uniq, type=ty_type, from_pandas=True),
        "peak_concurrent": pa.array(peak, type=pa.int64()),
        "peak_ts": pa.array(
            p["peak_t"].to_numpy()[first_idx].astype("datetime64[us]")
        ),
    })
