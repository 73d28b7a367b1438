"""Cohort retention and distinct-user timelines — the derived-dimension
distinct-count matrix.

The windows family answers per-key questions (each user's sessions); the
sweep answers global running sums. A retention matrix is a third shape:
every user gets a DERIVED dimension (their cohort = first active period,
a min over all their rows), and the answer is a distinct-count per
(derived dim × activity period) cell. SQL needs a self-join back through
the derived dimension; the distributed form needs exactly ONE exchange:

1. scan → skinny distinct-ish (user, period) rows (in-batch dedup is a
   free combiner; exactness doesn't depend on it).
2. hash(user) % P exchange — a user's whole history co-locates, so the
   kernel computes cohort = min(period) exactly AND counts each user in
   each period exactly once. Partials are (cohort, period, n_users)
   cells — |periods|²-bounded per partition, corpus-independent.
3. one tiny (cohort, period) grouped sum. Partition counts are additive
   because users never straddle partitions.

Periods are integer indices ``epoch_us // (period_seconds·1e6)`` —
integer floor division in BOTH engines (DuckDB ``epoch_us(ts) // N``),
so the oracle match is bit-exact with no float boundary risk.

Reference analog: none (deduplidog has no timeline analytics); this is
a target-addition operator (SURVEY.md §2.10 streaming-shaped patterns)
— the corpus-QA question "how much of each week's newly ingested data
is still active / duplicated later" shares the shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.pipelines.windows import (
    DEFAULT_PARTITIONS,
    _add_part,
    _drop_null_ts,
)


def _cohort_partition(g: pd.DataFrame) -> pa.Table:
    """All users of one hash partition → (cohort, period, n_users)
    partial cells. One lexsort by (user code, period); the first row of
    a user's run IS the cohort (min period). Arrow out: the cell
    groupby downstream sorts ~10× faster over Arrow blocks."""
    empty = pa.table({
        "cohort": pa.array([], pa.int64()),
        "period": pa.array([], pa.int64()),
        "n_users": pa.array([], pa.int64()),
    })
    if not len(g):
        return empty
    codes, _ = pd.factorize(g["_u"], sort=False)
    per = g["_period"].to_numpy()
    order = np.lexsort((per, codes))
    c, p = codes[order], per[order]
    # drop duplicate (user, period) rows: distinct semantics
    first = np.r_[True, (c[1:] != c[:-1]) | (p[1:] != p[:-1])]
    c, p = c[first], p[first]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    lens = np.diff(np.r_[starts, len(c)])
    cohort = np.repeat(p[starts], lens)          # per-row cohort
    # count users per (cohort, period) cell: cohort is constant per
    # user and period spans are tiny vs int64 — pack into one key
    delta = p - cohort                           # ≥ 0 by the sort
    if len(delta) and (
        int(delta.max()) >= (1 << 31) or int(np.abs(p).max()) >= (1 << 32)
    ):
        raise ValueError(
            "period index span too wide for the 31-bit cell packing; "
            "raise period_seconds"
        )
    comb = cohort * (1 << 31) + delta
    uniq, cnt = np.unique(comb, return_counts=True)
    return pa.table({
        "cohort": pa.array(uniq >> 31),
        "period": pa.array((uniq >> 31) + (uniq & ((1 << 31) - 1))),
        "n_users": pa.array(cnt.astype(np.int64)),
    })


def _cohort_cells(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    period_seconds: int,
    partitions: int,
) -> ray.data.Dataset:
    """Shared single-exchange core: (cohort, period, n_users) cells."""
    import pyarrow.compute as pc

    period_us = np.int64(period_seconds) * 1_000_000

    def _skinny(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        ts = t[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = pa.table({
            "_u": t[key_col],
            "_period": pa.array(ts // period_us),
        })
        # in-batch (user, period) dedup: a pure combiner — the kernel
        # dedups again after the exchange, this just shrinks the shuffle
        dd = pa.TableGroupBy(out, ["_u", "_period"]).aggregate([])
        return dd.rename_columns(["_u", "_period"])

    skinny = (
        _drop_null_ts(ds.select_columns([key_col, ts_col]), ts_col)
        .map_batches(_skinny, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        _add_part(skinny, "_u", partitions)
        .groupby("_part")
        .map_groups(_cohort_partition, batch_format="pandas")
        .groupby(["cohort", "period"])
        .sum("n_users")
        .map_batches(
            lambda t: t.rename_columns(["cohort", "period", "n_users"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def cohort_retention(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """Retention matrix: for every (cohort, period) cell, the number of
    DISTINCT users whose first-ever activity fell in ``cohort`` and who
    were active in ``period`` — the standard cohort-retention analytic.
    Periods are integer day indices (``epoch_us // (period_seconds·1e6)``).

    Null timestamps and null users drop at the scan (windows-family
    convention; SQL's COUNT over a join on user_id skips NULLs anyway).
    Output: (cohort, period, n_users), only non-empty cells, bit-exact
    integers vs the SQL self-join oracle.
    """
    return _cohort_cells(ds, key_col, ts_col, period_seconds, partitions)


def distinct_users_timeline(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
    partitions: int = DEFAULT_PARTITIONS,
) -> pa.Table:
    """Per-period distinct-user accounting: (period, new_users,
    active_users, cum_users) — how many distinct users were active,
    how many were seen for the FIRST time, and the running total of
    distinct users ever seen (the "distinct count over time" curve,
    exact, no sketch).

    Derived entirely from the cohort matrix (one corpus exchange):
    active(p) = Σ_cohort cells(c, p); new(p) = cells(p, p);
    cum(p) = running Σ new — folded on the driver over |periods|²
    cells (period-index-bounded, never the corpus).
    """
    cells_parts = list(
        _cohort_cells(ds, key_col, ts_col, period_seconds, partitions)
        .iter_batches(batch_format="pyarrow")
    )
    schema = pa.schema([
        ("period", pa.int64()),
        ("new_users", pa.int64()),
        ("active_users", pa.int64()),
        ("cum_users", pa.int64()),
    ])
    if not cells_parts:
        return schema.empty_table()
    cells = pa.concat_tables(cells_parts)
    coh = cells["cohort"].to_numpy()
    per = cells["period"].to_numpy()
    n = cells["n_users"].to_numpy()
    periods = np.unique(per)
    pos = np.searchsorted(periods, per)
    active = np.zeros(len(periods), dtype=np.int64)
    np.add.at(active, pos, n)
    new = np.zeros(len(periods), dtype=np.int64)
    diag = coh == per
    np.add.at(new, pos[diag], n[diag])
    return pa.table({
        "period": pa.array(periods),
        "new_users": pa.array(new),
        "active_users": pa.array(active),
        "cum_users": pa.array(np.cumsum(new)),
    }, schema=schema)
