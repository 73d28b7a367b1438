"""Distributed global sort with exact ranks — sample-based range partition.

The missing total-order primitive next to `global_top_n` (top-N without
sorting) and `epoch_shuffle` (hash-keyed positions): ORDER BY key
[DESC], tiebreak ASC over the whole corpus, emitting each row's exact
1-based global rank, without ever sorting the corpus in one task and
without `ds.sort()`'s opaque all-to-all.

Shape (the classic TeraSort / Spark range-partitioner plan, made
explicit so the shuffle volume is auditable):

1. **Sample pass** (keys only): every block emits a deterministic
   evenly-strided sample of the composite sort key; the driver picks
   P-1 boundary cuts at sample quantiles. Sample volume = blocks x s.
2. **Count pass** (keys only): per-block `searchsorted` histogram
   against the boundaries; the driver prefix-sums exact bucket counts
   into rank offsets. Volume = blocks x P tiny count rows.
3. **Shuffle pass** (the only full-data exchange): tag `_part` by
   boundary bucket, ONE `groupby(_part)` shuffle, each partition task
   sorts its range locally (numpy argsort) and stamps
   `rank = offset[part] + local ordinal`. Every data row moves once.

Boundaries only balance the load; **ranks are exact regardless of the
sample** because offsets come from the exact count pass. A skewed
sample degrades balance, never correctness.

Keys: integer sort key and a unique integer tiebreak, packed into one
int64 composite (`(key_enc << 32) | tie`) so every comparison in every
pass is a single vectorized int64 op. Bounds are asserted, not assumed
(|key| < 2^30, 0 <= tie < 2^32); wider keys want a two-level
tuple-boundary variant — raise, never silently mis-rank.

≙ no reference analog (the reference never globally orders, SURVEY
§2.10); this is a target-side addition from the task sheet's
relational-coverage axis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_KEY_LIM = 1 << 30
_TIE_LIM = 1 << 32


def _composite(t: pa.Table, key_col: str, tie_col: str,
               descending: bool) -> np.ndarray:
    # nulls would arrive as float NaN, cast to int64 min, and WRAP past
    # the |key| < 2^30 overflow guard (|int64 min| is itself negative) —
    # an arbitrary rank instead of the contract's explicit refusal
    if t[key_col].null_count or t[tie_col].null_count:
        raise ValueError(
            "distributed_sort_rank: null key/tie values cannot be "
            "ranked; filter them or assign sentinels upstream"
        )
    key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tie = t[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(key):
        if int(np.abs(key).max()) >= _KEY_LIM:
            raise OverflowError(
                f"sort key |{key_col}| >= 2^30: use the tuple-boundary "
                "variant, refusing to mis-rank"
            )
        if int(tie.min()) < 0 or int(tie.max()) >= _TIE_LIM:
            raise OverflowError(f"tiebreak {tie_col} outside [0, 2^32)")
    enc = (_KEY_LIM - 1 - key) if descending else (key + _KEY_LIM)
    return (enc << np.int64(32)) | tie


def distributed_sort_rank(
    ds: ray.data.Dataset,
    key_col: str,
    tie_col: str,
    descending: bool = False,
    partitions: int = 64,
    sample_per_block: int = 64,
    rank_col: str = "rnk",
) -> ray.data.Dataset:
    """Globally sort ``ds`` by (``key_col`` asc|desc, ``tie_col`` asc) and
    append the exact 1-based global rank. ``tie_col`` must be unique
    (it is in every engine id column) — equal composites would get
    arbitrary relative ranks."""

    # -- pass 1: strided per-block samples of the composite key ----------
    def _sample(t: pa.Table) -> pa.Table:
        comp = np.sort(_composite(t, key_col, tie_col, descending))
        if len(comp) > sample_per_block:
            idx = np.linspace(0, len(comp) - 1, sample_per_block).astype(
                np.int64
            )
            comp = comp[idx]
        return pa.table({"comp": pa.array(comp, type=pa.int64())})

    keys_ds = ds.select_columns([key_col, tie_col])
    samples = np.sort(np.asarray(
        [r["comp"] for r in keys_ds.map_batches(
            _sample, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()],
        dtype=np.int64,
    ))
    if len(samples) == 0:
        empty = ds.map_batches(
            lambda t: t.append_column(
                rank_col, pa.array(np.zeros(len(t), dtype=np.int64))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return empty
    p = min(partitions, max(1, len(samples)))
    cut_idx = (np.arange(1, p) * len(samples)) // p
    bounds = np.unique(samples[cut_idx])          # sorted, possibly < p-1

    # -- pass 2: exact bucket counts -> rank offsets ----------------------
    nb = len(bounds) + 1

    def _count(t: pa.Table) -> pa.Table:
        comp = _composite(t, key_col, tie_col, descending)
        bucket = np.searchsorted(bounds, comp, side="right")
        return pa.table({
            "bucket": pa.array(np.arange(nb, dtype=np.int64)),
            "cnt": pa.array(np.bincount(bucket, minlength=nb)
                            .astype(np.int64)),
        })

    counts = np.zeros(nb, dtype=np.int64)
    for r in keys_ds.map_batches(
        _count, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        counts[r["bucket"]] += r["cnt"]
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    # -- pass 3: the one full-data shuffle + per-range local sort ---------
    def _tag(t: pa.Table) -> pa.Table:
        comp = _composite(t, key_col, tie_col, descending)
        bucket = np.searchsorted(bounds, comp, side="right")
        t = t.append_column("_comp", pa.array(comp))
        return t.append_column("_part", pa.array(bucket.astype(np.int64)))

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        order = np.argsort(g["_comp"].to_numpy(), kind="stable")
        g = g.iloc[order].drop(columns=["_comp", "_part"])
        g[rank_col] = offsets[part] + np.arange(1, len(g) + 1,
                                                dtype=np.int64)
        return g

    tagged = ds.map_batches(_tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    return tagged.groupby("_part").map_groups(_rank, batch_format="pandas")
