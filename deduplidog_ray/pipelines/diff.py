"""Snapshot diff: added / removed / changed rows between two dataset
versions.

The corpus-maintenance primitive next to incremental dedup
(pipelines/incremental.py): given yesterday's snapshot and today's, emit
exactly the rows whose presence or payload changed — the input a CDC
compaction, an index refresh, or an incremental re-embed step consumes.
≙ the reference's re-scan-and-compare loop (it re-walks both trees every
run and compares metadata per file, deduplidog.py:492-519) re-expressed
as a set operation over snapshots.

EXECUTION SHAPE (the 100-TB contract):

- Each side is tagged with a 1-byte ``_side`` column and the two sides
  ride ONE union → ONE ``hash(key) % P`` co-partitioning shuffle — never
  a driver-side collect, never a broadcast of either side (snapshots are
  both "large sides"; cf. joins.py:hash_join which this mirrors).
- Per partition, one vectorized pandas outer merge with an indicator
  decides added/removed, and NaN-safe column compares decide changed.
  P kernel dispatches total; unchanged rows (the overwhelming majority
  of a real snapshot pair) are dropped inside the kernel, so the output
  is ∝ |changes|, not ∝ |corpus|.
- ``hash_compare=True`` is the wide-payload path: each side reduces its
  compare columns to ONE uint64 row-hash BEFORE the exchange, so a row
  of multi-KB text ships 8 bytes. Statuses are identical to the value
  path modulo 64-bit collisions (~n·2⁻⁶⁴ false "unchanged"; same
  asymmetry note as decontam.py — acceptable for a diff report, use
  value compare when a false negative is destructive).

Keys must be unique within each snapshot (it is a *snapshot*, not a
log); the kernel validates and raises on duplicates rather than
emitting a cartesian diff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.hashing import hash_strings_u64, mix64

DEFAULT_PARTITIONS = 64


def _col_hash_u64(col: pa.ChunkedArray, seed: int) -> np.ndarray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_strings_u64(col.to_pylist(), seed=seed)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "f":
        # hash the BIT PATTERN: casting a float to uint64 truncates the
        # value (1.2 and 1.9 both became 1, a systematic false-unchanged)
        arr = np.ascontiguousarray(arr, dtype=np.float64).view(np.uint64)
        return mix64(arr, seed=seed)
    if arr.dtype.kind == "M":
        arr = arr.astype("datetime64[us]").astype(np.int64)
    return mix64(arr.astype(np.uint64), seed=seed)


def _tag_and_part(
    ds: ray.data.Dataset,
    side: int,
    key_cols: list[str],
    keep_cols: list[str],
    compare_cols: list[str],
    partitions: int,
    hash_compare: bool,
) -> ray.data.Dataset:
    def _f(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for i, kc in enumerate(key_cols):
            h = mix64(h ^ _col_hash_u64(t[kc], seed=0xD1FF + i))
        out = t.select(keep_cols)
        if hash_compare:
            rh = np.zeros(len(t), dtype=np.uint64)
            for i, cc in enumerate(compare_cols):
                rh = mix64(rh ^ _col_hash_u64(t[cc], seed=0xC0DE + i))
            out = out.append_column(
                "_rowhash", pa.array(rh.view(np.int64))
            )
        out = out.append_column(
            "_side", pa.array(np.full(len(t), side, dtype=np.int8))
        )
        return out.append_column(
            "_part",
            pa.array((h % np.uint64(partitions)).astype(np.int64)),
        )

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def _diff_partition(
    g: pd.DataFrame, key_cols: list[str], compare_cols: list[str]
) -> pd.DataFrame:
    g = g.drop(columns=["_part"])
    old = g[g["_side"] == 0].drop(columns=["_side"])
    new = g[g["_side"] == 1].drop(columns=["_side"])
    for side_name, side_df in (("old", old), ("new", new)):
        if side_df.duplicated(subset=key_cols).any():
            raise ValueError(
                f"dataset_diff: duplicate keys in the {side_name} snapshot "
                f"— dedupe by {key_cols} first (a snapshot is keyed)"
            )
    m = old.merge(
        new, on=key_cols, how="outer", suffixes=("_old", "_new"),
        indicator=True, sort=False,
    )
    merge_flag = m["_merge"].to_numpy()
    status = np.where(
        merge_flag == "left_only", "removed",
        np.where(merge_flag == "right_only", "added", "changed"),
    )
    both = merge_flag == "both"
    differs = np.zeros(len(m), dtype=bool)
    for c in compare_cols:
        a, b = m[f"{c}_old"], m[f"{c}_new"]
        differs |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
    keep = ~both | differs
    out = m.loc[keep, key_cols].copy()
    out["status"] = status[keep]
    return out


def dataset_diff(
    ds_old: ray.data.Dataset,
    ds_new: ray.data.Dataset,
    key_cols: list[str],
    compare_cols: list[str],
    partitions: int = DEFAULT_PARTITIONS,
    hash_compare: bool = False,
) -> ray.data.Dataset:
    """Diff two snapshots → (key_cols…, status ∈ added|removed|changed).

    Unchanged rows never leave the kernel. See module docstring for the
    exchange shape and the ``hash_compare`` wide-payload variant.
    """
    cmp_ship = [] if hash_compare else list(compare_cols)
    cmp_kernel = ["_rowhash"] if hash_compare else list(compare_cols)
    keep = list(key_cols) + cmp_ship
    a = _tag_and_part(ds_old, 0, key_cols, keep, compare_cols,
                      partitions, hash_compare)
    b = _tag_and_part(ds_new, 1, key_cols, keep, compare_cols,
                      partitions, hash_compare)
    return a.union(b).groupby("_part").map_groups(
        lambda g: _diff_partition(g, key_cols, cmp_kernel),
        batch_format="pandas",
    )
