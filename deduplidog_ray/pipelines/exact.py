"""Exact deduplication + generic relational operators (SQL-verifiable).

≙ the reference's exact mode — stem-index join J1 + predicate P1
(deduplidog/deduplidog.py:285-288, :707-714): duplicates are rows equal on
the chosen key columns; the kept ("canonical") row is the minimum id —
the order-independent analog of "first match wins" (:492-494).

Pattern (scale note): never a row-comparison join — add a key-hash column
in a vectorized map_batches, then ONE groupby(hash) shuffle with per-group
keep-first. At 100 TB the shuffle moves each row once, partitioned by the
64-bit key hash; skew on a hot key only affects keep-first (O(group)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.hashing import combine64, hash_strings_u64, mix64


def add_key_hash(
    ds: ray.data.Dataset, key_cols: list[str], out_col: str = "_key_hash"
) -> ray.data.Dataset:
    """Vectorized 64-bit hash of the concatenated key columns."""

    def _hash(t: pa.Table) -> pa.Table:
        acc = None
        for c in key_cols:
            vals = t[c].to_pylist()
            h = hash_strings_u64([str(v) if v is not None else "\0" for v in vals],
                                 seed=0xDED)
            acc = h if acc is None else combine64(acc, h)
        if acc is None:
            acc = np.zeros(len(t), dtype=np.uint64)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, pa.array(acc.view(np.int64)))

    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)


def dedupe_exact(
    ds: ray.data.Dataset, key_cols: list[str], id_col: str
) -> ray.data.Dataset:
    """Keep, per duplicate group, the row with the minimum ``id_col``."""
    hashed = add_key_hash(ds, key_cols)

    def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)

    out = hashed.groupby("_key_hash").map_groups(_keep_first, batch_format="pandas")
    return out.drop_columns(["_key_hash"])


def duplicate_groups(
    ds: ray.data.Dataset, key_cols: list[str], id_col: str
) -> ray.data.Dataset:
    """Groups with >1 member: (canonical id, n_dups) per duplicated key.

    ≙ ``having_multiple_candidates`` ambiguity report (deduplidog.py:517-519).
    """
    hashed = add_key_hash(ds, key_cols)

    def _report(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return g.head(0)[[id_col]].assign(n_dups=pd.Series(dtype="int64"))
        gid = g[id_col].min()
        return pd.DataFrame({id_col: [gid], "n_dups": [len(g)]})

    return hashed.groupby("_key_hash").map_groups(_report, batch_format="pandas")


def anti_unique(
    ds: ray.data.Dataset, key_cols: list[str], id_col: str
) -> ray.data.Dataset:
    """Rows whose key matches NO other row — ``invert_selection`` semantics
    (deduplidog.py:128-129, :513-516): the anti-join / EXCEPT output."""
    hashed = add_key_hash(ds, key_cols)

    def _only_singletons(g: pd.DataFrame) -> pd.DataFrame:
        return g if len(g) == 1 else g.head(0)

    out = hashed.groupby("_key_hash").map_groups(
        _only_singletons, batch_format="pandas"
    )
    return out.drop_columns(["_key_hash"])
