"""Join operators: broadcast as-of/range join and broadcast semi/anti join.

≙ reference J3 — the ``are_contained`` timestamp-window probe
(utils.py:128-166): index one side by time, probe each row of the other at
t ± range, nearest first. Re-expressed as a BROADCAST join: the small side
(events per key, sorted) is ``ray.put`` ONCE; each map_batches task reads
it plasma-locally and answers probes with numpy ``searchsorted`` — no
shuffle at all. ≙ also J4, the JSON-sidecar lookup join (utils.py:196-205).

Scale note: this is the right shape whenever one side fits comfortably in
the object store (dimension tables, per-key indexes). For two large sides
the engine's pattern is the explicit bucket-hash join (ray_guide): add
``bucket = hash(key) % B`` to both, groupby bucket, join per group —
the dedup band shuffle (stages/candidates.py) is exactly that pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def build_sorted_index(
    df: pd.DataFrame, key_col: str, ts_col: str
) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """{key: (sorted ts int64ns, row ordinal)} — the broadcast side."""
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for k, g in df.groupby(key_col):
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
        order = np.argsort(ts, kind="stable")
        out[int(k)] = (ts[order], g.index.to_numpy()[order])
    return out


def asof_join_last_before(
    probe_ds: ray.data.Dataset,
    small_df: pd.DataFrame,
    probe_key: str,
    probe_ts: str,
    small_key: str,
    small_ts: str,
    out_cols: dict[str, str],
    strict: bool = False,
) -> ray.data.Dataset:
    """For each probe row: the small-side row with max ts <= probe ts
    (per key; ``strict=True`` uses < — excludes simultaneous rows, the
    self-join case). Inner-join semantics: probes with no match dropped.

    ``out_cols``: {output column name: probe column} for the emitted probe
    columns; the matched timestamp is emitted as ``last_ts``.
    """
    idx = build_sorted_index(small_df, small_key, small_ts)
    idx_ref = ray.put(idx)

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        index = ray.get(idx_ref)
        keys = df[probe_key].to_numpy()
        ts = df[probe_ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
        out_ts = np.full(len(df), np.iinfo(np.int64).min, dtype=np.int64)
        hit = np.zeros(len(df), dtype=bool)
        for k in np.unique(keys):
            ent = index.get(int(k))
            if ent is None:
                continue
            sts, _ = ent
            m = keys == k
            side = "left" if strict else "right"
            pos = np.searchsorted(sts, ts[m], side=side) - 1
            ok = pos >= 0
            vals = np.where(ok, sts[np.clip(pos, 0, None)], np.iinfo(np.int64).min)
            out_ts[m] = vals
            hit[m] = ok
        res = pd.DataFrame({name: df[src].to_numpy() for name, src in out_cols.items()})
        res["last_ts"] = pd.to_datetime(out_ts)
        return res[hit]

    return probe_ds.map_batches(_probe, batch_format="pandas", batch_size=8192)


def broadcast_semi_join(
    ds: ray.data.Dataset, keys, key_col: str, anti: bool = False
) -> ray.data.Dataset:
    """Semi/anti join against a broadcast key set.

    ≙ J5 semi/anti semantics (deduplidog.py:513-516): ``anti=True`` is
    ``invert_selection``. The key set is ray.put once; per batch it's an
    O(1) hash probe — no shuffle.
    """
    key_ref = ray.put(set(keys))

    def _filter(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        col = t[key_col].to_pylist()
        mask = np.array([(v in ks) != anti for v in col], dtype=bool)
        return t.take(pa.array(np.nonzero(mask)[0]))

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)
