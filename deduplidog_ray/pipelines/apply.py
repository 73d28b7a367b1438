"""Action application — consume the results table (the ``Change`` log
analog) and produce output datasets.

≙ reference effect sinks A1-A5 (deduplidog/deduplidog.py:613-696): rename /
delete / replace / symlink / redate. In a columnar engine these are not
filesystem mutations but dataset transforms driven by the ``action``
column, with the ``inspect`` (dry-run) mode ≙ S5 (deduplidog.py:44-47)
being simply *not* applying them — the results table already is the plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def keep_canonical(
    clips: ray.data.Dataset, results: ray.data.Dataset
) -> ray.data.Dataset:
    """The deduplicated output table: only canonical, non-quarantined rows.

    ≙ ``delete`` mode A2 applied to every duplicate (deduplidog.py:634-644),
    the standard training-data dedup consumption. Canonical ids are
    broadcast (ray.put once) — a semi-join filter, no shuffle.
    """
    ids = (
        results.map_batches(
            lambda t: t.select(["clip_id"]).filter(
                pa.compute.and_(
                    t["is_canonical"].combine_chunks()
                    if isinstance(t["is_canonical"], pa.ChunkedArray)
                    else t["is_canonical"],
                    pa.compute.not_equal(t["action"], "quarantine"),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()["clip_id"]
        .to_numpy()
    )
    ref = ray.put(pa.array(ids, type=pa.string()))
    _memo: dict[str, pa.Array] = {}

    def _filter(t: pa.Table) -> pa.Table:
        if "ks" not in _memo:
            _memo["ks"] = ray.get(ref)
        mask = pa.compute.is_in(t["clip_id"], value_set=_memo["ks"])
        return t.filter(mask)

    return clips.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def annotate_actions(
    clips: ray.data.Dataset, results: ray.data.Dataset
) -> ray.data.Dataset:
    """Attach (cluster_id, is_canonical, action) to every clip row —
    ≙ ``rename``/flag mode A1 (deduplidog.py:613-632): mark, don't drop.
    Broadcast map join (results are small relative to clip payloads)."""
    import pandas as pd

    rdf = results.select_columns(
        ["clip_id", "cluster_id", "is_canonical", "action"]
    ).to_pandas()
    # broadcast ONCE; per batch a vectorized pandas hash-merge, no
    # per-row Python (VERDICT r1 #9)
    ref = ray.put(rdf)
    _memo: dict[str, object] = {}

    def _annotate(t: pa.Table) -> pa.Table:
        if "m" not in _memo:
            _memo["m"] = ray.get(ref)
        m = _memo["m"]
        left = pd.DataFrame({"clip_id": t["clip_id"].to_pandas()})
        j = left.merge(m, on="clip_id", how="left")
        hit = j["cluster_id"].notna().to_numpy()
        cluster = np.where(hit, j["cluster_id"].to_numpy(), left["clip_id"].to_numpy())
        canon = np.where(hit, j["is_canonical"].to_numpy(), True).astype(bool)
        action = np.where(hit, j["action"].to_numpy(), "keep")
        for name, arr in [
            ("cluster_id", pa.array(cluster, type=pa.string())),
            ("is_canonical", pa.array(canon, type=pa.bool_())),
            ("action", pa.array(action, type=pa.string())),
        ]:
            if name in t.column_names:
                t = t.drop_columns([name])
            t = t.append_column(name, arr)
        return t

    return clips.map_batches(_annotate, batch_format="pyarrow", zero_copy_batch=True)


def open_log_path(base: str) -> str:
    """Collision-free log path: never overwrite, append ``(n)`` counter —
    ≙ reference ``open_log_file`` (deduplidog/utils.py:42-53)."""
    import os

    if not os.path.exists(base):
        return base
    stem, ext = os.path.splitext(base)
    n = 1
    while os.path.exists(f"{stem}({n}){ext}"):
        n += 1
    return f"{stem}({n}){ext}"
