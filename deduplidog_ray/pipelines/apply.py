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
    ids = set()
    for b in results.iter_batches(batch_size=65536, batch_format="pyarrow"):
        mask = np.asarray(b["is_canonical"].to_pylist(), dtype=bool)
        act = np.asarray(b["action"].to_pylist(), dtype=object)
        for cid in np.asarray(b["clip_id"].to_pylist(), dtype=object)[
            mask & (act != "quarantine")
        ]:
            ids.add(cid)
    ref = ray.put(ids)

    def _filter(t: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        m = np.array([c in keep for c in t["clip_id"].to_pylist()], dtype=bool)
        return t.take(pa.array(np.nonzero(m)[0]))

    return clips.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def annotate_actions(
    clips: ray.data.Dataset, results: ray.data.Dataset
) -> ray.data.Dataset:
    """Attach (cluster_id, is_canonical, action) to every clip row —
    ≙ ``rename``/flag mode A1 (deduplidog.py:613-632): mark, don't drop.
    Broadcast map join (results are small relative to clip payloads)."""
    table: dict[str, tuple] = {}
    for b in results.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for cid, cl, can, act in zip(
            b["clip_id"].to_pylist(),
            b["cluster_id"].to_pylist(),
            b["is_canonical"].to_pylist(),
            b["action"].to_pylist(),
        ):
            table[cid] = (cl, can, act)
    ref = ray.put(table)

    def _annotate(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["clip_id"].to_pylist()
        rows = [m.get(c, (c, True, "keep")) for c in ids]
        for name, arr in [
            ("cluster_id", pa.array([r[0] for r in rows], type=pa.string())),
            ("is_canonical", pa.array([r[1] for r in rows], type=pa.bool_())),
            ("action", pa.array([r[2] for r in rows], type=pa.string())),
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
