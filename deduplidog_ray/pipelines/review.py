"""Batch-shaped confirmation flow — reference A6 (``confirm_one_by_one``)
re-expressed for an engine with no interactive loop.

The reference asks y/n per duplicate pair at a terminal
(deduplidog.py:572-611 ``_should_affect`` / confirmation prompt). A
batch engine can't block a 10^12-row job on a human, but the WORKFLOW
still exists at scale: export the uncertain subset as a review queue,
let humans (or a stronger model) decide offline, join the decisions
back. Two operators:

- :func:`export_review_queue` — the results rows that would MUTATE data
  (non-canonical, action ≠ keep/quarantine), written as partitioned
  parquet with the cluster context a reviewer needs. The queue is the
  plan's risky slice; everything else proceeds unreviewed, exactly like
  the reference's default non-interactive mode.
- :func:`apply_confirmations` — a decisions table (clip_id, approve)
  joined back over the results: rejected rows flip to ``keep`` (with a
  ``review:rejected`` reason appended), approved/unreviewed rows pass
  through. Decisions are a human-sized table → broadcast once via
  ``ray.put``; the results stream, no shuffle.

Both are pure dataset transforms, so the confirmed plan feeds the same
effect sinks (pipelines/apply.py) unchanged, and re-running with the
same decisions is idempotent (pytest-gated).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def review_queue(results: ray.data.Dataset) -> ray.data.Dataset:
    """The rows a reviewer must see: non-canonical members whose action
    would mutate data (flag/drop/replace/link — not keep, not the
    already-safe quarantine)."""

    def _f(t: pa.Table) -> pa.Table:
        mutating = pc.invert(
            pc.is_in(t["action"], value_set=pa.array(["keep", "quarantine"]))
        )
        canon = (
            t["is_canonical"].combine_chunks()
            if isinstance(t["is_canonical"], pa.ChunkedArray)
            else t["is_canonical"]
        )
        return t.filter(pc.and_(pc.invert(canon), mutating))

    return results.map_batches(_f, batch_format="pyarrow",
                               zero_copy_batch=True)


def export_review_queue(results: ray.data.Dataset, out_path: str) -> int:
    """Write the review queue as parquet; returns the queued-row count."""
    q = review_queue(results)
    n = q.count()
    if n:
        q.write_parquet(out_path)
    return n


def apply_confirmations(
    results: ray.data.Dataset,
    decisions: "pa.Table | ray.data.Dataset",
    id_col: str = "clip_id",
) -> ray.data.Dataset:
    """Fold reviewer decisions back into the plan.

    ``decisions``: (clip_id, approve: bool). Rejected clip_ids flip to
    ``action='keep'`` and gain a ``review:rejected`` reason; approved or
    unreviewed rows are unchanged. Unknown clip_ids are ignored (the
    queue may have been exported from a superset run).
    """
    if isinstance(decisions, ray.data.Dataset):
        decisions = pa.Table.from_pandas(decisions.to_pandas())
    dec_ids = decisions[id_col].to_pylist()
    dec_ok = decisions["approve"].to_pylist()
    rejected = pa.array(
        [i for i, ok in zip(dec_ids, dec_ok) if not ok], type=pa.string()
    )
    ref = ray.put(rejected)

    def _f(t: pa.Table) -> pa.Table:
        rej = ray.get(ref)
        hit = pc.is_in(t[id_col], value_set=rej).to_numpy(
            zero_copy_only=False
        )
        if not hit.any():
            return t
        action = np.asarray(t["action"].to_pylist(), dtype=object)
        action[hit] = "keep"
        reasons = t["reasons"].to_pylist()
        out_reasons = [
            (r or []) + ["review:rejected"]
            if h and "review:rejected" not in (r or [])
            else (r or [])
            for r, h in zip(reasons, hit)
        ]
        t = t.drop_columns(["action", "reasons"])
        t = t.append_column("action", pa.array(action, type=pa.string()))
        return t.append_column(
            "reasons", pa.array(out_reasons, type=pa.list_(pa.string()))
        )

    return results.map_batches(_f, batch_format="pyarrow",
                               zero_copy_batch=True)
