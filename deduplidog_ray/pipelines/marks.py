"""Marker maintenance operators — the reference's notebook cleanup
helpers re-expressed over the results table.

- :func:`strip_flag_prefix` ≙ `remove_prefix_in_workdir`
  (/root/reference/deduplidog/utils.py:169-174): undo a previous run's
  rename action by removing the flag prefix from every name — the
  inverse of A1. In the table model names are a column, so the undo is
  one vectorized Arrow pass instead of an rglob + per-file rename.
- :func:`link_only_groups` ≙ `mark_symlink_only_dirs`
  (utils.py:190-193: "if the directory is full of only symlinks,
  mark it"): duplicate groups whose every non-canonical member has
  already been converted to a link — fully materialized groups a
  cleanup pass can collapse. The per-directory scan becomes one
  grouped aggregate.
- :func:`mark_links_by_target` ≙ `mark_symlink_by_target`
  (utils.py:177-187): flag link rows whose canonical target sits under
  a given prefix — the path-containment test on the target becomes a
  vectorized starts_with over the canonical id column.

SCALE SHAPE: strip/mark are streaming `map_batches` (no shuffle);
`link_only_groups` is one hash aggregate over (cluster, action) —
|groups|-bounded, the same shape as G2 `having_multiple_candidates`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

FLAG_PREFIX = "✓"       # ✓ — the reference's processed marker
LINK_MARK = "→"         # → — the reference's symlink marker


def strip_flag_prefix(
    ds: ray.data.Dataset,
    name_col: str = "clip_id",
    prefix: str = FLAG_PREFIX,
) -> ray.data.Dataset:
    """Remove ``prefix`` from the start of ``name_col`` wherever present
    (other rows untouched); adds ``was_flagged`` bool."""

    def _strip(t: pa.Table) -> pa.Table:
        names = t[name_col]
        hit = pc.starts_with(names, prefix)
        n = len(prefix)
        stripped = pc.if_else(
            hit, pc.utf8_slice_codeunits(names, n, 2**31 - 1), names
        )
        idx = t.schema.get_field_index(name_col)
        t = t.set_column(idx, name_col, stripped)
        return t.append_column("was_flagged", hit)

    return ds.map_batches(_strip, batch_format="pyarrow",
                          zero_copy_batch=True)


def mark_links_by_target(
    ds: ray.data.Dataset,
    target_prefix: str,
    action_col: str = "action",
    target_col: str = "canonical_id",
    name_col: str = "clip_id",
) -> ray.data.Dataset:
    """Prefix ``name_col`` with the link marker for rows whose action is
    'link' AND whose link target sits UNDER ``target_prefix`` as a path
    (the target equals the prefix, or continues with '/'); adds
    ``marked`` bool.

    Containment is segment-aware: 'store/1' does NOT claim
    'store/10/...'. The reference helper uses a raw startswith
    (utils.py:186) — we implement the documented intent (directory
    containment), the same documented-intent-over-broken-letter call
    as the casefold normalizer (SURVEY §1.1)."""
    tp = target_prefix.rstrip("/")

    def _mark(t: pa.Table) -> pa.Table:
        is_link = pc.equal(pc.coalesce(t[action_col], ""), "link")
        tgt = pc.coalesce(t[target_col], "")
        in_tree = pc.or_(
            pc.equal(tgt, tp), pc.starts_with(tgt, tp + "/")
        )
        hit = pc.and_(is_link, in_tree)
        marked = pc.if_else(
            hit,
            pc.binary_join_element_wise(
                pa.array([LINK_MARK] * len(t)), t[name_col], ""
            ),
            t[name_col],
        )
        idx = t.schema.get_field_index(name_col)
        t = t.set_column(idx, name_col, marked)
        return t.append_column("marked", hit)

    return ds.map_batches(_mark, batch_format="pyarrow",
                          zero_copy_batch=True)


def link_only_groups(
    ds: ray.data.Dataset,
    cluster_col: str = "cluster_id",
    action_col: str = "action",
    canonical_action: str = "keep",
    link_action: str = "link",
) -> ray.data.Dataset:
    """(cluster_id, n_members, n_links) for duplicate groups whose EVERY
    non-canonical member carries the link action — nothing left to do
    but collapse the group. Combiner partials per batch (one row per
    cluster per batch), one |clusters|-bounded groupby."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        cl = t[cluster_col].to_numpy(zero_copy_only=False)
        act = t[action_col].to_pylist()
        df = pd.DataFrame({
            "cluster_id": cl,
            "m": 1,
            "lk": [1 if a == link_action else 0 for a in act],
            "other": [
                0 if a in (link_action, canonical_action) else 1
                for a in act
            ],
        })
        g = df.groupby("cluster_id", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("cluster_id")
        .aggregate(
            Sum("m", alias_name="n_members"),
            Sum("lk", alias_name="n_links"),
            Sum("other", alias_name="n_other"),
        )
    )

    def _filter(t: pa.Table) -> pa.Table:
        m = t["n_members"].to_numpy()
        lk = t["n_links"].to_numpy()
        other = t["n_other"].to_numpy()
        keep = (m >= 2) & (other == 0) & (lk == m - 1)
        return t.filter(pa.array(keep)).select(
            ["cluster_id", "n_members", "n_links"]
        )

    return agg.map_batches(_filter, batch_format="pyarrow",
                           zero_copy_batch=True)
