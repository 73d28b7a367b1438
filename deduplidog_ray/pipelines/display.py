"""Display-path shortening — the distributed form of the reference's
common-prefix log trimming (G3).

≙ reference ``os.path.commonprefix`` display shortening
(deduplidog/deduplidog.py:301-302, :698-705, :789-796): long paths are
printed minus the prefix every row shares, with ``(basedir)`` standing
in when nothing is left.

Scale shape: the common prefix of N strings equals the common prefix of
just their lexicographic MIN and MAX — so one streaming pass emits a
2-value partial per block (no shuffle, no concatenation), the driver
reduces #blocks tiny rows, and a second vectorized pass slices. At
100 TB that is a full scan + an O(blocks) driver reduce; the prefix is
then applied with Arrow ``utf8_slice_codeunits`` (no Python per row).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def common_prefix_of(
    ds: ray.data.Dataset, cols: list[str] | str
) -> str:
    """Longest prefix shared by every non-null value across ``cols``.

    Jointly over all listed columns — the reference trims the prefix
    shared by BOTH sides of a change pair (deduplidog.py:793)."""
    if isinstance(cols, str):
        cols = [cols]

    def _partial(t: pa.Table) -> pa.Table:
        mns, mxs = [], []
        for c in cols:
            col = pc.drop_null(t[c])
            if len(col):
                mm = pc.min_max(col)
                mns.append(mm["min"].as_py())
                mxs.append(mm["max"].as_py())
        if not mns:  # all-null / empty block contributes nothing
            return pa.table(
                {"mn": pa.array([], pa.string()), "mx": pa.array([], pa.string())}
            )
        return pa.table({"mn": [min(mns)], "mx": [max(mxs)]})

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one tiny row per block
    if not parts:
        return ""
    mn = min(p["mn"] for p in parts)
    mx = max(p["mx"] for p in parts)
    return os.path.commonprefix([mn, mx])


def shorten_paths(
    ds: ray.data.Dataset,
    cols: list[str] | str,
    placeholder: str = "(basedir)",
    snap_to_sep: bool = True,
    suffix: str = "_disp",
) -> tuple[ray.data.Dataset, str]:
    """Add ``<col><suffix>`` display columns with the shared prefix
    stripped; rows stripped to nothing become ``placeholder``.

    ``snap_to_sep`` backs the cut up to the last ``/`` inside the
    prefix so a display value never starts mid-component (the
    reference's raw character cut can — deduplidog.py:705 — which is
    why this is a flag, defaulting to the safer behavior).

    Returns (dataset, stripped_prefix)."""
    if isinstance(cols, str):
        cols = [cols]
    prefix = common_prefix_of(ds, cols)
    if snap_to_sep and prefix and not prefix.endswith("/"):
        cut = prefix.rfind("/")
        prefix = prefix[: cut + 1] if cut >= 0 else ""
    n = len(prefix)

    def _strip(t: pa.Table) -> pa.Table:
        for c in cols:
            short = pc.utf8_slice_codeunits(t[c], n)
            short = pc.if_else(
                pc.equal(short, ""), pa.scalar(placeholder), short
            )
            t = t.append_column(c + suffix, short)
        return t

    return (
        ds.map_batches(_strip, batch_format="pyarrow", zero_copy_batch=True),
        prefix,
    )


def search_media(
    ds: ray.data.Dataset,
    query: str,
    id_col: str = "clip_id",
    text_cols: list[str] | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Case-insensitive substring search over media rows — the query
    side of the reference's ``search_for_media_wizzard``
    (/root/reference/deduplidog/utils.py:105-116: repeatedly ``find
    -iname *query*`` under a directory and preview every hit), closing
    SURVEY's last unmapped notebook helper. The wizard's filename match
    becomes an ``id_col`` match; ``text_cols`` (e.g. the transcript)
    extends it to content the filesystem version never had; the
    "preview" is the returned projection (``columns``; payload bytes
    excluded by default — select them explicitly to fetch media).

    Scale shape: ONE vectorized Arrow ``match_substring`` streaming
    filter per batch — no shuffle, no state, no driver concentration;
    the interactive loop is the caller's (notebook) concern.
    """
    if not query:
        raise ValueError("empty search query")
    hay = [id_col] + list(text_cols or [])

    def _filter(t: pa.Table) -> pa.Table:
        mask = None
        for c in hay:
            m = pc.match_substring(
                pc.fill_null(t[c], ""), query, ignore_case=True
            )
            mask = m if mask is None else pc.or_(mask, m)
        out = t.filter(mask)
        if columns is not None:
            out = out.select(columns)
        return out

    return ds.map_batches(
        _filter, batch_format="pyarrow", zero_copy_batch=True
    )
