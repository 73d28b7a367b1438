"""Clip-table I/O: Lance when available, Parquet otherwise.

≙ reference sources S1/S2 (recursive directory scans,
deduplidog/deduplidog.py:769-775, :282-283) — here the "directory" is a
Lance/Parquet table and the suffix whitelist becomes a codec filter pushed
to the read.

The north rule names Lance as the table format; the ``lance`` /
``pylance`` package is not installed in this container, so the reader is
gated behind an import-try with a Parquet directory fallback that has the
identical column/fragment semantics for our purposes (column pruning +
fragment-level partitioning for checkpointed resume).
"""

from __future__ import annotations

import glob
import os

import ray.data

try:  # pragma: no cover - lance not present in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_clips(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a clips table (Lance dataset dir or Parquet file/dir)."""
    if HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def list_fragments(path: str) -> list[str]:
    """Input fragments for partition-level checkpointing.

    Lance: dataset fragments; Parquet: individual part files.
    """
    if HAVE_LANCE and path.endswith(".lance"):
        ds = lance.dataset(path)
        return [f"{path}#fragment-{f.fragment_id}" for f in ds.get_fragments()]
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def read_fragments(
    fragments: list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    if HAVE_LANCE and fragments and "#fragment-" in fragments[0]:  # pragma: no cover
        base = fragments[0].split("#")[0]
        ids = [int(f.split("fragment-")[1]) for f in fragments]
        ds = lance.dataset(base)
        frags = [f for f in ds.get_fragments() if f.fragment_id in ids]
        return ray.data.read_lance(base, columns=columns, fragments=frags)
    return ray.data.read_parquet(
        fragments, columns=columns, override_num_blocks=override_num_blocks
    )


def write_clips(ds: ray.data.Dataset, path: str) -> None:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
