"""Text-format sources: JSONL (and CSV) ingestion for document tables.

Real corpora arrive as JSONL shards at least as often as Parquet; the
engine's operators are format-agnostic because every pipeline takes a
``ray.data.Dataset``, so format support is purely a source concern.
``read_documents_jsonl`` wraps ``ray.data.read_json`` (newline-delimited
by default) with the column pruning the Parquet reader gets for free —
JSONL has no column projection at the storage layer, so unwanted columns
are dropped in the first ``map_batches`` instead (the row bytes are
still read once; at 100 TB prefer columnar storage, this reader is the
on-ramp).

``jsonl_cache_for`` materializes a deterministic JSONL mirror of a
parquet table under /tmp (sharded, cached by source path + mtime) — the
fixture the driver query uses so the SAME DuckDB oracle verifies the
JSONL path bit-for-bit against the parquet-derived answer.

≙ reference S1/S2 directory scans (deduplidog.py:196-207): the reference
walks file trees of any type; here the analogous breadth is table
formats (Parquet / Lance / JSONL / CSV).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def read_documents_jsonl(path: str, columns: list[str] | None = None
                         ) -> ray.data.Dataset:
    """Newline-delimited JSON shards → Dataset (optionally pruned)."""
    ds = ray.data.read_json(path)
    if columns:
        cols = list(columns)
        ds = ds.map_batches(
            lambda t: t.select(cols),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds


def read_documents_csv(path: str, columns: list[str] | None = None
                       ) -> ray.data.Dataset:
    """CSV shards → Dataset (optionally pruned)."""
    ds = ray.data.read_csv(path)
    if columns:
        cols = list(columns)
        ds = ds.map_batches(
            lambda t: t.select(cols),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds


def jsonl_cache_for(parquet_path: str,
                    cache_root: str = "/tmp/deduplidog_ray_jsonl") -> str:
    """Deterministic JSONL mirror of a parquet table (sharded, cached)."""
    import hashlib

    st = os.stat(parquet_path)
    # process-stable key: builtin hash() is randomized per interpreter
    # (PYTHONHASHSEED), which made every fresh process miss the cache
    # and re-materialize the mirror
    key = hashlib.blake2b(
        f"{os.path.abspath(parquet_path)}:{st.st_mtime_ns}".encode(),
        digest_size=8,
    ).hexdigest()
    out_dir = os.path.join(cache_root, key)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(parquet_path)
    n_shards = max(1, min(16, len(tbl) // 2048))
    per = (len(tbl) + n_shards - 1) // n_shards
    for s in range(n_shards):
        chunk = tbl.slice(s * per, per)
        if len(chunk) == 0:
            continue
        # pandas to_json emits ISO timestamps; keep only JSON-native
        # columns in the mirror (the documents table is all scalars)
        chunk.to_pandas().to_json(
            os.path.join(out_dir, f"part-{s:04d}.jsonl"),
            orient="records", lines=True, force_ascii=False,
        )
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
