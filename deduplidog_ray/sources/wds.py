"""WebDataset-style tar shard I/O for the clips table.

At 100 TB, multimodal training data ships as sharded tars (the
WebDataset convention: one tar per shard, each sample a basename group
of entries — ``<id>.wav`` payload + ``<id>.json`` metadata), because
sequential tar reads are the only access pattern every storage tier
loves. This module is the engine's shard sink/source:

- :func:`write_wds_shards` — hash-partition clips by id into ``shards``
  tars. Each shard's content is DETERMINISTIC: membership is the id
  hash (layout-independent), entries are sorted by id, and tar metadata
  (mtime/uid/gid/mode) is pinned — writing the same table twice yields
  byte-identical shards, so shards dedup/checksum/resume like data.
  A written shard is committed atomically (``.tmp`` + rename), and a
  shard whose file already exists is SKIPPED — a killed job resumes by
  rerunning the same write (the per-partition resume rule of
  SURVEY §4). SCALE SHAPE (r5): payloads reach their shard via a
  map-side hive-partitioned parquet stage (each input batch splits and
  writes its slice per shard; no object-store sort of payload bytes —
  the r4 ``groupby(_part)`` exchange was 8 of the 10 s at sf0.1), then
  one task per shard streams its staged partition into the tar.
- :func:`read_wds_shards` — ``read_binary_files`` over the tars (one
  block per shard, streaming) + a flat untar ``map_batches``; yields
  the clips schema back. Round trip is exact (pytest byte-equality).

≙ reference S1/S2 (folder scans) lifted to the shard convention a
distributed loader actually consumes; the atomic-skip write ≙ the
engine's checkpoint manifest semantics (state/checkpoint.py).
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_EXT = {"pcm_s16le": "wav", "ulaw": "ulaw"}
_META_COLS = ("sr_hz", "dur_ms", "codec", "transcript", "role")


def _shard_name(part: int) -> str:
    return f"shard-{part:06d}.tar"


def write_wds_shards(
    clips: ray.data.Dataset,
    out_dir: str,
    shards: int = 64,
    id_col: str = "clip_id",
) -> pd.DataFrame:
    """Write ``clips`` as ``shards`` WebDataset tars under ``out_dir``;
    returns the manifest (shard, n_clips, n_bytes, sha256, status),
    sorted. Existing shard files are kept (resume semantics) — delete
    the directory for a clean rewrite — but a skipped shard is never
    silently blessed: shard bytes are deterministic, so the expected
    content hash is recomputed and compared against the on-disk file;
    ``status`` reports ``written`` / ``skipped_verified`` /
    ``skipped_mismatch`` (stale, truncated or foreign file found —
    left untouched per the skip contract, but flagged), and ``sha256``
    is always the EXPECTED content hash."""
    from deduplidog_ray.stages.hashing import hash_arrow_u64

    os.makedirs(out_dir, exist_ok=True)

    def _tag(t: pa.Table) -> pa.Table:
        h = hash_arrow_u64(t[id_col], seed=0x3D5)
        return t.append_column(
            "_part", pa.array((h % np.uint64(shards)).astype(np.int64))
        )

    def _write(g: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        part = int(g["_part"].iloc[0])
        path = os.path.join(out_dir, _shard_name(part))
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        # column-wise extraction once per shard — the member loop below
        # touches plain Python/numpy scalars, never a pandas row Series
        # (iterrows() was ~3x the whole shard-build cost)
        cids = g[id_col].to_numpy()
        payloads = g["bytes"].to_numpy()
        codecs = (g["codec"].to_numpy() if "codec" in g.columns
                  else np.array([None] * len(g)))
        meta_arrs = {k: g[k].to_numpy() for k in _META_COLS
                     if k in g.columns}
        # shard bytes are deterministic — build them unconditionally so
        # a resume-skipped shard can be VERIFIED, not trusted
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for i in range(len(cids)):
                cid = cids[i]
                payload = bytes(payloads[i] or b"")
                meta = {
                    k: (None if pd.isna(v) else
                        int(v) if isinstance(v, (np.integer,)) else v)
                    for k, v in ((k2, a[i]) for k2, a in meta_arrs.items())
                }
                for name, data in (
                    (f"{cid}.{_EXT.get(codecs[i], 'bin')}", payload),
                    (f"{cid}.json",
                     json.dumps(meta, sort_keys=True).encode()),
                ):
                    ti = tarfile.TarInfo(name=name)
                    ti.size = len(data)
                    ti.mtime = 0          # pinned: deterministic bytes
                    ti.uid = ti.gid = 0
                    ti.mode = 0o644
                    tar.addfile(ti, io.BytesIO(data))
        expected = buf.getvalue()
        exp_sha = hashlib.sha256(expected).hexdigest()
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(expected)
            os.replace(tmp, path)     # atomic commit; rerun-safe
            status = "written"
        else:
            with open(path, "rb") as f:
                on_disk = hashlib.sha256(f.read()).hexdigest()
            status = (
                "skipped_verified" if on_disk == exp_sha
                else "skipped_mismatch"
            )
        return pd.DataFrame({
            "shard": [_shard_name(part)],
            "n_clips": [len(g)],
            "n_bytes": [os.path.getsize(path)],
            "sha256": [exp_sha],
            "status": [status],
        })

    # map-side exchange: each input batch splits per shard and lands in
    # a hive partition on disk — payload bytes never enter a sort
    # shuffle (the old groupby(_part) exchange dominated the write).
    # One builder task per shard then streams its partition into the
    # tar; determinism is unaffected (the builder re-sorts by id, so
    # staged file order is irrelevant).
    import glob as _glob
    import shutil
    import uuid

    # sweep leftover staging dirs from crashed prior runs (unique names
    # mean a kill mid-write_parquet would otherwise leak a staged copy
    # of the corpus next to the tars forever; writes to one out_dir are
    # single-writer, same contract as the index ingest)
    for leftover in _glob.glob(os.path.join(out_dir, "_stage-*")):
        shutil.rmtree(leftover, ignore_errors=True)

    stage = os.path.join(out_dir, f"_stage-{uuid.uuid4().hex[:8]}")

    @ray.remote
    def _build_shard(part_dir: str) -> pd.DataFrame:
        import pyarrow.parquet as _pq

        files = sorted(_glob.glob(os.path.join(part_dir, "*.parquet")))
        t = pa.concat_tables([_pq.read_table(f) for f in files])
        part = int(os.path.basename(part_dir).split("=")[1])
        g = t.to_pandas()
        g["_part"] = part
        return _write(g)

    try:
        clips.map_batches(
            _tag, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(stage, partition_cols=["_part"])
        part_dirs = sorted(_glob.glob(os.path.join(stage, "_part=*")))
        parts = ray.get([_build_shard.remote(d) for d in part_dirs])
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    manifest = (
        pd.concat(parts, ignore_index=True) if parts
        else pd.DataFrame({"shard": [], "n_clips": [], "n_bytes": [],
                           "sha256": [], "status": []})
    )
    return manifest.sort_values("shard").reset_index(drop=True)


def read_wds_shards(in_dir: str) -> ray.data.Dataset:
    """Read WebDataset tars written by :func:`write_wds_shards` back
    into the clips schema. One input block per shard; untar streams."""

    def _untar(t: pa.Table) -> pa.Table:
        rows: dict[str, dict] = {}
        for blob in t["bytes"].to_pylist():
            with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tar:
                for m in tar.getmembers():
                    base, ext = os.path.splitext(m.name)
                    data = tar.extractfile(m).read()
                    r = rows.setdefault(base, {"clip_id": base})
                    if ext == ".json":
                        r.update(json.loads(data))
                    else:
                        r["bytes"] = data
        out = sorted(rows.values(), key=lambda r: r["clip_id"])
        return pa.table({
            "clip_id": pa.array([r["clip_id"] for r in out],
                                type=pa.string()),
            "bytes": pa.array([r.get("bytes", b"") for r in out],
                              type=pa.binary()),
            "sr_hz": pa.array([r.get("sr_hz") for r in out],
                              type=pa.int32()),
            "dur_ms": pa.array([r.get("dur_ms") for r in out],
                               type=pa.int32()),
            "codec": pa.array([r.get("codec") for r in out],
                              type=pa.string()),
            "transcript": pa.array([r.get("transcript") for r in out],
                                   type=pa.string()),
            "role": pa.array([r.get("role") for r in out],
                             type=pa.string()),
        })

    files = ray.data.read_binary_files(
        in_dir, file_extensions=["tar"]
    )
    return files.map_batches(
        _untar, batch_format="pyarrow", batch_size=1, zero_copy_batch=True
    )
