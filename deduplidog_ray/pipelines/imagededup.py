"""Image near-duplicate detection: REAL average-hash + Hamming-ball LSH.

The reference's image path made real in this container: decode pixels
(pure-numpy NETPBM; PIL path for compressed formats when present),
64-bit average hash (``images/codecs.py:average_hash_u64`` ≙
``imagehash.average_hash``, reference helpers.py:43-53), then pairs at
Hamming distance ≤ k (≙ ``accepted_img_hash_diff``,
deduplidog.py:147-148, :758-760).

Execution shape — identical to the transcript SimHash axis:

- **hash stage**: actor-pool ``map_batches`` (ImageHashStage), decode +
  hash per row, quarantine on decode errors;
- **candidates**: Manku combination-block keys over the 64-bit hash
  (``stages/signatures.py:simhash_block_keys``) — every pair within
  Hamming ≤ k shares ≥ 1 block key by pigeonhole, and the C(k+3,3)
  table keyspace avoids the naive 2^16-bucket quadratic;
- **verify**: groupby(hash partition) → popcount-table Hamming over
  in-group pairs; emitted pairs carry the true distance.

Rows-only for the driver (SQL cannot decode pixels); pytest plants
noisy / brightness-shifted copies and gates exact pair parity vs a
brute-force Hamming scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.multimodal import ImageHashStage
from deduplidog_ray.stages.signatures import simhash_block_keys

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def image_hashes(
    ds: ray.data.Dataset, concurrency: int = 8, batch_size: int = 256
) -> ray.data.Dataset:
    """images (id, bytes) → + (img_hash:int64, img_error) columns."""
    return ds.map_batches(
        ImageHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )


def image_near_dup_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 6,
    id_col: str = "image_id",
    partitions: int = 64,
    concurrency: int = 8,
) -> pd.DataFrame:
    """(a, b, hamming) for every image pair at average-hash Hamming ≤ k.

    Keys-only exchange: after the hash stage only (id, block_key, hash)
    rows shuffle — never pixels. The block-key table guarantees recall 1
    at ≤ ``max_hamming`` (pigeonhole over 4 blocks with C(k+3,3) keys);
    precision is exact (true popcount decides).
    """
    hashed = image_hashes(ds, concurrency=concurrency)

    def _keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_null(t["img_error"]))
        h = t["img_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        blocks = simhash_block_keys(h, max_hamming)
        n, bpr = blocks.shape
        idx = np.repeat(np.arange(n, dtype=np.int64), bpr)
        keys = blocks.reshape(-1)
        out = pa.table(
            {
                id_col: t[id_col].take(pa.array(idx)),
                "img_hash": t["img_hash"].take(pa.array(idx)),
                "band_key": pa.array(keys.view(np.int64)),
            }
        )
        part = (keys % np.uint64(partitions)).astype(np.int64)
        return out.append_column("part", pa.array(part))

    def _verify(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], type=pa.large_string()),
             "b": pa.array([], type=pa.large_string()),
             "hamming": pa.array([], type=pa.int32())}
        )
        n = len(g)
        if n < 2:
            return empty
        keys = g["band_key"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g[id_col].to_pylist(), dtype=object)
        h = g["img_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, keys))
        keys, ids, h = keys[order], ids[order], h[order]
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (keys[1:] == keys[:-1]) & (ids[1:] == ids[:-1])
        keys, ids, h = keys[~dup], ids[~dup], h[~dup]
        n = len(keys)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        out_a, out_b, out_d = [], [], []
        for st, sz in zip(starts.tolist(), sizes.tolist()):
            if sz < 2:
                continue
            ii, jj = np.triu_indices(sz, k=1)
            ii += st
            jj += st
            x = h[ii] ^ h[jj]
            ham = _POP[x.view(np.uint8).reshape(len(ii), 8)].sum(axis=1)
            ok = ham <= max_hamming
            if ok.any():
                a, b = ids[ii[ok]], ids[jj[ok]]
                swap = a > b
                out_a.append(np.where(swap, b, a))
                out_b.append(np.where(swap, a, b))
                out_d.append(ham[ok].astype(np.int32))
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.large_string()),
                "b": pa.array(np.concatenate(out_b), type=pa.large_string()),
                "hamming": pa.array(np.concatenate(out_d)),
            }
        )

    pairs = (
        hashed.map_batches(_keys, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("part")
        .map_groups(_verify, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(pairs):
        return pd.DataFrame(columns=["a", "b", "hamming"])
    # the same pair can surface under several block keys → keep first
    pairs = pairs.drop_duplicates(["a", "b"]).reset_index(drop=True)
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def video_near_dup_pairs(
    ds: ray.data.Dataset,
    sample_every_n: int = 8,
    min_overlap: float = 0.5,
    id_col: str = "video_id",
    partitions: int = 64,
    concurrency: int = 8,
    max_hash_df: int = 256,
) -> pd.DataFrame:
    """Video near-dup: (a, b, shared, overlap) for video pairs whose
    sampled-frame average-hash SETS overlap ≥ ``min_overlap`` of the
    smaller video — catches noisy re-encodes AND trimmed/prefix copies
    (containment semantics, the video analog of the flagship's
    shrunk-copy axis).

    Shape: the frame stage emits per-video DISTINCT frame hashes; only
    (frame_hash, video_id) key rows shuffle (never pixels). Pairs sharing
    ≥1 hash meet inside a hash partition; per-pair shared counts come
    from one small groupby over the pair stream; per-video set sizes are
    a tiny side table. At 10^12 scale a frame hash shared by H videos
    emits C(H,2) pairs — boilerplate frames (intros, slates) are the hot
    keys; hashes shared by more than ``max_hash_df`` videos are dropped
    in the pair kernel (every occurrence of a hash lands in one
    partition, so the in-group size IS the document frequency), the same
    hot-key rule as the flagship's winnow drop.
    """
    from deduplidog_ray.stages.multimodal import VideoFrameSampleStage

    hashed = ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"sample_every_n": sample_every_n},
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )

    def _explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_null(t["video_error"]))
        ids = t[id_col].to_pylist()
        out_id, out_h = [], []
        col = t["frame_hashes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for i in range(len(t)):
            hs = np.unique(np.asarray(col[i].as_py(), dtype=np.int64))
            out_id.extend([ids[i]] * len(hs))
            out_h.append(hs)
        flat = (np.concatenate(out_h) if out_h
                else np.empty(0, dtype=np.int64))
        part = (flat.view(np.uint64) % np.uint64(partitions)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.large_string()),
                "fh": pa.array(flat),
                "part": pa.array(part),
            }
        )

    exploded = hashed.map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # per-video distinct-hash counts: tiny (one row per video)
    sizes = (
        exploded.groupby(id_col).count().to_pandas()
        .set_index(id_col)["count()"]
    )

    def _pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], type=pa.large_string()),
             "b": pa.array([], type=pa.large_string())}
        )
        n = len(g)
        if n < 2:
            return empty
        fh = g["fh"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g[id_col].to_pylist(), dtype=object)
        order = np.lexsort((ids, fh))
        fh, ids = fh[order], ids[order]
        starts = np.flatnonzero(np.r_[True, fh[1:] != fh[:-1]])
        sizes_ = np.diff(np.r_[starts, n])
        out_a, out_b = [], []
        for st, sz in zip(starts.tolist(), sizes_.tolist()):
            if sz < 2 or sz > max_hash_df:   # hot boilerplate frame → drop
                continue
            ii, jj = np.triu_indices(sz, k=1)
            a, b = ids[st + ii], ids[st + jj]
            swap = a > b
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
        if not out_a:
            return empty
        return pa.table(
            {"a": pa.array(np.concatenate(out_a), type=pa.large_string()),
             "b": pa.array(np.concatenate(out_b), type=pa.large_string())}
        )

    pair_rows = (
        exploded.groupby("part")
        .map_groups(_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(pair_rows):
        return pd.DataFrame(columns=["a", "b", "shared", "overlap"])
    counts = pair_rows.groupby(["a", "b"]).size().reset_index(name="shared")
    m = np.minimum(
        sizes.loc[counts["a"]].to_numpy(), sizes.loc[counts["b"]].to_numpy()
    )
    counts["overlap"] = counts["shared"] / np.maximum(m, 1)
    out = counts[counts["overlap"] >= min_overlap]
    return out.sort_values(["a", "b"]).reset_index(drop=True)
