"""Candidate-key explosion + hot-key salting — the shuffle-key construction.

≙ the reference's candidate lookup structures, re-expressed as shuffle keys
(SURVEY.md §2.4 J1/J2): instead of a driver-resident
``stem -> set[Path]`` index (deduplidog/deduplidog.py:285-288) or the
O(N·M) ``ignore_name`` scan (:492-504), every clip *emits* its candidate
keys and a ``groupby(band_key)`` shuffle co-locates potential duplicates.

Key types emitted per clip (all mixed with the codec-class hash so
modalities never share a group — ≙ media-type partition F5,
deduplidog.py:27-29, :498-501):

  1. MinHash LSH band keys  (lsh_bands keys)      — Jaccard candidates
  2. SimHash bit-block keys (hamming_k+1 keys)    — pigeonhole Hamming <= k
  3. winnowing fingerprints (~n_shingles/w keys)  — substring/containment
  4. pcm_hash + content_hash (2 keys)             — exact-content candidates
     (covers the ``ignore_name`` pure-content mode without a cross join)

Hot-key skew (north rule): a two-pass scheme. Pass 1 counts keys (partial
aggregation, tiny shuffle of (key, count)); keys with count > hot_band_cap
are broadcast via ``ray.put`` as ``{key: n_salts}``. Pass 2 splits a hot
key's members into ``n_salts`` deterministic subgroups
(``mix64(clip_hash) % n_salts``); each subgroup is verified all-pairs and
elects one representative row for a second, tiny groupby on the original
key that restores cross-subgroup connectivity (stages/verify.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.stages.hashing import combine64, hash_strings_u64, mix64
from deduplidog_ray.stages.signatures import band_hashes, simhash_block_keys

_TAG_BAND = np.uint64(0xB1)
_TAG_BLOCK = np.uint64(0xB2)
_TAG_WINNOW = np.uint64(0xB3)
_TAG_PCM = np.uint64(0xB4)
_TAG_CONTENT = np.uint64(0xB5)

#: payload columns carried through the shuffle (everything verify needs, so
#: no join back to the signature table is required — one shuffle, not two).
#: codec_class and n_bytes are deliberately NOT carried: keys already mix
#: the class hash (a group can never mix modalities) and the kernel never
#: reads n_bytes — every byte here is multiplied by ~26 keys/clip.
PAYLOAD_COLUMNS = [
    "clip_id",
    "dur_ms",
    "created_ms",
    "content_hash",
    "pcm_hash",
    "simhash",
    "fp",
    "n_frames",
    "minhash",
    "n_shingles",
]

#: key-rank layout for first-collision pair dedup (stages/verify.py):
#: a confirmed pair is emitted ONLY from its lowest-rank colliding key,
#: so the same duplicate isn't shipped once per band it collides in.
RANK_BAND0 = 0              # bands occupy ranks [0, lsh_bands)
def rank_block0(cfg):       # blocks follow the bands
    return cfg.signature.lsh_bands
def rank_pcm(cfg):
    from deduplidog_ray.stages.signatures import n_simhash_block_keys

    return cfg.signature.lsh_bands + n_simhash_block_keys(
        cfg.signature.simhash_hamming
    )
def rank_content(cfg):
    return rank_pcm(cfg) + 1
def rank_winnow(cfg):
    return rank_content(cfg) + 1


def _clip_key_matrix(batch: pa.Table, cfg: DedupConfig, with_rank: bool = False):
    """Per-clip candidate keys → (flat_keys uint64, clip_row_idx int64[,
    key_rank uint8]).

    Reads the precomputed ``cand_keys``/``cand_ranks`` columns when present
    (stages/sigstage.py computes them ONCE; both the count pass and the
    explode pass would otherwise redo this work), else computes them.
    """
    n = len(batch)
    if "cand_keys" in batch.column_names:
        kl = batch["cand_keys"]
        if isinstance(kl, pa.ChunkedArray):
            kl = kl.combine_chunks()
        off = kl.offsets.to_numpy().astype(np.int64)
        keys = kl.values.to_numpy(zero_copy_only=False).view(np.uint64)
        idx = np.repeat(np.arange(n, dtype=np.int64), off[1:] - off[:-1])
        if not with_rank:
            return keys, idx
        rl = batch["cand_ranks"]
        if isinstance(rl, pa.ChunkedArray):
            rl = rl.combine_chunks()
        rank = rl.values.to_numpy(zero_copy_only=False).astype(np.uint8)
        return keys, idx, rank
    class_h = hash_strings_u64(batch["codec_class"].to_pylist(), seed=0xC1A5)
    sig = np.frombuffer(
        b"".join(batch["minhash"].to_pylist()), dtype="<u2"
    ).reshape(n, cfg.signature.num_perm)
    simhash = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)

    bands = band_hashes(sig, cfg.signature)                       # (n, b)
    blocks = simhash_block_keys(simhash, cfg.signature.simhash_hamming)

    parts_keys: list[np.ndarray] = []
    parts_idx: list[np.ndarray] = []
    parts_rank: list[np.ndarray] = []

    def _mix_tag(vals: np.ndarray, tag: np.uint64, ch: np.ndarray) -> np.ndarray:
        return combine64(combine64(np.broadcast_to(tag, vals.shape).copy(), ch), vals)

    for mat, tag, rank0 in [(bands, _TAG_BAND, 0),
                            (blocks, _TAG_BLOCK, rank_block0(cfg))]:
        k = mat.shape[1]
        keys = _mix_tag(mat, tag, class_h[:, None])
        parts_keys.append(keys.reshape(-1))
        parts_idx.append(np.repeat(np.arange(n, dtype=np.int64), k))
        parts_rank.append(
            np.tile(np.arange(rank0, rank0 + k, dtype=np.uint8), n)
        )

    # winnowing keys (variable count per clip) — only docs with enough
    # shingles to make containment meaningful
    wlist = batch["winnow"]
    if isinstance(wlist, pa.ChunkedArray):
        wlist = wlist.combine_chunks()
    woff = wlist.offsets.to_numpy().astype(np.int64)
    wvals = wlist.values.to_numpy(zero_copy_only=False).view(np.uint64)
    wdoc = np.repeat(np.arange(n, dtype=np.int64), woff[1:] - woff[:-1])
    if len(wvals):
        parts_keys.append(_mix_tag(wvals, _TAG_WINNOW, class_h[wdoc]))
        parts_idx.append(wdoc)
        parts_rank.append(np.full(len(wvals), rank_winnow(cfg), dtype=np.uint8))

    # exact-content keys
    for col, tag, rank in [("pcm_hash", _TAG_PCM, rank_pcm(cfg)),
                           ("content_hash", _TAG_CONTENT, rank_content(cfg))]:
        vals = batch[col].to_numpy(zero_copy_only=False).view(np.uint64)
        parts_keys.append(_mix_tag(vals, tag, class_h))
        parts_idx.append(np.arange(n, dtype=np.int64))
        parts_rank.append(np.full(n, rank, dtype=np.uint8))

    keys = np.concatenate(parts_keys)
    idx = np.concatenate(parts_idx)
    if with_rank:
        return keys, idx, np.concatenate(parts_rank)
    return keys, idx


def make_key_stage(cfg: DedupConfig):
    """map_batches fn appending the per-clip candidate keys/ranks as list
    columns (computed once per row; the count and explode passes read
    them). Order within each row's list follows the key-rank layout."""

    def _keys(batch: pa.Table) -> pa.Table:
        keys, idx, rank = _clip_key_matrix(batch, cfg, with_rank=True)
        order = np.argsort(idx, kind="stable")
        keys, idx, rank = keys[order], idx[order], rank[order]
        counts = np.bincount(idx, minlength=len(batch)).astype(np.int32)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        key_col = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(keys.view(np.int64))
        )
        rank_col = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(rank, type=pa.uint8()),
        )
        out = batch
        for name, arr in [("cand_keys", key_col), ("cand_ranks", rank_col)]:
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return _keys


def make_explode_stage(
    cfg: DedupConfig, hot_keys_ref=None, active_ref=None, skinny: bool = False
):
    """map_batches fn: signature rows → exploded (band_key, payload) rows.

    ``hot_keys_ref``: optional ``ray.put`` ObjectRef of ``{orig_key: n_salts}``
    (pass 2). When set, hot keys are salted and ``orig_key``/``salted``
    columns record the pre-salt key for the representative round.
    ``active_ref``: optional ``ray.put`` ObjectRef of the sorted int64
    active-key array; rows whose key is not active are not emitted.
    ``skinny``: emit keys-only rows (clip_id, clip_h, band_key, orig_key,
    salted, part) for the two-exchange design (stages/pairgen.py) — the
    verify payload then ships exactly once via the plasma store instead of
    once per band row.
    """

    def _explode(batch: pa.Table) -> pa.Table:
        keys, idx, rank = _clip_key_matrix(batch, cfg, with_rank=True)
        if active_ref is not None:
            active = ray.get(active_ref)          # plasma-local, zero-copy
            k64 = keys.view(np.int64)
            pos = np.searchsorted(active, k64)
            pos = np.minimum(pos, max(0, len(active) - 1))
            is_active = (
                active[pos] == k64 if len(active) else np.zeros(len(k64), bool)
            )
            keys, idx, rank = keys[is_active], idx[is_active], rank[is_active]
        # quarantine poison rows: no candidate keys (≙ skip on decode failure,
        # reference deduplidog.py:447-448)
        if "decode_error" in batch.column_names:
            err = batch["decode_error"].to_numpy(zero_copy_only=False)
            bad = np.array([e is not None for e in err], dtype=bool)
            keep = ~bad[idx]
            keys, idx, rank = keys[keep], idx[keep], rank[keep]

        orig_keys = keys
        salted = np.zeros(len(keys), dtype=bool)
        if hot_keys_ref is not None:
            hot: dict[int, int] = ray.get(hot_keys_ref)
            if hot:
                clip_h = hash_strings_u64(batch["clip_id"].to_pylist(), seed=0x5A17)
                nsalt = np.array(
                    [hot.get(int(k), 0) for k in keys.view(np.int64)], dtype=np.uint64
                )
                is_hot = nsalt > 0
                # HOT WINNOW KEYS ARE DROPPED, not salted: a fingerprint
                # shared by >cap clips is a globally-common n-gram window
                # (boilerplate), worthless as containment evidence — the
                # standard winnowing practice (MOSS ignores ubiquitous
                # fingerprints). Contained clips share ~n_shingles/w
                # fingerprints, so the rare ones still link them. Hot
                # band/block/content keys (genuinely near-identical
                # families) are salted as before.
                drop = is_hot & (rank == rank_winnow(cfg))
                if drop.any():
                    keep_m = ~drop
                    keys, idx, rank = keys[keep_m], idx[keep_m], rank[keep_m]
                    orig_keys = orig_keys[keep_m]
                    nsalt, is_hot = nsalt[keep_m], is_hot[keep_m]
                with np.errstate(divide="ignore", invalid="ignore"):
                    salt = np.where(is_hot, mix64(clip_h[idx]) % np.maximum(nsalt, 1), 0)
                keys = np.where(is_hot, combine64(keys, salt + np.uint64(1)), keys)
                salted = is_hot

        if skinny:
            from deduplidog_ray.stages.pairgen import CLIP_H_SEED

            clip_h_all = hash_strings_u64(
                batch["clip_id"].to_pylist(), seed=CLIP_H_SEED
            )
            out = batch.select(["clip_id"]).take(pa.array(idx))
            out = out.append_column(
                "clip_h", pa.array(clip_h_all[idx].view(np.int64))
            )
        else:
            payload = batch.select(
                [c for c in PAYLOAD_COLUMNS if c in batch.column_names]
            )
            out = payload.take(pa.array(idx))
        out = out.append_column("band_key", pa.array(keys.view(np.int64)))
        out = out.append_column("orig_key", pa.array(orig_keys.view(np.int64)))
        out = out.append_column("salted", pa.array(salted))
        if not skinny:
            out = out.append_column("key_rank", pa.array(rank, type=pa.uint8()))
        # hash partition id — the groupby key (P partitions, NOT one group
        # per band key: see stages/verify.py "EXECUTION SHAPE")
        part = (keys % np.uint64(cfg.execution.verify_partitions)).astype(np.int64)
        out = out.append_column("part", pa.array(part))
        return out

    return _explode


def make_key_count_stage(cfg: DedupConfig):
    """Pass-1 map_batches fn: signature rows → per-batch (band_key, cnt) partials.

    Emits pre-aggregated counts per batch so the pass-1 groupby shuffles
    ~unique-keys-per-batch rows, not every exploded row (partial/combiner
    pattern — "pre-aggregate inside map_batches" per the task sheet).
    """

    def _count(batch: pa.Table) -> pa.Table:
        keys, idx = _clip_key_matrix(batch, cfg)
        if "decode_error" in batch.column_names:
            err = batch["decode_error"].to_numpy(zero_copy_only=False)
            bad = np.array([e is not None for e in err], dtype=bool)
            keys = keys[~bad[idx]]
        uniq, cnt = np.unique(keys, return_counts=True)
        part = (uniq % np.uint64(cfg.execution.verify_partitions)).astype(np.int64)
        return pa.table(
            {"band_key": pa.array(uniq.view(np.int64)),
             "cnt": pa.array(cnt.astype(np.int64)),
             "part": pa.array(part)}
        )

    return _count


def _merge_counts(k: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge (key, partial-count) → (uniq key, total) keeping totals >= 2."""
    try:
        # Rust hash groupby: ~5x the sort-based np.unique on this merge
        # (measured 2.7 s vs 13 s at 8.6M partial rows)
        import polars as pl

        g = (
            pl.DataFrame({"k": k, "c": c})
            .group_by("k")
            .agg(pl.col("c").sum())
            .filter(pl.col("c") >= 2)
        )
        return g["k"].to_numpy(), g["c"].to_numpy()
    except ImportError:  # pragma: no cover
        uniq, inv = np.unique(k, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        mask = tot >= 2
        return uniq[mask], tot[mask]


@ray.remote
def _merge_range_task(
    refs: list, r: int, n_ranges: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge the key range {k : k % n_ranges == r} of every partial-count
    block. Blocks are read zero-copy from plasma (same-node mmap); the
    scan is one vectorized mod+mask per block."""
    ks, cs = [], []
    for t in ray.get(refs):
        if not len(t):
            continue
        t = t.combine_chunks()
        k = t["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
        m = (k % np.uint64(n_ranges)) == np.uint64(r)
        if m.any():
            ks.append(k[m].view(np.int64))
            cs.append(t["cnt"].to_numpy(zero_copy_only=False)[m])
    if not ks:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return _merge_counts(np.concatenate(ks), np.concatenate(cs))


def find_hot_keys(sig_ds, cfg: DedupConfig) -> tuple[dict[int, int], np.ndarray]:
    """Pass 1: returns ({hot key: n_salts}, sorted ACTIVE keys array).

    Active = member count >= 2. A key seen once can never produce a pair,
    so pass 2 skips emitting its row entirely — a semi-join reduction that
    removes the (majority) singleton fraction of the band-row shuffle.
    At 10^12 scale the active set becomes a Bloom filter per executor;
    here it is a sorted int64 array probed with searchsorted.

    Shuffle shape: per-batch partial counts (combiner pattern) land in
    plasma; R range-merge TASKS each scan all partial blocks zero-copy
    and hash-merge their `key % R` slice in parallel — the driver only
    concatenates R pre-merged (small) active slices. No groupby/sort
    barrier (a Ray sort's fixed barrier cost measured ~7 s at 32 CPUs),
    and no driver-serial 14M-row merge (measured ~10 s). Single-node the
    range scan is free (plasma mmap); on a multi-node cluster the partial
    counts would ride the same hive exchange as the band rows so each
    range task reads only its slice. At 10^12 rows the active set
    outgrows one machine and becomes a per-executor Bloom filter — the
    same point at which the ``ray.put`` broadcast must change.
    """
    cap = cfg.execution.hot_band_cap

    counts = sig_ds.map_batches(
        make_key_count_stage(cfg),
        batch_format="pyarrow",
        batch_size=cfg.execution.batch_size,
    )
    # to_arrow_refs: zero-copy plasma refs of all partial blocks
    refs = counts.to_arrow_refs()
    if not refs:
        return {}, np.empty(0, dtype=np.int64)
    avail = int(ray.cluster_resources().get("CPU", 8))
    n_ranges = max(4, min(32, avail))
    outs = ray.get(
        [_merge_range_task.remote(refs, r, n_ranges) for r in range(n_ranges)]
    )
    uniqs = [u for u, _ in outs if len(u)]
    if not uniqs:
        return {}, np.empty(0, dtype=np.int64)
    uniq = np.concatenate(uniqs)
    tot = np.concatenate([t for _, t in outs if len(t)])
    active = np.sort(uniq)
    hot: dict[int, int] = {
        int(key): int(np.ceil(cnt / cap))
        for key, cnt in zip(uniq[tot > cap], tot[tot > cap])
    }
    return hot, active
