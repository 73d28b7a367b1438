"""Vectorized text signatures: shingling, MinHash, SimHash, winnowing.

These generalize the reference's candidate index and perceptual-hash match
to web scale (SURVEY.md §2.8):

- shingle + MinHash + LSH banding ≙ the stem hash index / O(N·M) scan
  (reference deduplidog/deduplidog.py:285-288, :492-504) — candidate
  generation without a cross join.
- SimHash 64-bit, Hamming <= k ≙ ``accepted_img_hash_diff`` 64-bit
  average-hash compare (deduplidog.py:147-148, :758-760).
- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
  algorithm) ≙ the contained/shrunk-copy use case (docs/index.md:20-22,38):
  two texts sharing a >= (w+k-1)-token region are guaranteed to share a
  selected fingerprint.

Everything is batch-vectorized: per-batch work is numpy ``reduceat`` /
``sliding_window_view`` over the *concatenation* of all docs' shingle
arrays with doc-boundary offsets — no per-row Python in the hot path.
The only Python-level loop is over the rare docs shorter than one shingle.
"""

from __future__ import annotations

import numpy as np

from deduplidog_ray.config import SignatureConfig
from deduplidog_ray.stages.hashing import combine64, hash_strings_u64, mix64

_EMPTY_DOC_SENTINEL = 0xE417F  # hashed with the seed → shared shingle for empty docs

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def tokenize_offsets(texts: list[str | None]) -> tuple[list[str], np.ndarray]:
    """Whitespace-tokenize a batch → (flat token list, offsets[D+1])."""
    flat: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for i, t in enumerate(texts):
        if t:
            flat.extend(t.split())
        offsets[i + 1] = len(flat)
    return flat, offsets


def shingle_hashes(
    texts: list[str | None], k: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Token k-gram hashes per doc → (flat uint64 shingles, offsets[D+1]).

    Every doc gets >= 1 shingle: docs with fewer than ``k`` tokens emit one
    combined hash of all their tokens (empty docs a shared sentinel), so the
    downstream ``reduceat`` segments are never empty.
    """
    ndocs = len(texts)
    flat_tokens, tok_off = tokenize_offsets(texts)
    tok_h = (
        hash_strings_u64(flat_tokens, seed=seed)
        if flat_tokens
        else np.empty(0, dtype=np.uint64)
    )
    ntok = tok_off[1:] - tok_off[:-1]                     # tokens per doc

    counts = np.where(ntok >= k, ntok - k + 1, 1).astype(np.int64)
    out_off = np.empty(ndocs + 1, dtype=np.int64)
    out_off[0] = 0
    np.cumsum(counts, out=out_off[1:])
    out = np.empty(out_off[-1], dtype=np.uint64)

    # --- long docs: rolling k-gram combine over the concatenated tokens ---
    long_mask = ntok >= k
    if long_mask.any() and len(tok_h) >= k:
        win = np.lib.stride_tricks.sliding_window_view(tok_h, k)  # (N-k+1, k)
        acc = mix64(win[:, 0], seed=seed)
        for j in range(1, k):
            acc = combine64(acc, win[:, j])
        # valid start positions per long doc: tok_off[d] .. tok_off[d+1]-k
        starts = tok_off[:-1][long_mask]
        c = counts[long_mask]
        total = int(c.sum())
        # vectorized concatenation of aranges
        rep_starts = np.repeat(starts, c)
        base = np.repeat(np.cumsum(np.concatenate([[0], c[:-1]])), c)
        src_idx = rep_starts + (np.arange(total) - base)
        dst_starts = out_off[:-1][long_mask]
        rep_dst = np.repeat(dst_starts, c)
        dst_idx = rep_dst + (np.arange(total) - base)
        out[dst_idx] = acc[src_idx]

    # --- short docs: one combined hash of all tokens (Python loop, rare) ---
    short_idx = np.nonzero(~long_mask)[0]
    if len(short_idx):
        empty_h = mix64(np.array([_EMPTY_DOC_SENTINEL], dtype=np.uint64), seed=seed)[0]
        for d in short_idx:
            s, e = tok_off[d], tok_off[d + 1]
            if s == e:
                out[out_off[d]] = empty_h
            else:
                acc = mix64(tok_h[s : s + 1], seed=seed)
                for j in range(s + 1, e):
                    acc = combine64(acc, tok_h[j : j + 1])
                out[out_off[d]] = acc[0]
    return out, out_off


def char_shingle_hashes(
    texts: list[str | None], k: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Char(byte)-level k-gram rolling hashes → (flat uint64, offsets[D+1]).

    Unlike :func:`shingle_hashes` this works on utf-8 BYTES, so containment
    candidates are alignment-free: a char-level substring always yields the
    byte-level shingle run (utf-8 substrings of char substrings align).
    Docs with fewer than ``k`` bytes emit ZERO shingles — callers must
    handle them out-of-band (broadcast path in containment).

    Vectorized: one concatenated uint8 array, k multiply-add passes for the
    polynomial rolling hash, then a final mix; windows crossing doc
    boundaries are excluded by offset arithmetic.
    """
    ndocs = len(texts)
    bufs = [t.encode("utf-8") if t else b"" for t in texts]
    nbytes = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=ndocs)
    counts = np.maximum(nbytes - k + 1, 0)
    out_off = np.empty(ndocs + 1, dtype=np.int64)
    out_off[0] = 0
    np.cumsum(counts, out=out_off[1:])
    out = np.empty(out_off[-1], dtype=np.uint64)
    if out_off[-1] == 0:
        return out, out_off

    big = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    byte_off = np.empty(ndocs + 1, dtype=np.int64)
    byte_off[0] = 0
    np.cumsum(nbytes, out=byte_off[1:])

    n = len(big)
    p = np.uint64(0x100000001B3)  # FNV-ish odd multiplier; uint64 wraparound
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * p + big[j : j + n - k + 1]
        acc = mix64(acc, seed=seed)

    # gather valid (non-boundary-crossing) windows per doc
    has = counts > 0
    starts = byte_off[:-1][has]
    c = counts[has]
    total = int(c.sum())
    rep_starts = np.repeat(starts, c)
    base = np.repeat(np.cumsum(np.concatenate([[0], c[:-1]])), c)
    src_idx = rep_starts + (np.arange(total) - base)
    dst_starts = out_off[:-1][has]
    dst_idx = np.repeat(dst_starts, c) + (np.arange(total) - base)
    out[dst_idx] = acc[src_idx]
    return out, out_off


def minhash_params(cfg: SignatureConfig) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-shift permutation params."""
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, 1 << 63, size=cfg.num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, cfg: SignatureConfig
) -> np.ndarray:
    """(D, num_perm) uint16 MinHash signatures via multiply-shift + reduceat.

    16-bit min values: the Jaccard estimator only tests per-perm equality;
    truncation adds a uniform 2^-16 collision probability (bias ~1.5e-5,
    far below the estimator's 1/sqrt(P) noise) and HALVES every signature
    byte downstream — the band-row shuffle is the pipeline's widest
    exchange. Identical in oracle and pipeline, so no predicate drift.
    """
    a, b = minhash_params(cfg)
    ndocs = len(offsets) - 1
    sig = np.empty((ndocs, cfg.num_perm), dtype=np.uint16)
    if ndocs == 0:
        return sig
    starts = offsets[:-1]
    # One 1-D contiguous pass per permutation: ufunc.reduceat along axis 0 of
    # a 2-D array walks a strided column per segment (~45x slower than the
    # contiguous 1-D form measured at 660k shingles); in-place multiply/add/
    # shift reuse one N-word temp so the loop stays allocation-free.
    y = np.empty(len(flat), dtype=np.uint64)
    shift = np.uint64(48)
    with np.errstate(over="ignore"):
        for p in range(cfg.num_perm):
            np.multiply(flat, a[p], out=y)
            np.add(y, b[p], out=y)
            np.right_shift(y, shift, out=y)
            sig[:, p] = np.minimum.reduceat(y, starts)
    return sig


def simhash_signatures(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(D,) uint64 SimHash over the shingle features (majority bit vote)."""
    ndocs = len(offsets) - 1
    if ndocs == 0:
        return np.empty(0, dtype=np.uint64)
    starts = offsets[:-1]
    n = offsets[1:] - offsets[:-1]
    # Per-bit extraction straight from the uint64 words (64 contiguous 1-D
    # reduceat passes) instead of unpackbits + a 2-D axis-0 reduceat — the
    # strided 2-D reduceat was ~75x slower at 660k shingles. Bit j of the
    # output is the majority of bit j across the doc's shingles; bitwise
    # identical to the unpackbits formulation.
    out = np.zeros(ndocs, dtype=np.uint64)
    one = np.uint64(1)
    two = np.uint64(2)
    bit = np.empty(len(flat), dtype=np.uint64)
    for j in range(64):
        sj = np.uint64(j)
        np.right_shift(flat, sj, out=bit)
        np.bitwise_and(bit, one, out=bit)
        counts = np.add.reduceat(bit, starts)
        out |= (counts * two > n).astype(np.uint64) << sj
    return out


def winnow_keys(
    flat: np.ndarray, offsets: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winnowing: per-doc window minima of the shingle-hash sequence.

    Returns (doc_index, selected_hash, n_selected_per_doc) with per-doc
    duplicates removed. Guarantee: any shared shingle run of length >= w
    yields a shared selected hash in both docs.
    """
    ndocs = len(offsets) - 1
    nsh = offsets[1:] - offsets[:-1]
    doc_ids_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []

    long_mask = nsh >= w
    if long_mask.any() and len(flat) >= w:
        win_min = np.lib.stride_tricks.sliding_window_view(flat, w).min(axis=1)
        starts = offsets[:-1][long_mask]
        c = (nsh - w + 1)[long_mask]
        total = int(c.sum())
        rep_starts = np.repeat(starts, c)
        base = np.repeat(np.cumsum(np.concatenate([[0], c[:-1]])), c)
        idx = rep_starts + (np.arange(total) - base)
        doc_ids_parts.append(np.repeat(np.nonzero(long_mask)[0], c))
        val_parts.append(win_min[idx])

    short = np.nonzero(~long_mask)[0]
    if len(short):
        c = nsh[short]
        doc_ids_parts.append(np.repeat(short, c))
        idx = np.concatenate(
            [np.arange(offsets[d], offsets[d + 1]) for d in short]
        ) if len(short) else np.empty(0, dtype=np.int64)
        val_parts.append(flat[idx])

    if not doc_ids_parts:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
            np.zeros(ndocs, dtype=np.int64),
        )
    doc_ids = np.concatenate(doc_ids_parts)
    vals = np.concatenate(val_parts)
    # dedupe (doc, val) pairs — sort by (doc, val), keep firsts
    order = np.lexsort((vals, doc_ids))
    doc_ids, vals = doc_ids[order], vals[order]
    keep = np.ones(len(vals), dtype=bool)
    keep[1:] = (doc_ids[1:] != doc_ids[:-1]) | (vals[1:] != vals[:-1])
    doc_ids, vals = doc_ids[keep], vals[keep]
    per_doc = np.bincount(doc_ids, minlength=ndocs).astype(np.int64)
    return doc_ids, vals, per_doc


def band_hashes(sig: np.ndarray, cfg: SignatureConfig) -> np.ndarray:
    """(D, bands) uint64 LSH band hashes from (D, num_perm) uint32 signatures."""
    d = sig.shape[0]
    if d == 0:
        return np.empty((0, cfg.lsh_bands), dtype=np.uint64)
    grouped = sig.reshape(d, cfg.lsh_bands, cfg.lsh_rows).astype(np.uint64)
    acc = mix64(grouped[:, :, 0], seed=cfg.seed ^ 0xBA9D)
    for j in range(1, cfg.lsh_rows):
        acc = combine64(acc, grouped[:, :, j])
    return acc


def n_simhash_block_keys(hamming_k: int) -> int:
    """Number of combination block keys emitted per row for Hamming <= k."""
    from math import comb

    return comb(hamming_k + 3, 3)


def simhash_block_keys(simhash: np.ndarray, hamming_k: int) -> np.ndarray:
    """(D, C(k+3, 3)) uint64 combination-block keys for Hamming <= k search.

    Pigeonhole over COMBINATIONS (Manku-Jain-Sarma, WWW'07 §3 — public
    technique): split 64 bits into k+3 blocks; k flipped bits damage at
    most k blocks, so at least 3 blocks stay clean and the combination
    made of 3 clean blocks matches exactly. Keying every 3-block
    combination gives a ~2^32 keyspace per table instead of the naive
    (k+1)-block scheme's 2^16 — whose RANDOM collisions grow as
    n^2/2^16 segment pairs (measured ~4M false candidate pairs at 416k
    clips; at 10^12 rows the naive scheme is catastrophically quadratic,
    this one is not). Key = mix(combo_id, concat(block values)).
    """
    nblocks = hamming_k + 3
    d = len(simhash)
    edges = np.linspace(0, 64, nblocks + 1).astype(int)
    blocks = np.empty((d, nblocks), dtype=np.uint64)
    widths = []
    for i in range(nblocks):
        lo, hi = int(edges[i]), int(edges[i + 1])
        w = hi - lo
        widths.append(w)
        blocks[:, i] = (simhash >> np.uint64(lo)) & (
            (np.uint64(1) << np.uint64(w)) - np.uint64(1)
        )
    from itertools import combinations

    combos = list(combinations(range(nblocks), 3))
    out = np.empty((d, len(combos)), dtype=np.uint64)
    for ci, combo in enumerate(combos):
        v = np.zeros(d, dtype=np.uint64)
        for b in combo:
            v = (v << np.uint64(widths[b])) | blocks[:, b]
        out[:, ci] = mix64(v, seed=0xB10C + ci)
    return out


def jaccard_matrix_u32(sigs: np.ndarray) -> np.ndarray:
    """(n, n) estimated Jaccard from (n, P) uint32 MinHash signatures."""
    eq = sigs[:, None, :] == sigs[None, :, :]
    return eq.mean(axis=2)


def simhash_hamming_matrix(sh: np.ndarray) -> np.ndarray:
    """(n, n) Hamming distance matrix for uint64 SimHash values."""
    x = sh[:, None] ^ sh[None, :]
    bits = np.unpackbits(
        x.view(np.uint8).reshape(len(sh), len(sh), 8), axis=2
    )
    return bits.sum(axis=2).astype(np.int32)
