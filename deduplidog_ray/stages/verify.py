"""Pair verification — the vectorized "compare kernel".

≙ the reference match predicates P1-P5 (SURVEY.md §2.5):
  - content_hash equality       ≙ CRC equality (deduplidog/deduplidog.py:714)
  - pcm_hash equality           ≙ same content, different container
  - MinHash-Jaccard >= t        ≙ the stem-equality candidate confirm, fuzzy
  - SimHash Hamming <= k        ≙ ``accepted_img_hash_diff`` (:758-760)
  - fingerprint Hamming <= f    ≙ image-hash similarity gate (helpers.py:43-53)
  - |dur_a - dur_b| <= d        ≙ ``accepted_frame_delta`` (:728-729)
  - containment estimate >= c   ≙ shrunk/partial-copy case (docs/index.md:20-22)

A pair is confirmed iff (same codec class) and any of:
  exact:   content_hash equal
  pcm:     pcm_hash equal                        and dur gate
  near:    transcript axis (J >= t or Hamming <= k) and
           audio axis (fp Hamming <= frac)       and dur gate
  contain: containment >= c (transcript axis only; dur gate waived — the
           contained clip is by definition shorter)

mirroring the reference's "name axis AND content axis" conjunction
(_process_file → _find_similar(_media), deduplidog.py:462-519, :707-735).

EXECUTION SHAPE (the scale-critical part): verification runs per HASH
PARTITION, not per band group. ``groupby(band_key).map_groups`` costs one
Python dispatch per distinct key — at web scale that is one call per
~unique shingle band (millions). Instead the pipeline adds
``part = band_key % P`` and groups by ``part`` (P ≈ 2-4× cluster cores):
each partition receives ALL its band groups in one table and this module
verifies every group in a handful of numpy passes — segment the sorted
partition, build in-group pair indices arithmetically, then evaluate ONE
1-D pairwise kernel over all candidate pairs at once.

The same 1-D kernel (``confirm_pairs_1d``) backs the exhaustive oracle's
block compare (``confirm_block`` builds the cross-product indices), so the
pipeline and the oracle share one predicate implementation — recall
measured against the oracle is pure candidate-generation loss.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplidog_ray.audio.fingerprint import BITS_PER_FRAME, FP_BYTES
from deduplidog_ray.config import DedupConfig

REASONS = ["exact", "pcm", "jaccard", "simhash", "contain"]
_R_EXACT, _R_PCM, _R_JACCARD, _R_SIMHASH, _R_CONTAIN = range(5)

#: byte-popcount lookup table (vectorized Hamming over packed bytes)
_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

PAIRS_EMPTY = pa.table(
    {
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string()),
        "reason": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float32()),
    }
)


def payload_from_table(t: pa.Table, num_perm: int) -> dict[str, np.ndarray]:
    """Columnar payload → dict of numpy arrays for the pair kernels.

    ``minhash`` stays (n, P) uint16; ``fp`` stays PACKED (n, FP_BYTES)
    uint8 — Hamming runs on packed bytes via the popcount table.
    """
    n = len(t)
    mh = t["minhash"].to_pylist()
    fp = t["fp"].to_pylist()
    names = t.column_names
    return {
        "clip_id": np.asarray(t["clip_id"].to_pylist(), dtype=object),
        # band rows don't carry codec_class (keys mix the class hash, so a
        # group can never mix modalities); the oracle path does carry it
        "codec_class": (
            np.asarray(t["codec_class"].to_pylist(), dtype=object)
            if "codec_class" in names
            else np.zeros(n, dtype=np.int8)
        ),
        "dur_ms": t["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64),
        # optional creation timestamp (≙ mtime/EXIF): zeros when the input
        # has no ``created_ms`` column — the time gate then passes trivially
        "created_ms": (
            t["created_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
            if "created_ms" in names
            else np.zeros(n, dtype=np.int64)
        ),
        "content_hash": t["content_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
        "pcm_hash": t["pcm_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
        "simhash": t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64),
        "n_shingles": t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64),
        "n_frames": t["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64),
        "minhash": np.frombuffer(b"".join(mh), dtype="<u2").reshape(n, num_perm),
        "fp_packed": np.frombuffer(b"".join(fp), dtype=np.uint8).reshape(n, FP_BYTES),
    }


#: pairs per kernel chunk: the (chunk, 128) signature temporaries stay ~2 MB
#: each so a worker's retained heap recycles them after the first chunk —
#: an unchunked 100k-pair call allocates >100 MB of fresh pages, and on
#: virtualized hosts with slow fault servicing that first touch dominated
#: the verify phase (measured: 5 s median first task vs 0.12 s warm).
_CONFIRM_CHUNK = 16384


def confirm_pairs_1d(
    P: dict[str, np.ndarray], ii: np.ndarray, jj: np.ndarray, cfg: DedupConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Evaluate the duplicate predicate for the pair list (ii, jj).

    Returns (dup bool (M,), reason int8 (M,), score float32 (M,)).
    Vectorized in bounded chunks — no per-pair or per-group Python.
    """
    M = len(ii)
    if M <= _CONFIRM_CHUNK:
        return _confirm_chunk_1d(P, ii, jj, cfg)
    dup = np.empty(M, dtype=bool)
    reason = np.empty(M, dtype=np.int8)
    score = np.empty(M, dtype=np.float32)
    for c0 in range(0, M, _CONFIRM_CHUNK):
        c1 = min(M, c0 + _CONFIRM_CHUNK)
        d, r, sc = _confirm_chunk_1d(P, ii[c0:c1], jj[c0:c1], cfg)
        dup[c0:c1], reason[c0:c1], score[c0:c1] = d, r, sc
    return dup, reason, score


def _confirm_chunk_1d(
    P: dict[str, np.ndarray], ii: np.ndarray, jj: np.ndarray, cfg: DedupConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    m, s = cfg.match, cfg.signature
    M = len(ii)
    if M == 0:
        z = np.zeros(0)
        return z.astype(bool), z.astype(np.int8), z.astype(np.float32)

    same_class = P["codec_class"][ii] == P["codec_class"][jj]
    dur_ok = (
        np.ones(M, dtype=bool)
        if m.ignore_duration
        else np.abs(P["dur_ms"][ii] - P["dur_ms"][jj]) <= m.dur_delta_ms
    )
    exact = P["content_hash"][ii] == P["content_hash"][jj]
    pcm = P["pcm_hash"][ii] == P["pcm_hash"][jj]

    jac = (P["minhash"][ii] == P["minhash"][jj]).mean(axis=1)

    x = P["simhash"][ii] ^ P["simhash"][jj]
    sh_ham = _POP[x.view(np.uint8).reshape(M, 8)].sum(axis=1).astype(np.int32)

    fp_ham = _POP[P["fp_packed"][ii] ^ P["fp_packed"][jj]].sum(axis=1).astype(np.int32)
    common_bits = BITS_PER_FRAME * np.minimum(P["n_frames"][ii], P["n_frames"][jj])
    audio_ok = fp_ham <= m.fp_hamming_frac * np.maximum(common_bits, 1)

    transcript_ok = (
        np.ones(M, dtype=bool)
        if m.ignore_transcript
        else (jac >= s.jaccard_threshold) | (sh_ham <= s.simhash_hamming)
    )

    na = P["n_shingles"][ii].astype(np.float64)
    nb = P["n_shingles"][jj].astype(np.float64)
    mn = np.minimum(na, nb)
    with np.errstate(divide="ignore", invalid="ignore"):
        containment = np.where(mn > 0, jac * (na + nb) / ((1.0 + jac) * mn), 0.0)
    contain_ok = (
        (containment >= s.containment_threshold)
        & (mn >= s.winnow_window)
        & (jac < s.jaccard_threshold)
    )

    # ≙ the reference's date gate on the perceptual compare
    # (deduplidog.py:744-756): fuzzy matches additionally require the
    # clips' creation timestamps within the window; exact/pcm paths are
    # ungated (the reference's exact path has its own date logic — here
    # the dur window). A missing created_ms column is all-zeros → no gate.
    if m.time_window_ms is not None:
        time_ok = (
            np.abs(P["created_ms"][ii] - P["created_ms"][jj])
            <= m.time_window_ms
        )
        near_gate = time_ok
    else:
        near_gate = True

    near = transcript_ok & audio_ok & dur_ok & near_gate
    dup = same_class & (exact | (pcm & dur_ok) | near | contain_ok)

    reason = np.full(M, -1, dtype=np.int8)
    score = np.zeros(M, dtype=np.float32)
    for mask, code, sc in [
        (same_class & contain_ok, _R_CONTAIN, containment),
        (same_class & near & (sh_ham <= s.simhash_hamming), _R_SIMHASH,
         (64 - sh_ham) / 64.0),
        (same_class & near & (jac >= s.jaccard_threshold), _R_JACCARD, jac),
        (same_class & pcm & dur_ok, _R_PCM, None),
        (same_class & exact, _R_EXACT, None),
    ]:
        reason[mask] = code
        score[mask] = 1.0 if sc is None else sc[mask].astype(np.float32)
    return dup, reason, score


def confirm_block(
    A: dict[str, np.ndarray], B: dict[str, np.ndarray], cfg: DedupConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cross-verify all pairs of two payload blocks (oracle path).

    Thin wrapper over ``confirm_pairs_1d`` on the cross-product index —
    a single predicate implementation for pipeline and oracle.
    """
    nA, nB = len(A["dur_ms"]), len(B["dur_ms"])
    if nA == 0 or nB == 0:
        z = np.zeros((nA, nB))
        return z.astype(bool), z.astype(np.int8), z.astype(np.float32)
    P: dict[str, np.ndarray] = {
        k: np.concatenate([A[k], B[k]]) for k in A
    }
    ii = np.repeat(np.arange(nA), nB)
    jj = nA + np.tile(np.arange(nB), nA)
    dup, reason, score = confirm_pairs_1d(P, ii, jj, cfg)
    return dup.reshape(nA, nB), reason.reshape(nA, nB), score.reshape(nA, nB)


# --------------------------------------------------------------------------
# partitioned multi-group verification (the pipeline hot path)
# --------------------------------------------------------------------------

def _segment_pair_indices(
    seg_starts: np.ndarray, seg_sizes: np.ndarray, star_over: int
) -> tuple[np.ndarray, np.ndarray]:
    """In-group (i, j) global row indices for every segment.

    Segments up to ``star_over`` rows get all C(n,2) pairs; larger ones get
    star pairs to their first 3 members (union-find only needs
    connectivity; oversized groups are near-identical by construction —
    see stages/candidates.py salting).
    """
    ii_parts: list[np.ndarray] = []
    jj_parts: list[np.ndarray] = []
    tri_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for start, size in zip(seg_starts.tolist(), seg_sizes.tolist()):
        if size < 2:
            continue
        if size <= star_over:
            tri = tri_cache.get(size)
            if tri is None:
                tri = np.triu_indices(size, k=1)
                tri_cache[size] = tri
            ii_parts.append(start + tri[0])
            jj_parts.append(start + tri[1])
        else:
            nrep = 3
            reps = np.arange(nrep)
            rest = np.arange(size)
            ii = start + np.repeat(reps, size)
            jj = start + np.tile(rest, nrep)
            keep = ii != jj
            ii_parts.append(ii[keep])
            jj_parts.append(jj[keep])
    if not ii_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(ii_parts), np.concatenate(jj_parts)


def _no_earlier_collision(
    P: dict[str, np.ndarray],
    ii: np.ndarray,
    jj: np.ndarray,
    seg_rank: np.ndarray,
    cfg: DedupConfig,
) -> np.ndarray:
    """True for pairs with NO key collision at any rank below their
    segment's rank — i.e. this segment is the pair's first-collision home
    and must evaluate+emit it.

    A pair in a rank-r segment by definition collides at r, so only ranks
    < r need checking: rank-0 (first band) segments cost NOTHING, rank-1
    costs one uint64 compare per pair, etc. Work is proportional to how
    *redundant* a candidate is — exactly the thing being eliminated.
    Memory: processed per distinct rank, temporaries stay O(M_r).
    """
    s = cfg.signature
    b = s.lsh_bands
    from deduplidog_ray.stages.signatures import band_hashes, simhash_block_keys

    if "_band_hashes" not in P:
        P["_band_hashes"] = band_hashes(P["minhash"], s)       # (n, b) u64
    if "_block_keys" not in P:
        P["_block_keys"] = simhash_block_keys(P["simhash"], s.simhash_hamming)
    bh = P["_band_hashes"]
    blk = P["_block_keys"]
    from deduplidog_ray.stages.signatures import n_simhash_block_keys

    nblocks = n_simhash_block_keys(s.simhash_hamming)
    rank_pcm = b + nblocks
    rank_content = rank_pcm + 1

    keep = np.ones(len(ii), dtype=bool)
    for r in np.unique(seg_rank):
        if r == 0:
            continue                        # first band: nothing earlier
        m = seg_rank == r
        im, jm = ii[m], jj[m]
        coll = np.zeros(len(im), dtype=bool)
        for rp in range(min(int(r), b)):                       # earlier bands
            coll |= bh[im, rp] == bh[jm, rp]
        for t in range(max(0, min(int(r) - b, nblocks))):      # earlier blocks
            coll |= blk[im, t] == blk[jm, t]
        if r > rank_pcm:
            coll |= P["pcm_hash"][im] == P["pcm_hash"][jm]
        if r > rank_content:
            coll |= P["content_hash"][im] == P["content_hash"][jm]
        keep[m] = ~coll
    return keep


def _pairs_table(
    ids: np.ndarray, ii: np.ndarray, jj: np.ndarray,
    reason: np.ndarray, score: np.ndarray,
) -> pa.Table:
    a = ids[ii]
    b = ids[jj]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table(
        {
            "a": pa.array(a2.tolist(), type=pa.string()),
            "b": pa.array(b2.tolist(), type=pa.string()),
            "reason": pa.array([REASONS[r] for r in reason], type=pa.string()),
            "score": pa.array(score, type=pa.float32()),
        }
    )


def verify_partition_table(
    part: pa.Table, cfg: DedupConfig, key_col: str = "band_key",
    rank_filter: bool = True,
) -> tuple[pa.Table, np.ndarray, pa.Table]:
    """Verify ALL band groups inside one hash partition.

    Returns (pairs table, rep row indices, the sorted/deduped partition) —
    rep rows (one per salted subgroup) feed the second-round groupby.
    """
    n = len(part)
    empty_idx = np.empty(0, dtype=np.int64)
    if n == 0:
        return PAIRS_EMPTY, empty_idx, part
    # one contiguous copy up front: sort-reduce outputs arrive as
    # many-chunk tables and every per-chunk access (take/to_pylist/
    # to_numpy) pays per-chunk overhead otherwise
    part = part.combine_chunks()
    keys = part[key_col].to_numpy(zero_copy_only=False)
    ids = np.asarray(part["clip_id"].to_pylist(), dtype=object)
    order = np.lexsort((ids, keys))
    part = part.take(pa.array(order))
    keys = keys[order]
    ids = ids[order]

    # drop duplicate (key, clip) rows (a clip reaching one group twice)
    dup_row = np.zeros(n, dtype=bool)
    dup_row[1:] = (keys[1:] == keys[:-1]) & (ids[1:] == ids[:-1])
    if dup_row.any():
        keep = np.nonzero(~dup_row)[0]
        part = part.take(pa.array(keep))
        keys = keys[keep]
        ids = ids[keep]
        n = len(keys)

    seg_starts = np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]
    seg_sizes = np.diff(np.concatenate([seg_starts, [n]]))

    # star_over = cap: segments above the cap (possible when hot-key stats
    # drifted or salting is off) connect via star pairs only. Safe for the
    # recall metric — recall counts co-CLUSTERED oracle pairs, and a star
    # keeps the component connected — while capping the quadratic
    # evaluation cost of near-identical mega-groups.
    cap = cfg.execution.hot_band_cap
    ii, jj = _segment_pair_indices(seg_starts, seg_sizes, star_over=cap)

    P = payload_from_table(part, cfg.signature.num_perm)

    # first-collision filter BEFORE the kernel: a candidate pair collides
    # in up to ~26 keys (every band, every block, content...) — only its
    # lowest-rank colliding key evaluates AND emits it, so neither the
    # kernel work nor the pair stream nor the memory traffic is amplified
    # ~20x. Salted subgroup pairs are filtered too: subgroup splits are
    # key-independent in the common case, and cluster-level connectivity
    # (the recall metric) is guaranteed by the representative round anyway.
    if rank_filter and len(ii) and "key_rank" in part.column_names:
        rank_col = part["key_rank"].to_numpy(zero_copy_only=False)
        keep = _no_earlier_collision(P, ii, jj, rank_col[ii], cfg)
        ii, jj = ii[keep], jj[keep]

    dup, reason, score = confirm_pairs_1d(P, ii, jj, cfg)
    pairs = _pairs_table(ids, ii[dup], jj[dup], reason[dup], score[dup])

    # rep rows: first member of every SALTED segment
    if "salted" in part.column_names:
        salted = part["salted"].to_numpy(zero_copy_only=False)
        rep_idx = seg_starts[salted[seg_starts].astype(bool)]
    else:
        rep_idx = empty_idx
    return pairs, rep_idx, part


def make_partition_verifier(cfg: DedupConfig):
    """map_groups(batch_format='pyarrow') over rows grouped by ``part``.

    Output = verified pairs (row_type='pair') + rep payload rows
    (row_type='rep') for the hot-key representative round.
    """

    def _verify(group: pa.Table) -> pa.Table:
        pairs, rep_idx, sorted_part = verify_partition_table(group, cfg)
        n_pairs = len(pairs)
        n_reps = len(rep_idx)
        cols: dict[str, pa.Array] = {}
        cols["row_type"] = pa.array(
            ["pair"] * n_pairs + ["rep"] * n_reps, type=pa.string()
        )
        for name in ("a", "b", "reason"):
            cols[name] = pa.concat_arrays(
                [pairs[name].combine_chunks(), pa.nulls(n_reps, pa.string())]
            )
        cols["score"] = pa.concat_arrays(
            [pairs["score"].combine_chunks(), pa.nulls(n_reps, pa.float32())]
        )
        reps = (
            sorted_part.take(pa.array(rep_idx)) if n_reps else sorted_part.slice(0, 0)
        )
        for name in sorted_part.column_names:
            typ = sorted_part.schema.field(name).type
            rep_col = reps[name].combine_chunks() if n_reps else pa.nulls(0, typ)
            cols[name] = pa.concat_arrays([pa.nulls(n_pairs, typ), rep_col])
        return pa.table(cols)

    return _verify


def make_rep_verifier(cfg: DedupConfig):
    """Second round: rep rows grouped by a hash partition of ``orig_key`` —
    same multi-group kernel keyed on orig_key."""

    def _verify(group: pa.Table) -> pa.Table:
        pairs, _, _ = verify_partition_table(
            group, cfg, key_col="orig_key", rank_filter=False
        )
        return pairs

    return _verify
