"""Landmark (constellation) audio fingerprinting — Shazam-style robust
matching as two skinny exchanges.

`audioalign.shifted_dup_pairs` confirms shifted copies with an FFT
cross-correlation over candidate pairs from a whole-clip embedding; that
candidate key weakens as the overlap fraction shrinks (an embedding of a
6 s clip and of a 1.5 s excerpt of it pool different content). Landmark
fingerprinting removes the whole-clip assumption: the unit of identity
is a LOCAL spectral event, so any two clips sharing a few seconds of
audio — shifted copies, re-encodes, AND clip-in-clip containment — vote
each other up regardless of what surrounds the shared span.

≙ the reference's `are_contained` time-window probe
(/root/reference/deduplidog/utils.py:128-166: index by timestamp, probe
a window, verify with a perceptual hash) re-expressed in the payload
domain: the "timestamp index" becomes an inverted index of quantized
spectral landmarks, the "window probe" becomes an offset-histogram vote.

Algorithm (Wang 2003, "An Industrial-Strength Audio Search Algorithm"):

1. decode → resample to ``work_sr`` → STFT log-magnitude;
2. constellation: per frame keep the ``peaks_per_frame`` strongest bins
   that are also 3×3 local maxima;
3. landmarks: pair each anchor peak with up to ``fanout`` peaks in a
   forward target zone; hash = (f1, Δf, Δt) packed into an int32-range
   key; one row per landmark: (hash, clip, t_anchor);
4. inverted index: hash-partition landmark rows by ``hash % P`` (skinny:
   ~30 B/row, payload never ships); within a partition, same-hash
   segments of size 2..``bucket_cap`` emit clip pairs with
   dt = t_b − t_a. Buckets above ``bucket_cap`` are STOP HASHES (the
   audio analog of stopwords / hot keys) — dropped and counted, never
   paired (a quadratic bucket is a skew bug, not signal);
5. vote: pair rows hash-partition by pair key; per pair the modal dt
   (±1 frame, STFT phase jitter) is the alignment, its vote count the
   confidence. Pairs pass with ``votes ≥ min_votes`` and a DISTINCT-HASH
   coverage gate: the number of distinct landmark hashes matching at the
   modal offset over the shorter side's distinct-hash vocabulary must
   reach ``min_hash_coverage``. The distinct-hash gate is what makes the
   op robust on near-stationary audio: two different recordings sharing
   one coinciding spectral partial repeat that ONE hash at every frame
   (high raw votes, flat across offsets), but they share only a couple
   of distinct hashes — while a true copy matches essentially the whole
   constellation vocabulary at its one true offset.

Scale shape: both exchanges move fixed-width key rows ∝ landmarks
(≈ frames × peaks × fanout, linear in audio seconds); bucket pairing is
O(cap²) bounded; no all-pairs scan, no payload through the shuffle, no
driver-side loop over clips. Containment falls out for free: an excerpt
shares its whole constellation with its container, so coverage→1 on the
SHORTER side while the offset localizes the excerpt inside the
container.

Exchange mechanics (``exchange=`` parameter): the default ``auto`` picks
the HIVE path on one node / shared storage — a map-side
hive-partitioned parquet write into tmpfs plus one kernel task per
partition (the flagship's measured-~3x-faster alternative to Ray's
sort-based groupby, ``stages/exchange.py``), with rows fully skinny:
landmark rows ship (hash, cid64, t) = 24 B and the exchange-1 kernel
writes pair rows (a64, b64, dt, h) = 32 B STRAIGHT into the exchange-2
directory (map-side shuffle write — no intermediate materialization
hop), returning only per-clip meta partials (row count + distinct-hash
count per partition; hash-space is disjoint across partitions, so the
partials SUM to the exact per-clip totals). Vote tasks read one
partition each with a once-broadcast cid64 → (clip_id, n_lm, n_hash)
map. ``sort`` keeps Ray's sort-based groupby with self-describing rows
(strings + inline meta) — the correct fallback on multi-node clusters
without shared exchange storage. Both paths produce IDENTICAL pairs
(tests/test_audiofp.py asserts bit parity). 64-bit cid routing keys are
collision-safe to ~10^9 clips; beyond that, widen to a (h1, h2) 128-bit
key pair and replace the broadcast id map with a final skinny join of
the (few) confirmed pairs back to the clips table.

No SQL oracle is possible (payload decode + STFT); parity gates live in
tests/test_audiofp.py: planted shifted/µ-law re-encoded copies and
excerpts recovered with frame-accurate offsets, distinct clips rejected,
stop-hash cap exercised.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.audio.codecs import CodecError, decode
from deduplidog_ray.pipelines.audiotransform import fft_resample

#: landmark hash packing widths — f1:9 bits | Δf+64:7 bits | Δt:6 bits
_DF_SPAN = 64
_DT_MAX = 63

PAIR_COLUMNS = [
    "clip_a", "clip_b", "offset_ms", "votes",
    "coverage_a", "coverage_b", "hash_coverage",
]


def _stft_logmag(pcm: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(frames, bins) log-magnitude STFT, Hann window, no padding."""
    if len(pcm) < n_fft:
        pcm = np.pad(pcm, (0, n_fft - len(pcm)))
    n_frames = 1 + (len(pcm) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = pcm[idx] * np.hanning(n_fft)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    return np.log1p(mag)


def _constellation(
    s: np.ndarray, peaks_per_frame: int
) -> tuple[np.ndarray, np.ndarray]:
    """(t, f) arrays of constellation peaks: per-frame strongest bins
    that are 3×3 local maxima above the spectrogram mean."""
    nt, nf = s.shape
    if nt == 0 or nf < 3:
        e = np.empty(0, dtype=np.int64)
        return e, e
    interior = s[1:-1, 1:-1] if nt >= 3 else s[:0, 1:-1]
    if interior.size == 0:
        # 1-2 frames: fall back to per-frame top bins (no time neighbors)
        local = np.ones_like(s, dtype=bool)
        local[:, 0] = local[:, -1] = False
    else:
        m = np.ones_like(interior, dtype=bool)
        for dt in (-1, 0, 1):
            for df in (-1, 0, 1):
                if dt == 0 and df == 0:
                    continue
                m &= interior >= s[1 + dt:nt - 1 + dt, 1 + df:nf - 1 + df]
        local = np.zeros_like(s, dtype=bool)
        local[1:-1, 1:-1] = m
    local &= s > s.mean()
    # keep at most peaks_per_frame strongest local maxima per frame
    masked = np.where(local, s, -np.inf)
    kth = nf - peaks_per_frame
    thresh = np.partition(masked, kth, axis=1)[:, kth]
    keep = local & (masked >= thresh[:, None])
    t, f = np.nonzero(keep)
    return t.astype(np.int64), f.astype(np.int64)


def _landmarks(
    pcm: np.ndarray,
    n_fft: int,
    hop: int,
    peaks_per_frame: int,
    fanout: int,
    zone_dt: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(hash, t_anchor) int64 arrays for one clip. Peaks are sorted by
    (t, f); each anchor pairs with its next ``fanout`` peaks within
    ``zone_dt`` frames and |Δf| < _DF_SPAN."""
    s = _stft_logmag(pcm, n_fft, hop)
    t, f = _constellation(s, peaks_per_frame)
    n = len(t)
    if n < 2:
        e = np.empty(0, dtype=np.int64)
        return e, e
    hashes, anchors = [], []
    # vectorized over the fanout offset: partner j = i + 1 + k
    for k in range(fanout):
        j = np.arange(n - 1 - k)
        dt = t[j + 1 + k] - t[j]
        df = f[j + 1 + k] - f[j]
        ok = (dt >= 1) & (dt <= min(zone_dt, _DT_MAX)) & (
            np.abs(df) < _DF_SPAN
        )
        if not ok.any():
            continue
        jj = j[ok]
        h = (
            (f[jj] << 13)
            | ((df[ok] + _DF_SPAN) << 6)
            | dt[ok]
        )
        hashes.append(h)
        anchors.append(t[jj])
    if not hashes:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(hashes), np.concatenate(anchors)


#: seed for the int64 routing key of clip_id on the skinny/hive path —
#: the landmark stage and the driver-side id map must agree on it.
_CID_SEED = 0xFA57


class _LandmarkStage:
    """Actor-pool batch fn: clips table → landmark rows. Window/pair
    params fixed in __init__; decode errors drop the row (quarantine is
    the flagship's job). ``skinny=False`` (sort path) emits
    self-describing rows (hash, clip_id, t, n_lm, n_hash); ``skinny=True``
    (hive path) emits (hash, cid, t) only — 24 B/row; per-clip totals are
    reconstructed exactly from exchange-1 partials (see module
    docstring)."""

    def __init__(
        self,
        work_sr: int,
        n_fft: int,
        hop: int,
        peaks_per_frame: int,
        fanout: int,
        zone_dt: int,
        id_col: str,
        skinny: bool = False,
    ) -> None:
        self.work_sr = work_sr
        self.n_fft = n_fft
        self.hop = hop
        self.ppf = peaks_per_frame
        self.fanout = fanout
        self.zone_dt = zone_dt
        self.id_col = id_col
        self.skinny = skinny

    def __call__(self, t: pa.Table) -> pa.Table:
        from deduplidog_ray.stages.hashing import hash_strings_u64

        ids = t[self.id_col].to_pylist()
        bufs = t["bytes"].to_pylist()
        codecs = t["codec"].to_pylist()
        srs = t["sr_hz"].to_pylist()
        cid64 = (
            hash_strings_u64(ids, seed=_CID_SEED).view(np.int64)
            if self.skinny else None
        )
        out_h, out_id, out_t, out_n, out_nh = [], [], [], [], []
        kept_ids: list[str] = []
        for k, (cid, buf, codec, sr) in enumerate(
            zip(ids, bufs, codecs, srs)
        ):
            try:
                pcm, sr_dec = decode(buf, codec)
            except CodecError:
                continue
            sr = sr_dec or int(sr)
            if sr != self.work_sr:
                pcm = fft_resample(pcm, sr, self.work_sr)
            h, ta = _landmarks(
                pcm, self.n_fft, self.hop, self.ppf, self.fanout,
                self.zone_dt,
            )
            if len(h) == 0:
                continue
            out_h.append(h)
            out_t.append(ta)
            if self.skinny:
                out_id.append(np.full(len(h), cid64[k], dtype=np.int64))
                kept_ids.append(cid)
            else:
                out_id.extend([cid] * len(h))
                out_n.append(np.full(len(h), len(h), dtype=np.int64))
                out_nh.append(
                    np.full(len(h), len(np.unique(h)), dtype=np.int64)
                )
        if self.skinny:
            # one sentinel ID ROW per contributing clip (hash=-1, the
            # only negative hash — real hashes pack into < 2^22): carries
            # the cid64 -> clip_id mapping through THIS pass so the hive
            # driver never re-executes the (possibly expensive) upstream
            # pipeline just to read the id column. Landmark rows leave
            # clip_id null — parquet stores the all-null stretches for
            # free.
            if not out_h:
                return pa.table({
                    "hash": pa.array([], type=pa.int64()),
                    "cid": pa.array([], type=pa.int64()),
                    "t": pa.array([], type=pa.int64()),
                    "clip_id": pa.array([], type=pa.string()),
                })
            lm_h = np.concatenate(out_h)
            lm_cid = np.concatenate(out_id)
            lm_t = np.concatenate(out_t)
            id_cids = np.array(
                [arr[0] for arr in out_id], dtype=np.int64
            )
            id_strs = kept_ids
            return pa.table({
                "hash": pa.array(np.concatenate(
                    [lm_h, np.full(len(id_cids), -1, dtype=np.int64)]
                )),
                "cid": pa.array(np.concatenate([lm_cid, id_cids])),
                "t": pa.array(np.concatenate(
                    [lm_t, np.zeros(len(id_cids), dtype=np.int64)]
                )),
                "clip_id": pa.array(
                    [None] * len(lm_h) + id_strs, type=pa.string()
                ),
            })
        if not out_h:
            return pa.table({
                "hash": pa.array([], type=pa.int64()),
                "clip_id": pa.array([], type=pa.string()),
                "t": pa.array([], type=pa.int64()),
                "n_lm": pa.array([], type=pa.int64()),
                "n_hash": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "hash": pa.array(np.concatenate(out_h)),
            "clip_id": pa.array(out_id, type=pa.string()),
            "t": pa.array(np.concatenate(out_t)),
            "n_lm": pa.array(np.concatenate(out_n)),
            "n_hash": pa.array(np.concatenate(out_nh)),
        })


def _pairs_within_segments(
    starts: np.ndarray, sizes: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Global (i, j) index arrays for all ordered within-segment pairs,
    fully vectorized per distinct segment size; segments larger than
    ``cap`` are skipped (stop hashes) and counted."""
    multi = sizes >= 2
    stop = int((sizes > cap).sum())
    use = multi & (sizes <= cap)
    ii, jj = [], []
    for k in np.unique(sizes[use]):
        st = starts[use & (sizes == k)]
        i0, j0 = np.triu_indices(int(k), 1)
        ii.append((st[:, None] + i0[None, :]).ravel())
        jj.append((st[:, None] + j0[None, :]).ravel())
    if not ii:
        e = np.empty(0, dtype=np.int64)
        return e, e, stop
    return np.concatenate(ii), np.concatenate(jj), stop


def _bucket_pairs(g: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Partition kernel (exchange 1): same-hash landmark rows → pair
    rows (a, b, dt, h, n_a, n_b, nh_a, nh_b). a < b lexicographically so
    the same pair always lands in the same exchange-2 partition."""
    h = g["hash"].to_numpy()
    cid = g["clip_id"].to_numpy()
    tt = g["t"].to_numpy()
    nn = g["n_lm"].to_numpy()
    nh = g["n_hash"].to_numpy()
    order = np.argsort(h, kind="stable")   # segments need hash order only
    h, cid, tt = h[order], cid[order], tt[order]
    nn, nh = nn[order], nh[order]
    n = len(h)
    seg_starts = np.nonzero(np.concatenate([[True], h[1:] != h[:-1]]))[0]
    seg_sizes = np.diff(np.concatenate([seg_starts, [n]]))
    i, j, _stop = _pairs_within_segments(seg_starts, seg_sizes, cap)
    empty = pd.DataFrame({
        "a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
        "dt": pd.Series(dtype="int64"), "h": pd.Series(dtype="int64"),
        "n_a": pd.Series(dtype="int64"), "n_b": pd.Series(dtype="int64"),
        "nh_a": pd.Series(dtype="int64"), "nh_b": pd.Series(dtype="int64"),
    })
    if len(i) == 0:
        return empty
    ca, cb = cid[i], cid[j]
    same = ca == cb                      # self-matches (repeated content
    i, j, ca, cb = i[~same], j[~same], ca[~same], cb[~same]   # in-clip)
    if len(i) == 0:
        return empty
    swap = ca > cb
    aa = np.where(swap, cb, ca)
    bb = np.where(swap, ca, cb)
    dt = np.where(swap, tt[i] - tt[j], tt[j] - tt[i])
    na = np.where(swap, nn[j], nn[i])
    nb = np.where(swap, nn[i], nn[j])
    nha = np.where(swap, nh[j], nh[i])
    nhb = np.where(swap, nh[i], nh[j])
    return pd.DataFrame({
        "a": aa, "b": bb, "dt": dt, "h": h[i],
        "n_a": na, "n_b": nb, "nh_a": nha, "nh_b": nhb,
    })


def _vote_core(
    ka: np.ndarray, kb: np.ndarray, dt: np.ndarray, hh: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Offset-histogram voting over pair rows keyed by int (ka, kb) —
    the shared kernel of both exchange paths. Votes = count of the modal
    dt merged with its ±1-frame neighbors (STFT quantization jitter);
    hmatch counts DISTINCT hashes within ±1 frame of the modal dt.

    Returns ``(order, first_idx, win_dt, win_votes, hmatch, amb)``:
    ``order`` sorts the input rows by (ka, kb, dt); ``first_idx`` picks
    one SORTED row per distinct pair, aligned with the per-pair
    ``win_*``/``amb`` arrays. ``amb`` flags pairs whose ±d offset runs
    are content-indistinguishable (see tie-break comment) — callers
    re-orienting a pair must NOT negate an amb offset."""
    order = np.lexsort((dt, kb, ka))
    ka_s, kb_s = ka[order], kb[order]
    dt_s, hh_s = dt[order], hh[order]
    n = len(ka_s)
    # pair ids: dense int per (a, b) over the sorted rows
    pair_new = np.concatenate(
        [[True], (ka_s[1:] != ka_s[:-1]) | (kb_s[1:] != kb_s[:-1])]
    )
    pid = np.cumsum(pair_new) - 1
    # run-length encode identical (pid, dt)
    new = np.concatenate(
        [[True], (pid[1:] != pid[:-1]) | (dt_s[1:] != dt_s[:-1])]
    )
    starts = np.nonzero(new)[0]
    counts = np.diff(np.concatenate([starts, [n]]))
    rp, rdt = pid[starts], dt_s[starts]
    # same-pair neighbor runs at dt±1 add their counts (jitter merge)
    same_prev = np.zeros(len(starts), dtype=bool)
    same_prev[1:] = rp[1:] == rp[:-1]
    votes = counts.astype(np.int64)
    adj_prev = same_prev & np.concatenate([[False], rdt[1:] == rdt[:-1] + 1])
    votes[adj_prev] += counts[np.nonzero(adj_prev)[0] - 1]
    adj_next = np.zeros(len(starts), dtype=bool)
    adj_next[:-1] = same_prev[1:] & (rdt[:-1] == rdt[1:] - 1)
    votes[adj_next] += counts[np.nonzero(adj_next)[0] + 1]
    # argmax votes per pair. Tie-breaks must be EQUIVARIANT under dt
    # negation, because the hive path votes in cid64 orientation (dt
    # negated vs string order for roughly half the pairs) and flips to
    # string orientation only at the end — a plain min-dt tie-break
    # would elect different offsets on the two paths. Ties on votes
    # prefer the smallest |dt| (negation-equivariant, and the
    # physically closest alignment); ±|dt| ties prefer the run with
    # the smaller hash (sum, min, max) — run content is the same
    # physical rows in either orientation, so these are all
    # orientation-invariant. The final positive-dt fallback fires only
    # when the ±d runs tie on ALL content stats; such pairs are flagged
    # ``amb`` so the two alignments are treated as indistinguishable:
    # both orientations elect +|d|, the hmatch window is symmetric over
    # ±|d|, and the caller must NOT negate amb offsets when flipping a
    # pair back to string orientation — keeping the two exchange paths
    # bit-identical even in this degenerate corner.
    rhsum = np.add.reduceat(hh_s.astype(np.int64), starts)
    rhmin = np.minimum.reduceat(hh_s, starts)
    rhmax = np.maximum.reduceat(hh_s, starts)
    sel = np.lexsort(
        (rdt, -rhmax, -rhmin, -rhsum, -np.abs(rdt), votes, rp)
    )
    rp_s, rdt_s, votes_s = rp[sel], rdt[sel], votes[sel]
    last = np.concatenate([rp_s[1:] != rp_s[:-1], [True]])
    win_pid, win_dt, win_votes = rp_s[last], rdt_s[last], votes_s[last]
    # fully-tied ±d twin: all chain keys equal except the sign of dt.
    # The twin, if it exists, sorts IMMEDIATELY before the winner (all
    # earlier keys equal => adjacent, ordered by the rdt key), and the
    # winner then has dt > 0.
    j = np.nonzero(last)[0]
    k = j - 1                       # j==0 wraps to -1, masked below
    counts_s = counts[sel]
    rhsum_s, rhmin_s, rhmax_s = rhsum[sel], rhmin[sel], rhmax[sel]
    amb = (
        (j > 0)
        & (rp_s[k] == win_pid)
        & (win_dt > 0)
        & (rdt_s[k] == -win_dt)
        & (votes_s[k] == win_votes)
        & (counts_s[k] == counts_s[j])
        & (rhsum_s[k] == rhsum_s[j])
        & (rhmin_s[k] == rhmin_s[j])
        & (rhmax_s[k] == rhmax_s[j])
    )
    # distinct hashes matching within ±1 of each pair's modal dt:
    # rows are (pid, dt, h); look up the pair's winning dt and count
    # unique h among rows with |dt - win| <= 1 — all vectorized.
    # amb pairs use the SYMMETRIC window (either of the two tied
    # alignments), which is invariant under dt negation.
    win_for_row = win_dt[pid]            # win_pid is 0..P-1 == index
    near = np.abs(dt_s - win_for_row) <= 1
    near |= amb[pid] & (np.abs(dt_s + win_for_row) <= 1)
    if near.any():
        # landmark hashes pack (f, Δf, Δt) into < 2^22 (see _landmarks),
        # so (pid, h) packs losslessly into one int64 — a 1-D unique
        # instead of np.unique(axis=0)'s row-wise lexsort
        key = (pid[near].astype(np.int64) << np.int64(32)) | hh_s[near]
        uk = np.unique(key)
        hmatch = np.bincount(uk >> np.int64(32), minlength=len(win_pid))
    else:
        hmatch = np.zeros(len(win_pid), dtype=np.int64)
    first_idx = starts[np.nonzero(np.concatenate(
        [[True], rp[1:] != rp[:-1]]))[0]]      # one sorted row per pair
    return order, first_idx, win_dt, win_votes, hmatch, amb


def _vote_partition(
    g: pd.DataFrame, min_votes: int, min_coverage: float,
    min_hash_coverage: float, hop_ms: float,
) -> pd.DataFrame:
    """Partition kernel (exchange 2, sort path): self-describing pair
    rows → confirmed pairs. Landmark coverage is votes over each side's
    landmark count; hash coverage is hmatch over the shorter side's
    distinct-hash vocabulary (the stationary-audio discriminator)."""
    if len(g) == 0:
        return pd.DataFrame(columns=PAIR_COLUMNS)
    # factorize the string ids ONCE: all grouping/sorting below runs on
    # dense int codes (an object-dtype np.lexsort costs a Python compare
    # per element — measured ~2/3 of this kernel's wall at 3M pair rows);
    # the strings are only fancy-indexed for the output rows
    codes_a, _ = pd.factorize(g["a"], sort=False)
    codes_b, _ = pd.factorize(g["b"], sort=False)
    # amb pairs already carry +|d| and the string orientation IS the
    # vote orientation here, so the flag needs no further handling
    order, first_idx, win_dt, win_votes, hmatch, _amb = _vote_core(
        codes_a, codes_b, g["dt"].to_numpy(), g["h"].to_numpy()
    )
    sel = order[first_idx]        # one P-sized gather per column, not
    ra = g["a"].to_numpy()[sel]   # an O(N) permutation then a pick
    rb = g["b"].to_numpy()[sel]
    rna = g["n_a"].to_numpy()[sel]
    rnb = g["n_b"].to_numpy()[sel]
    rnha = g["nh_a"].to_numpy()[sel]
    rnhb = g["nh_b"].to_numpy()[sel]
    cov_a = win_votes / np.maximum(rna, 1)
    cov_b = win_votes / np.maximum(rnb, 1)
    hcov = hmatch / np.maximum(np.minimum(rnha, rnhb), 1)
    ok = (
        (win_votes >= min_votes)
        & (np.maximum(cov_a, cov_b) >= min_coverage)
        & (hcov >= min_hash_coverage)
    )
    return pd.DataFrame({
        "clip_a": ra[ok],
        "clip_b": rb[ok],
        "offset_ms": np.round(win_dt[ok] * hop_ms).astype(np.int64),
        "votes": win_votes[ok],
        "coverage_a": np.round(cov_a[ok], 4),
        "coverage_b": np.round(cov_b[ok], 4),
        "hash_coverage": np.round(hcov[ok], 4),
    })


def _bucket_pairs_skinny(
    t: pa.Table, cap: int, partitions: int, x2dir: str, tag: str,
) -> pa.Table:
    """Hive exchange-1 kernel: one hash partition of skinny landmark
    rows (hash, cid, t) → pair rows (a, b, dt, h) written STRAIGHT into
    the exchange-2 directory hive-partitioned by the pair key (map-side
    shuffle write), returning only per-clip meta partials
    (cid, n_lm, n_hash). hash-space is disjoint across partitions, so
    summing the partials over partitions yields each clip's exact total
    landmark count and distinct-hash count."""
    import pyarrow.parquet as pq

    from deduplidog_ray.stages.hashing import mix64

    h = t["hash"].to_numpy()
    cid = t["cid"].to_numpy()
    tt = t["t"].to_numpy()
    order = np.argsort(h, kind="stable")
    h, cid, tt = h[order], cid[order], tt[order]
    n = len(h)
    # meta partials: rows + distinct hashes per cid within this partition
    o2 = np.lexsort((h, cid))
    c2, h2 = cid[o2], h[o2]
    cid_new = np.concatenate([[True], c2[1:] != c2[:-1]])
    gid = np.cumsum(cid_new) - 1
    dh_new = cid_new | np.concatenate([[True], h2[1:] != h2[:-1]])
    meta = pa.table({
        "cid": pa.array(c2[cid_new]),
        "n_lm": pa.array(np.bincount(gid)),
        "n_hash": pa.array(np.bincount(gid[dh_new])),
    })
    seg_starts = np.nonzero(np.concatenate([[True], h[1:] != h[:-1]]))[0]
    seg_sizes = np.diff(np.concatenate([seg_starts, [n]]))
    i, j, _stop = _pairs_within_segments(seg_starts, seg_sizes, cap)
    if len(i) == 0:
        return meta
    ca, cb = cid[i], cid[j]
    keep = ca != cb                       # self-matches (repeated content
    i, j, ca, cb = i[keep], j[keep], ca[keep], cb[keep]       # in-clip)
    if len(i) == 0:
        return meta
    swap = ca > cb
    aa = np.where(swap, cb, ca)
    bb = np.where(swap, ca, cb)
    dt = np.where(swap, tt[i] - tt[j], tt[j] - tt[i])
    part2 = (
        (mix64(aa.view(np.uint64)) ^ mix64(bb.view(np.uint64)))
        % np.uint64(partitions)
    ).astype(np.int64)
    pq.write_to_dataset(
        pa.table({"a": aa, "b": bb, "dt": dt, "h": h[i], "part2": part2}),
        x2dir,
        partition_cols=["part2"],
        basename_template=f"{tag}-{{i}}.parquet",
    )
    return meta


def _vote_dir_skinny(
    d: str, meta: tuple, idmap: tuple, min_votes: int, min_coverage: float,
    min_hash_coverage: float, hop_ms: float,
) -> pd.DataFrame:
    """Hive exchange-2 kernel: one pair-key partition of skinny pair
    rows → confirmed pairs. ``meta`` is the broadcast (cid_sorted, n_lm,
    n_hash) arrays; ``idmap`` the broadcast (cid_sorted, clip_id)
    arrays. Pair orientation is re-canonicalized to string order at the
    end so both exchange paths emit IDENTICAL rows."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = _glob.glob(os.path.join(d, "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    if len(t) == 0:
        return pd.DataFrame(columns=PAIR_COLUMNS)
    ka = t["a"].to_numpy()
    kb = t["b"].to_numpy()
    order, first_idx, win_dt, win_votes, hmatch, amb = _vote_core(
        ka, kb, t["dt"].to_numpy(), t["h"].to_numpy()
    )
    sel = order[first_idx]
    wa = ka[sel]
    wb = kb[sel]
    mc, mn, mh = meta
    ia, ib = np.searchsorted(mc, wa), np.searchsorted(mc, wb)
    rna, rnha = mn[ia], mh[ia]
    rnb, rnhb = mn[ib], mh[ib]
    cov_a = win_votes / np.maximum(rna, 1)
    cov_b = win_votes / np.maximum(rnb, 1)
    hcov = hmatch / np.maximum(np.minimum(rnha, rnhb), 1)
    ok = (
        (win_votes >= min_votes)
        & (np.maximum(cov_a, cov_b) >= min_coverage)
        & (hcov >= min_hash_coverage)
    )
    ic, ids = idmap
    ra = ids[np.searchsorted(ic, wa[ok])]
    rb = ids[np.searchsorted(ic, wb[ok])]
    win_dt, win_votes, amb = win_dt[ok], win_votes[ok], amb[ok]
    cov_a, cov_b, hcov = cov_a[ok], cov_b[ok], hcov[ok]
    # numeric cid order != string order: restore the sort path's
    # lexicographic orientation (swap sides, negate the offset) —
    # EXCEPT amb pairs, whose ±d alignments are indistinguishable and
    # canonically elected as +|d| in every orientation (_vote_core)
    flip = ra > rb
    ra2 = np.where(flip, rb, ra)
    rb2 = np.where(flip, ra, rb)
    return pd.DataFrame({
        "clip_a": ra2,
        "clip_b": rb2,
        "offset_ms": np.round(
            np.where(flip & ~amb, -win_dt, win_dt) * hop_ms
        ).astype(np.int64),
        "votes": win_votes,
        "coverage_a": np.round(np.where(flip, cov_b, cov_a), 4),
        "coverage_b": np.round(np.where(flip, cov_a, cov_b), 4),
        "hash_coverage": np.round(hcov, 4),
    })


def _landmark_pairs_hive(
    lm: ray.data.Dataset,
    bucket_cap: int, min_votes: int, min_coverage: float,
    min_hash_coverage: float, partitions: int, hop_ms: float,
    workdir: str | None = None,
) -> pd.DataFrame:
    """Hive-exchange driver: two map-side partitioned writes through
    tmpfs/shared storage, one kernel task per partition, meta + id map
    broadcast once via ray.put (see module docstring)."""
    import glob as _glob
    import shutil
    import uuid

    from deduplidog_ray.stages.exchange import exchange_base

    run_id = uuid.uuid4().hex[:8]
    base = exchange_base(workdir)
    x1 = os.path.join(base, f"lmx1-{run_id}")
    x2 = os.path.join(base, f"lmx2-{run_id}")

    def _part1(t: pa.Table) -> pa.Table:
        # sentinel id rows (hash = -1) get their own partition index P;
        # landmark rows hash-partition into 0..P-1
        h = t["hash"].to_numpy()
        part = np.where(
            h < 0,
            np.int64(partitions),
            (h.view(np.uint64) % np.uint64(partitions)).astype(np.int64),
        )
        return t.append_column("part", pa.array(part))

    vote_task = ray.remote(_vote_dir_skinny)

    @ray.remote
    def _bucket_dir(d: str, tag: str) -> pa.Table:
        import glob as _g

        import pyarrow.parquet as pq

        files = _g.glob(os.path.join(d, "*.parquet"))
        t = pa.concat_tables([
            pq.read_table(f, columns=["hash", "cid", "t"]) for f in files
        ])
        return _bucket_pairs_skinny(t, bucket_cap, partitions, x2, tag)

    try:
        os.makedirs(x2, exist_ok=True)
        lm.map_batches(
            _part1, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(x1, partition_cols=["part"])
        id_dir = os.path.join(x1, f"part={partitions}")
        part_dirs = sorted(
            d for d in _glob.glob(os.path.join(x1, "part=*")) if d != id_dir
        )
        metas = ray.get([
            _bucket_dir.remote(d, f"p{k}") for k, d in enumerate(part_dirs)
        ])
        # cid64 -> clip_id map from the sentinel id rows the landmark
        # stage emitted into partition P — NOT from a second pass over
        # ``clips`` (a lazy upstream with decode/transform stages would
        # re-execute wholesale just to read the id column; measured
        # +20 s on the driver query). At ~10^12 clips this map outgrows
        # a broadcast — replace with a final keyed join of the (few)
        # confirmed pairs to the clips table (module docstring).
        import pyarrow.parquet as pq

        id_files = _glob.glob(os.path.join(id_dir, "*.parquet"))
        ids_tbl = pa.concat_tables([
            pq.read_table(f, columns=["cid", "clip_id"]) for f in id_files
        ]) if id_files else pa.table(
            {"cid": pa.array([], type=pa.int64()),
             "clip_id": pa.array([], type=pa.string())}
        )
        shutil.rmtree(x1, ignore_errors=True)
        metas = [m for m in metas if len(m)]
        if not metas:
            return pd.DataFrame(columns=PAIR_COLUMNS)
        # sum the per-partition partials into exact per-clip totals
        mt = pa.concat_tables(metas)
        mcid = mt["cid"].to_numpy()
        morder = np.argsort(mcid, kind="stable")
        mcid = mcid[morder]
        firsts = np.concatenate([[True], mcid[1:] != mcid[:-1]])
        gid = np.cumsum(firsts) - 1
        meta = (
            mcid[firsts],
            np.bincount(gid, weights=mt["n_lm"].to_numpy()[morder])
            .astype(np.int64),
            np.bincount(gid, weights=mt["n_hash"].to_numpy()[morder])
            .astype(np.int64),
        )
        ids = np.asarray(ids_tbl["clip_id"].to_pylist(), dtype=object)
        cids = ids_tbl["cid"].to_numpy()
        iorder = np.argsort(cids, kind="stable")
        meta_ref = ray.put(meta)
        idmap_ref = ray.put((cids[iorder], ids[iorder]))
        pair_dirs = sorted(_glob.glob(os.path.join(x2, "part2=*")))
        outs = ray.get([
            vote_task.remote(
                d, meta_ref, idmap_ref, min_votes, min_coverage,
                min_hash_coverage, hop_ms,
            )
            for d in pair_dirs
        ])
    finally:
        shutil.rmtree(x1, ignore_errors=True)
        shutil.rmtree(x2, ignore_errors=True)
    outs = [o for o in outs if len(o)]
    if not outs:
        return pd.DataFrame(columns=PAIR_COLUMNS)
    return (
        pd.concat(outs, ignore_index=True)
        .sort_values(["clip_a", "clip_b"])
        .reset_index(drop=True)
    )


def landmark_dup_pairs(
    clips: ray.data.Dataset,
    work_sr: int = 8000,
    n_fft: int = 512,
    hop: int = 128,
    peaks_per_frame: int = 5,
    fanout: int = 6,
    zone_dt: int = 32,
    bucket_cap: int = 24,
    min_votes: int = 12,
    min_coverage: float = 0.02,
    min_hash_coverage: float = 0.065,
    partitions: int = 32,
    id_col: str = "clip_id",
    exchange: str = "auto",
    workdir: str | None = None,
) -> pd.DataFrame:
    """Robust audio duplicate / containment pairs via landmark voting:
    (clip_a, clip_b, offset_ms, votes, coverage_a, coverage_b), sorted.
    ``offset_ms`` is how much LATER the shared content plays in clip_b
    than in clip_a (positive: b carries a lead-in / is the delayed copy;
    negative: b is an excerpt starting |offset| into a). The max of the
    two coverages is the contained side's matched fraction.

    ``exchange``: "hive" (skinny map-side shuffle through tmpfs/shared
    storage), "sort" (Ray sort-based groupby — correct anywhere), or
    "auto" (hive where a directory exchange is safe; module docstring).
    ``workdir``: shared-storage root for the hive exchange directories.
    On a multi-node cluster the hive path REQUIRES one (asserted shared
    via DEDUPLIDOG_SHARED_EXCHANGE=1) — without it the exchange would
    land on node-local tmpfs and remote workers' partitions would be
    invisible to readers, silently dropping pairs — so "auto" falls
    back to the sort exchange and an explicit "hive" raises."""
    from deduplidog_ray.stages.exchange import hive_safe

    if exchange not in ("auto", "hive", "sort"):
        raise ValueError(f"unknown exchange {exchange!r}")
    if exchange == "hive" and not hive_safe(workdir):
        raise RuntimeError(
            "exchange='hive' on a multi-node cluster needs a shared "
            "workdir= (and DEDUPLIDOG_SHARED_EXCHANGE=1 asserting it is "
            "on shared storage); use exchange='sort' otherwise"
        )
    use_hive = exchange == "hive" or (
        exchange == "auto" and hive_safe(workdir)
    )
    hop_ms = hop * 1000.0 / work_sr
    lm = clips.map_batches(
        _LandmarkStage,
        fn_constructor_kwargs=dict(
            work_sr=work_sr, n_fft=n_fft, hop=hop,
            peaks_per_frame=peaks_per_frame, fanout=fanout,
            zone_dt=zone_dt, id_col=id_col, skinny=use_hive,
        ),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if use_hive:
        return _landmark_pairs_hive(
            lm, bucket_cap, min_votes, min_coverage,
            min_hash_coverage, partitions, hop_ms, workdir,
        )

    def _part1(t: pa.Table) -> pa.Table:
        part = (t["hash"].to_numpy().view(np.uint64)
                % np.uint64(partitions)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    pair_rows = (
        lm.map_batches(_part1, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: _bucket_pairs(g.drop(columns=["part"]), bucket_cap),
            batch_format="pandas",
        )
    )

    from deduplidog_ray.stages.hashing import hash_arrow_u64

    def _part2(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("part", pa.array([], type=pa.int64()))
        # Arrow-cast -> polars xxhash: no to_pylist per row (the exact.py
        # add_key_hash path); a is already < b so the pair key is ordered
        ha = hash_arrow_u64(t["a"], seed=0xF1D0)
        hb = hash_arrow_u64(t["b"], seed=0x0D1F)
        part = ((ha ^ hb) % np.uint64(partitions)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    confirmed = (
        pair_rows.map_batches(
            _part2, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part")
        .map_groups(
            lambda g: _vote_partition(
                g.drop(columns=["part"]), min_votes, min_coverage,
                min_hash_coverage, hop_ms,
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if confirmed.empty:
        return pd.DataFrame(columns=PAIR_COLUMNS)
    return confirmed.sort_values(["clip_a", "clip_b"]).reset_index(drop=True)


#: query-side id prefix for snippet_search — \x1f cannot appear in the
#: synthesizer/user clip-id conventions this repo uses (asserted below)
_QUERY_PREFIX = "q\x1f"

SEARCH_COLUMNS = ["query_id", "clip_id", "offset_ms", "votes", "rank"]


def snippet_search(
    corpus: ray.data.Dataset,
    queries: ray.data.Dataset,
    top_k: int = 3,
    id_col: str = "clip_id",
    min_votes: int = 12,
    min_coverage: float = 0.02,
    min_hash_coverage: float = 0.065,
    **landmark_kwargs,
) -> pd.DataFrame:
    """Query-by-example audio retrieval: for each query clip (a snippet),
    the corpus clips that CONTAIN it, with the snippet's start offset —
    the serving-side twin of :func:`landmark_dup_pairs` (Shazam-style:
    same constellation hashes, same offset-histogram voting; the "query"
    is just a very short clip).

    Returns (query_id, clip_id, offset_ms, votes, rank): ``offset_ms``
    is where the snippet starts inside the corpus clip, ``rank`` orders
    a query's matches by votes (1 = best), at most ``top_k`` per query.

    Shape: queries union the corpus with a side-prefixed id and ride the
    SAME bounded hash-bucket exchange; cross-side pairs are kept. The
    corpus side still pairs against itself inside buckets (bounded by
    ``bucket_cap`` — identical cost to the dedup op); a dedicated
    serving index would hash the corpus ONCE and probe query hashes
    against stored buckets without corpus-corpus pairing — that is an
    index-build + lookup split of this same exchange, not a different
    algorithm.

    Fuzzy-coverage gates are applied to the QUERY side: a 2-second
    snippet can never cover 6.5% of an hour-long clip's hashes, so the
    corpus-side hash_coverage gate of the dedup op would reject every
    hit; min_coverage/min_hash_coverage here bound the matched fraction
    of the SNIPPET's landmarks instead.
    """
    import pyarrow.compute as pc

    def _tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        assert not any(_QUERY_PREFIX in (s or "") for s in ids), \
            "corpus/query clip ids must not contain the q\\x1f prefix"
        tagged = pa.array([_QUERY_PREFIX + (s or "") for s in ids],
                          type=pa.string())
        return t.set_column(
            t.column_names.index(id_col), id_col, tagged
        )

    # both sides go through an Arrow map: a union of raw pandas-backed
    # blocks with Arrow-mapped ones trips Ray's block-type assertion
    # inside downstream map workers
    union = corpus.map_batches(
        lambda t: t, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        queries.map_batches(_tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    )
    # votes/coverage gates: coverage_a/b are per-side matched fractions;
    # keep the pair when the QUERY side clears them (checked below), so
    # hand the kernel the loosest corpus-side gates it accepts
    pairs = landmark_dup_pairs(
        union, min_votes=min_votes, min_coverage=0.0,
        min_hash_coverage=0.0, id_col=id_col, **landmark_kwargs,
    )
    if pairs.empty:
        return pd.DataFrame(columns=SEARCH_COLUMNS)
    a_is_q = pairs["clip_a"].str.startswith(_QUERY_PREFIX)
    b_is_q = pairs["clip_b"].str.startswith(_QUERY_PREFIX)
    cross = a_is_q ^ b_is_q
    p = pairs[cross]
    if p.empty:
        return pd.DataFrame(columns=SEARCH_COLUMNS)
    aq = a_is_q[cross].to_numpy()
    qid = np.where(aq, p["clip_a"], p["clip_b"])
    cid = np.where(aq, p["clip_b"], p["clip_a"])
    # offset_ms = how much later the content plays in clip_b than in
    # clip_a; the snippet starts at 0 in the query, so its start in the
    # corpus clip is +offset when the query is side a, -offset otherwise
    off = np.where(aq, p["offset_ms"], -p["offset_ms"]).astype(np.int64)
    qcov = np.where(aq, p["coverage_a"], p["coverage_b"]).astype(np.float64)
    qhash = np.where(
        aq, p["hash_coverage"], p["hash_coverage"]
    ).astype(np.float64)
    out = pd.DataFrame({
        "query_id": [s[len(_QUERY_PREFIX):] for s in qid],
        "clip_id": cid,
        "offset_ms": off,
        "votes": p["votes"].to_numpy(),
        "qcov": qcov, "qhash": qhash,
    })
    out = out[(out["qcov"] >= min_coverage) | (out["qhash"] >= min_hash_coverage)]
    out = out.sort_values(
        ["query_id", "votes", "clip_id"],
        ascending=[True, False, True],
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out = out[out["rank"] <= top_k]
    return out[SEARCH_COLUMNS].reset_index(drop=True)
