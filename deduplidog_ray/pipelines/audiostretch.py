"""Time-scale-invariant audio fingerprinting: duplicates that differ by
a playback-SPEED change (resample mislabels, tape/vinyl speed, podcast
speed-ups) — the transformation that breaks landmark hashing by design.

A speed change by factor r maps t → r·t and f → f/r simultaneously.
`audiofp`'s landmark hash packs absolute (f1, Δf, Δt), so ±3% speed
moves every component across quantization bins and recall collapses.
This module hashes only SCALE-INVARIANT quantities of peak QUADS
(anchor i and three zone partners j, k, l — the quad idea of
Sonnleitner & Widmer's quad-based fingerprinting, re-expressed over
this repo's constellation):

    q1 = log(f_j / f_i)          # frequency ratios: r cancels
    q2 = log(f_k / f_i)
    q5 = log(f_l / f_i)
    q3 = log(Δt_l / Δt_j)        # time-span ratio: r cancels
    q4 = log(Δt_j · f_i)         # time×frequency product: r cancels

quantized and packed into a 32-bit key. Three frequency-ratio axes are
the entropy backbone: zone partners cluster a near-constant Δt after
the anchor (peak density ≫ 1/frame), so the Δt axes quantize coarsely
and carry little information — with only TWO ratio axes the key space
measured ~0.15 distinct-per-row over a textured corpus and hot buckets
swallowed the planted pairs at 5k clips (stop-cap recall collapse);
with three it measures ~0.65 distinct-per-row, 99.8% of rows in
buckets ≤ 24, and every planted pair keeps its shared keys. The matching exchange is the
same two-shuffle shape as `audiofp.landmark_dup_pairs`'s sort path
(hash % P inverted index with a stop-hash cap → pair rows → pair-keyed
vote), but the vote histogram runs over the quantized log of the
anchor-frequency RATIO between the two clips — matched quads of a
true speed-changed pair concentrate in one bin, whose center IS the
speed factor estimate; random 32-bit collisions spread across bins.
The ±1-bin jitter merge and the distinct-hash coverage discriminator
are reused verbatim from `audiofp._vote_core` (quantization jitter and
stationary-audio coincidence behave identically here).

≙ reference `image_similar`'s perceptual tolerance axis
(/root/reference/deduplidog/deduplidog.py:737-767 — "same content,
re-encoded/resized") generalized to the time-scale axis of audio;
the reference has no speed-robust matching at all.

SCALE SHAPE: one streaming decode→hash pass (actor pool), then two
keyed exchanges over skinny quad rows — identical partitioning story
to the landmark op: hash-space disjoint across exchange-1 partitions,
pair-key disjoint across exchange-2 partitions, hot hashes capped
(``bucket_cap``) and counted, payloads never shuffled. Quad volume
is ~C(fanout,3)·|peaks| rows/clip ≈ 2-4k at the defaults.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.audio.codecs import CodecError, decode
from deduplidog_ray.pipelines.audiofp import (
    _constellation,
    _pairs_within_segments,
    _stft_logmag,
    _vote_core,
)
from deduplidog_ray.pipelines.audiotransform import fft_resample

STRETCH_PAIR_COLUMNS = [
    "clip_a", "clip_b", "stretch", "votes", "hash_coverage",
]

#: quantization steps (natural-log domain). Peak positions carry ±0.5
#: frame/bin jitter; steps are sized so a true match lands in the same
#: or an adjacent bin at the f_min/min_dt floors (the vote's ±1 merge
#: absorbs adjacent-bin spill on the r axis; the hash axes rely on
#: quad redundancy — a fraction of a clip pair's quads matching is
#: enough, see min_votes).
_SF = 0.06    # q1, q2: log peak-frequency ratio
_ST = 0.17    # q3: log time-span ratio
_STF = 0.12   # q4: log (span × frequency)
_R_STEP = 0.03  # vote axis: log anchor-frequency ratio between clips


def _quads(
    t: np.ndarray,
    f: np.ndarray,
    fanout: int,
    min_dt: int,
    zone_dt: int,
    f_min: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(hash, f_anchor) int64 arrays of scale-invariant quad keys for
    one clip's constellation (t, f sorted by (t, f)). Partners of anchor
    i are the first ``fanout`` peaks at t ≥ t_i + min_dt (a scale-
    invariant selection: peak ORDER survives a speed change); quads
    take partner combinations (j, k, l), in order."""
    from itertools import combinations

    n = len(t)
    if n < 4:
        e = np.empty(0, dtype=np.int64)
        return e, e
    anchor_ok = f >= f_min
    zone_start = np.searchsorted(t, t + min_dt, side="left")
    hashes, fanchors = [], []
    logf = np.log(np.maximum(f, 1).astype(np.float64))
    for p, q, w in combinations(range(fanout), 3):
        i = np.arange(n)
        j = zone_start + p
        k = zone_start + q
        l = zone_start + w
        ok = anchor_ok & (l < n)
        i, j, k, l = i[ok], j[ok], k[ok], l[ok]
        if not len(i):
            continue
        dtj = t[j] - t[i]
        dtl = t[l] - t[i]
        m = (
            (dtl <= zone_dt)
            & (f[j] >= f_min)
            & (f[k] >= f_min)
            & (f[l] >= f_min)
        )
        if not m.any():
            continue
        i, j, k, l = i[m], j[m], k[m], l[m]
        dtj, dtl = dtj[m], dtl[m]
        q1 = np.rint((logf[j] - logf[i]) / _SF).astype(np.int64)
        q2 = np.rint((logf[k] - logf[i]) / _SF).astype(np.int64)
        q5 = np.rint((logf[l] - logf[i]) / _SF).astype(np.int64)
        q3 = np.rint(
            np.log(dtl / np.maximum(dtj, 1).astype(np.float64)) / _ST
        ).astype(np.int64)
        q4 = np.rint(
            (np.log(np.maximum(dtj, 1).astype(np.float64)) + logf[i])
            / _STF
        ).astype(np.int64)
        # q4 ≥ 0 always (dtj ≥ 1, f_i ≥ 1) but its top end is reachable
        # (dt·f up to zone_dt · n_fft/2 ≈ 12k ⇒ q4 up to ~78 at the
        # defaults): SATURATE into the last bin instead of silently
        # dropping — saturation is computed from the scale-invariant
        # quantity, so it is consistent across a true pair (no recall
        # loss), and if the saturated bin ever runs hot it lands in the
        # counted stop-hash cap like any other hot bucket.
        q4 = np.minimum(q4, 63)
        # pack: q1,q2,q5 signed 7-bit | q3 5-bit | q4 6-bit → 32 bits
        # (_vote_core's (pid << 32) | h distinct-hash packing needs
        # h < 2^32; (q1+64) << 25 tops out just under it)
        inr = (
            (np.abs(q1) < 64) & (np.abs(q2) < 64) & (np.abs(q5) < 64)
            & (q3 >= 0) & (q3 < 32)
        )
        if not inr.any():
            continue
        i = i[inr]
        h = (
            ((q1[inr] + 64) << 25)
            | ((q2[inr] + 64) << 18)
            | ((q5[inr] + 64) << 11)
            | (q3[inr] << 6)
            | q4[inr]
        )
        hashes.append(h)
        fanchors.append(f[i])
    if not hashes:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(hashes), np.concatenate(fanchors)


class _StretchHashStage:
    """Actor-pool batch fn: clips table → scale-invariant quad rows
    (hash, clip_id, fa, dur, n_hash); ``dur`` is the decoded
    length in work-rate samples, carried for the duration-consistency
    gate. Decode errors drop the row (quarantine is the flagship's
    job), mirroring `audiofp._LandmarkStage`."""

    def __init__(
        self,
        work_sr: int,
        n_fft: int,
        hop: int,
        peaks_per_frame: int,
        fanout: int,
        min_dt: int,
        zone_dt: int,
        f_min: int,
        id_col: str,
    ) -> None:
        self.work_sr = work_sr
        self.n_fft = n_fft
        self.hop = hop
        self.ppf = peaks_per_frame
        self.fanout = fanout
        self.min_dt = min_dt
        self.zone_dt = zone_dt
        self.f_min = f_min
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        bufs = t["bytes"].to_pylist()
        codecs = t["codec"].to_pylist()
        srs = t["sr_hz"].to_pylist()
        out_h, out_fa, out_id, out_dur, out_nh = [], [], [], [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            try:
                pcm, sr_dec = decode(buf, codec)
            except CodecError:
                continue
            sr = sr_dec or int(sr)
            if sr != self.work_sr:
                pcm = fft_resample(pcm, sr, self.work_sr)
            s = _stft_logmag(pcm, self.n_fft, self.hop)
            tt, ff = _constellation(s, self.ppf)
            h, fa = _quads(
                tt, ff, self.fanout, self.min_dt, self.zone_dt, self.f_min
            )
            if len(h) == 0:
                continue
            out_h.append(h)
            out_fa.append(fa)
            out_id.extend([cid] * len(h))
            out_dur.append(np.full(len(h), len(pcm), dtype=np.int64))
            out_nh.append(
                np.full(len(h), len(np.unique(h)), dtype=np.int64)
            )
        if not out_h:
            return pa.table({
                "hash": pa.array([], type=pa.int64()),
                "clip_id": pa.array([], type=pa.string()),
                "fa": pa.array([], type=pa.int64()),
                "dur": pa.array([], type=pa.int64()),
                "n_hash": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "hash": pa.array(np.concatenate(out_h)),
            "clip_id": pa.array(out_id, type=pa.string()),
            "fa": pa.array(np.concatenate(out_fa)),
            "dur": pa.array(np.concatenate(out_dur)),
            "n_hash": pa.array(np.concatenate(out_nh)),
        })


def _stretch_bucket_pairs(
    g: pd.DataFrame, cap: int, rq_max: int
) -> pd.DataFrame:
    """Exchange-1 partition kernel: same-hash quad rows → pair rows
    (a, b, rq, h, nh_a, nh_b) with a < b and rq = quantized log of the
    anchor-frequency ratio f_a/f_b (a true speed change concentrates a
    pair's rq values in one bin; the bin center estimates the factor).
    Rows with |rq| > ``rq_max`` (an anchor-frequency ratio no in-range
    speed factor can explain) are dropped HERE: coincidental same-key
    pairs spread nearly uniformly over ±79 bins while true pairs live
    within the ±max_stretch window, so this one mask removes ~85% of
    the exchange-2 volume (measured 21M → 3M pair rows at sf0.1) and
    cannot touch a reportable pair."""
    h = g["hash"].to_numpy()
    cid = g["clip_id"].to_numpy()
    fa = g["fa"].to_numpy()
    du = g["dur"].to_numpy()
    nh = g["n_hash"].to_numpy()
    order = np.argsort(h, kind="stable")
    h, cid, fa, du, nh = (
        h[order], cid[order], fa[order], du[order], nh[order]
    )
    n = len(h)
    seg_starts = np.nonzero(np.concatenate([[True], h[1:] != h[:-1]]))[0]
    seg_sizes = np.diff(np.concatenate([seg_starts, [n]]))
    i, j, _stop = _pairs_within_segments(seg_starts, seg_sizes, cap)
    empty = pd.DataFrame({
        "a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
        "rq": pd.Series(dtype="int64"), "h": pd.Series(dtype="int64"),
        "dur_a": pd.Series(dtype="int64"),
        "dur_b": pd.Series(dtype="int64"),
        "nh_a": pd.Series(dtype="int64"), "nh_b": pd.Series(dtype="int64"),
    })
    if len(i) == 0:
        return empty
    ca, cb = cid[i], cid[j]
    same = ca == cb
    i, j, ca, cb = i[~same], j[~same], ca[~same], cb[~same]
    if len(i) == 0:
        return empty
    swap = ca > cb
    aa = np.where(swap, cb, ca)
    bb = np.where(swap, ca, cb)
    fi = np.where(swap, fa[j], fa[i]).astype(np.float64)
    fj = np.where(swap, fa[i], fa[j]).astype(np.float64)
    rq = np.rint(np.log(fi / fj) / _R_STEP).astype(np.int64)
    keep = np.abs(rq) <= rq_max
    i, j, aa, bb, rq = i[keep], j[keep], aa[keep], bb[keep], rq[keep]
    swap = swap[keep]
    if len(i) == 0:
        return empty
    dua = np.where(swap, du[j], du[i])
    dub = np.where(swap, du[i], du[j])
    nha = np.where(swap, nh[j], nh[i])
    nhb = np.where(swap, nh[i], nh[j])
    return pd.DataFrame({
        "a": aa, "b": bb, "rq": rq, "h": h[i],
        "dur_a": dua, "dur_b": dub,
        "nh_a": nha, "nh_b": nhb,
    })


def _stretch_vote_partition(
    g: pd.DataFrame,
    min_votes: int,
    min_hash_coverage: float,
    max_stretch: float,
    dur_tolerance: float,
) -> pd.DataFrame:
    """Exchange-2 partition kernel: pair rows → confirmed stretched-dup
    pairs. The vote histogram runs over rq (quantized log speed factor);
    `_vote_core` supplies the ±1-bin jitter merge and the distinct-hash
    coverage count. ``dur_tolerance`` > 0 additionally requires the
    DURATION ratio to agree with the voted speed factor — for full-clip
    duplicates the two are the same number, for coincidental quad
    matches between distinct clips they are independent, so this one
    comparison removes most of the false-pair cloud (measured: fp 19 →
    ~1 at unchanged recall on the sf0.1 planted corpus). Set 0 to
    disable when hunting stretched EXCERPTS (crop ∘ speed change),
    where the duration ratio is meaningless."""
    if len(g) == 0:
        return pd.DataFrame(columns=STRETCH_PAIR_COLUMNS)
    codes_a, _ = pd.factorize(g["a"], sort=False)
    codes_b, _ = pd.factorize(g["b"], sort=False)
    order, first_idx, win_rq, win_votes, hmatch, _amb = _vote_core(
        codes_a, codes_b, g["rq"].to_numpy(), g["h"].to_numpy()
    )
    sel = order[first_idx]
    ra = g["a"].to_numpy()[sel]
    rb = g["b"].to_numpy()[sel]
    rnha = g["nh_a"].to_numpy()[sel]
    rnhb = g["nh_b"].to_numpy()[sel]
    hcov = hmatch / np.maximum(np.minimum(rnha, rnhb), 1)
    stretch = np.exp(win_rq * _R_STEP)
    ok = (
        (win_votes >= min_votes)
        & (hcov >= min_hash_coverage)
        & (np.abs(win_rq) * _R_STEP <= np.log1p(max_stretch) + _R_STEP / 2)
    )
    if dur_tolerance > 0:
        rda = g["dur_a"].to_numpy()[sel].astype(np.float64)
        rdb = g["dur_b"].to_numpy()[sel].astype(np.float64)
        # b plays `stretch`× slower than a ⇒ dur_b ≈ stretch · dur_a;
        # the voted bin is rq·_R_STEP wide, so allow that plus tolerance
        dur_dev = np.abs(
            np.log(np.maximum(rdb, 1) / np.maximum(rda, 1))
            - win_rq * _R_STEP
        )
        ok &= dur_dev <= dur_tolerance
    return pd.DataFrame({
        "clip_a": ra[ok],
        "clip_b": rb[ok],
        "stretch": np.round(stretch[ok], 4),
        "votes": win_votes[ok],
        "hash_coverage": np.round(hcov[ok], 4),
    })


def stretch_dup_pairs(
    clips: ray.data.Dataset,
    work_sr: int = 8000,
    n_fft: int = 512,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fanout: int = 6,
    min_dt: int = 6,
    zone_dt: int = 48,
    f_min: int = 24,
    bucket_cap: int = 24,
    min_votes: int = 10,
    min_hash_coverage: float = 0.012,
    max_stretch: float = 0.25,
    dur_tolerance: float = 0.05,
    partitions: int = 32,
    id_col: str = "clip_id",
) -> pd.DataFrame:
    """Speed-change-robust duplicate pairs: (clip_a, clip_b, stretch,
    votes, hash_coverage), sorted. ``stretch`` is the estimated factor
    by which clip_b plays SLOWER than clip_a (b ≈ a stretched to
    ``stretch``× its duration; 1.0 = same speed — exact and shifted
    copies are matched too, since every invariant is also
    shift-invariant within a clip)."""
    # +1: the vote's ±1-bin jitter merge may pull a boundary bin's mass
    rq_max = int(np.ceil(np.log1p(max_stretch) / _R_STEP)) + 1
    tr = clips.map_batches(
        _StretchHashStage,
        fn_constructor_kwargs=dict(
            work_sr=work_sr, n_fft=n_fft, hop=hop,
            peaks_per_frame=peaks_per_frame, fanout=fanout,
            min_dt=min_dt, zone_dt=zone_dt, f_min=f_min, id_col=id_col,
        ),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _part1(t: pa.Table) -> pa.Table:
        part = (t["hash"].to_numpy().view(np.uint64)
                % np.uint64(partitions)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    pair_rows = (
        tr.map_batches(_part1, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: _stretch_bucket_pairs(
                g.drop(columns=["part"]), bucket_cap, rq_max
            ),
            batch_format="pandas",
        )
    )

    from deduplidog_ray.stages.hashing import hash_arrow_u64

    def _part2(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("part", pa.array([], type=pa.int64()))
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
            lambda g: _stretch_vote_partition(
                g.drop(columns=["part"]), min_votes,
                min_hash_coverage, max_stretch, dur_tolerance,
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if confirmed.empty:
        return pd.DataFrame(columns=STRETCH_PAIR_COLUMNS)
    return confirmed.sort_values(["clip_a", "clip_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Persistent stretch-quad index: build once, probe with speed-changed
# snippets — the `audioindex` build/probe split applied to the scale-
# invariant fingerprint (a query excerpt at ±12% playback speed still
# finds its source clip). Layout mirrors audioindex: hive buckets by
# hash % P + manifest + per-clip meta; probes touch only the partitions
# their query hashes land in.

_STRETCH_MANIFEST = "manifest.json"
#: bump when the QUAD HASH FUNCTION changes (quantization steps, packing,
#: saturation rules): a probe hashing queries with a different function
#: than the index was built with silently deflates votes instead of
#: erroring — the manifest pins the function version so the mismatch is
#: loud. v2: q4 saturates into the top bin (was: silently dropped).
_STRETCH_FP_VERSION = 2
_STRETCH_PARAMS = (
    "work_sr", "n_fft", "hop", "peaks_per_frame", "fanout", "min_dt",
    "zone_dt", "f_min",
)

STRETCH_SEARCH_COLUMNS = [
    "query_id", "clip_id", "stretch", "votes", "rank",
]


def build_stretch_index(
    corpus: ray.data.Dataset,
    index_dir: str,
    work_sr: int = 8000,
    n_fft: int = 512,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fanout: int = 6,
    min_dt: int = 6,
    zone_dt: int = 48,
    f_min: int = 24,
    partitions: int = 32,
    id_col: str = "clip_id",
) -> str:
    """Hash the corpus once into a probe-ready quad index; returns
    ``index_dir``. Probes MUST hash queries with the manifest params."""
    import json
    import os

    params = dict(
        work_sr=work_sr, n_fft=n_fft, hop=hop,
        peaks_per_frame=peaks_per_frame, fanout=fanout, min_dt=min_dt,
        zone_dt=zone_dt, f_min=f_min,
    )
    rows = corpus.map_batches(
        _StretchHashStage,
        fn_constructor_kwargs=dict(**params, id_col=id_col),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _part(t: pa.Table) -> pa.Table:
        part = (t["hash"].to_numpy().view(np.uint64)
                % np.uint64(partitions)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    os.makedirs(index_dir, exist_ok=True)
    rows.map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["hash", "clip_id", "fa", "n_hash", "part"]).write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["part"]
    )

    # per-clip meta (n_hash is a per-clip constant column): one distinct
    # pass, |clips|-bounded
    def _meta(t: pa.Table) -> pa.Table:
        return t.select(["clip_id", "n_hash"]).group_by(
            ["clip_id", "n_hash"]
        ).aggregate([])

    import pyarrow.parquet as pq

    meta = (
        rows.map_batches(_meta, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .drop_duplicates("clip_id")
        .sort_values("clip_id")
    )
    pq.write_table(
        pa.Table.from_pandas(meta, preserve_index=False),
        os.path.join(index_dir, "meta.parquet"),
    )
    with open(os.path.join(index_dir, _STRETCH_MANIFEST), "w") as f:
        json.dump({**params, "partitions": partitions,
                   "fp_version": _STRETCH_FP_VERSION}, f)
    return index_dir


@ray.remote
def _probe_stretch_bucket(
    d: str, qh: np.ndarray, qfa: np.ndarray, qi: np.ndarray, index_cap: int
) -> tuple:
    """Match one query sub-batch against one bucket partition: returns
    (query row idx, corpus clip id, rq, hash) cross rows; per-hash
    segments larger than ``index_cap`` are stop hashes."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(d, "*.parquet"))
    e = np.empty(0, np.int64)
    if not files:
        return e, e, e, e
    t = pa.concat_tables(
        [pq.read_table(f, columns=["hash", "clip_id", "fa"])
         for f in files]
    )
    h = t["hash"].to_numpy()
    cid = np.asarray(t["clip_id"].to_pylist(), dtype=object)
    fa = t["fa"].to_numpy()
    order = np.argsort(h, kind="stable")
    h, cid, fa = h[order], cid[order], fa[order]
    starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(h)])
    seg_h = h[starts]
    pos = np.searchsorted(seg_h, qh)
    ok = pos < len(seg_h)
    ok[ok] &= seg_h[pos[ok]] == qh[ok]
    s = pos[ok]
    keep = sizes[s] <= index_cap
    s = s[keep]
    q_keep = np.nonzero(ok)[0][keep]
    m = sizes[s]
    if not len(s) or m.sum() == 0:
        return e, e, e, e
    total = int(m.sum())
    base = np.repeat(starts[s], m)
    excl = np.repeat(np.cumsum(m) - m, m)
    idx = base + (np.arange(total) - excl)
    q_rep = np.repeat(q_keep, m)
    rq = np.rint(
        np.log(fa[idx].astype(np.float64)
               / np.maximum(qfa[q_rep], 1).astype(np.float64)) / _R_STEP
    ).astype(np.int64)
    return qi[q_rep], cid[idx], rq, h[idx]


def search_stretch_index(
    index_dir: str,
    queries: ray.data.Dataset,
    top_k: int = 3,
    min_votes: int = 14,
    min_hash_coverage: float = 0.01,
    max_stretch: float = 0.25,
    index_cap: int = 64,
    id_col: str = "clip_id",
) -> pd.DataFrame:
    """Probe the index with (possibly speed-changed, possibly excerpt)
    query snippets: per query the matching corpus clips and the
    estimated speed factor of the corpus clip relative to the query —
    (query_id, clip_id, stretch, votes, rank). Coverage gates apply to
    the QUERY side (the snippet is the short side). The serving default
    ``min_votes=14`` is precision-leaning: on a hostile probe set (40%
    crops at 1.05× against a 5k-clip index) wrong rank-1 answers sit at
    ~13 votes median while right ones sit at ~44 — lower it to trade
    short-snippet recall for answer precision."""
    import json
    import os

    with open(os.path.join(index_dir, _STRETCH_MANIFEST)) as f:
        man = json.load(f)
    if int(man.get("fp_version", 1)) != _STRETCH_FP_VERSION:
        raise RuntimeError(
            f"stretch index at {index_dir} was built with quad-hash "
            f"version {man.get('fp_version', 1)}, this code probes with "
            f"version {_STRETCH_FP_VERSION} — rebuild the index "
            "(hash functions must match or votes silently deflate)"
        )
    params = {k: man[k] for k in _STRETCH_PARAMS}
    partitions = int(man["partitions"])

    q = queries.map_batches(
        _StretchHashStage,
        fn_constructor_kwargs=dict(**params, id_col=id_col),
        concurrency=(1, 8),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    if not len(q):
        return pd.DataFrame(columns=STRETCH_SEARCH_COLUMNS)
    qids, qcodes = np.unique(q["clip_id"].to_numpy(), return_inverse=True)
    qh = q["hash"].to_numpy()
    qfa = q["fa"].to_numpy()
    qmeta = (
        q.drop_duplicates("clip_id").set_index("clip_id")["n_hash"]
        .reindex(qids).to_numpy()
    )

    part = (qh.view(np.uint64) % np.uint64(partitions)).astype(np.int64)
    futs = []
    for p in np.unique(part):
        sel = part == p
        futs.append(_probe_stretch_bucket.remote(
            os.path.join(index_dir, "buckets", f"part={p}"),
            qh[sel], qfa[sel], qcodes[sel].astype(np.int64), index_cap,
        ))
    outs = ray.get(futs)
    qi = np.concatenate([o[0] for o in outs])
    if not len(qi):
        return pd.DataFrame(columns=STRETCH_SEARCH_COLUMNS)
    cid = np.concatenate([o[1] for o in outs])
    rq = np.concatenate([o[2] for o in outs])
    hh = np.concatenate([o[3] for o in outs])

    ucid, ccodes = np.unique(cid, return_inverse=True)
    order, first_idx, win_rq, win_votes, hmatch, _amb = _vote_core(
        qi, ccodes.astype(np.int64), rq, hh
    )
    sel = order[first_idx]
    r_qi, r_cc = qi[sel], ccodes[sel]
    qhcov = hmatch / np.maximum(qmeta[r_qi], 1)
    ok = (
        (win_votes >= min_votes)
        & (qhcov >= min_hash_coverage)
        & (np.abs(win_rq) * _R_STEP <= np.log1p(max_stretch) + _R_STEP / 2)
    )
    out = pd.DataFrame({
        "query_id": qids[r_qi[ok]],
        "clip_id": ucid[r_cc[ok]],
        "stretch": np.round(np.exp(win_rq[ok] * _R_STEP), 4),
        "votes": win_votes[ok].astype(np.int64),
    })
    out = out.sort_values(
        ["query_id", "votes", "clip_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    out = out[out["rank"] <= top_k]
    return out[STRETCH_SEARCH_COLUMNS].reset_index(drop=True)
