"""Time-shift-robust audio duplicate detection: find clips that are the
SAME recording at a different offset (lead-in silence, re-aired content,
a trimmed head) and report the alignment.

The flagship's exact axes (content/pcm hash) and fingerprint gates are
shift-sensitive by design; the spectral embedding
(stages/embed.py:AudioEmbedder, mean‖std pooling over frames) is largely
shift-INVARIANT for stationary content — so it is the natural candidate
generator for shifted copies. This module adds the confirming kernel the
embedding cannot provide: a normalized FFT cross-correlation whose peak
location IS the offset and whose peak height separates "same recording,
shifted" from "similar-sounding but different".

≙ the reference's tolerance predicates (date window tolerate_hour,
accepted_frame_delta — deduplidog.py:144-145, :728-756) taken to the
payload domain: tolerate a bounded SHIFT of identical content.

EXECUTION SHAPE:

- Candidates come from `similarity.audio_embedding_near_dup` — banded
  hyperplane LSH over the embedded table, pairs-bounded output; the
  corpus is never all-pairs scanned.
- Pair members' payloads are fetched in ONE streaming `pc.is_in` pass
  over the clips table (members ≤ 2·|pairs| rows — the same
  pairs-bounded store rule as the flagship's verify exchange) and
  `ray.put` once; verify tasks read the store zero-copy and
  cross-correlate pair chunks in parallel.
- Each verify is O((n+m) log) via rfft; offsets are searched only
  within ±``max_shift_ms`` of the peak window.

No SQL oracle is possible (payload decode + FFT); the parity gates are
tests/test_audioalign.py: planted delays recovered to frame accuracy,
re-encoded+delayed copies confirmed, distinct clips rejected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from deduplidog_ray.audio.codecs import CodecError, decode
from deduplidog_ray.pipelines.audiotransform import fft_resample

#: verify work unit: pairs per remote task
_PAIR_CHUNK = 512

#: per-task cap on cached forward FFTs (each ~nfft/2 complex128; 256
#: entries at nfft=32768 is ~67 MB — bounded regardless of chunk shape)
_FFT_CACHE_MAX = 256


def _xcorr_peak(
    x: np.ndarray, y: np.ndarray, max_lag: int
) -> tuple[int, float]:
    """(lag, corr) of the peak of the normalized cross-correlation of x
    and y within |lag| <= max_lag. Positive lag: y is DELAYED vs x.
    Normalization is by global energies (||x||·||y||) — a pure silence
    pad costs nothing, so a delayed identical copy peaks near 1.0."""
    # nfft must cover n + max_lag, not just n: with nfft in
    # [n, len(y)+max_lag), a true peak at an out-of-window positive lag
    # k reads back through (k - nfft) % nfft as a bogus NEGATIVE lag
    # inside the search window (and mirrored for long-x negative lags)
    n = len(x) + len(y) - 1
    nfft = 1 << int(np.ceil(np.log2(max(n + max_lag, 2))))
    X = np.fft.rfft(x, nfft)
    Y = np.fft.rfft(y, nfft)
    r = np.fft.irfft(np.conj(X) * Y, nfft)
    # lag k (y delayed by k) lives at r[k]; negative lags wrap at nfft-k
    lags = np.arange(-max_lag, max_lag + 1)
    vals = r[lags % nfft]
    denom = float(np.sqrt((x * x).sum()) * np.sqrt((y * y).sum()))
    if denom == 0.0:
        return 0, 0.0
    i = int(np.argmax(vals))
    return int(lags[i]), float(vals[i] / denom)


def _verify_pairs(
    store: dict, pairs: list, sr: int, max_shift_ms: int,
    corr_threshold: float,
) -> list:
    max_lag = sr * max_shift_ms // 1000
    out = []
    cache: dict[str, np.ndarray] = {}
    csq: dict[str, np.ndarray] = {}
    ffts: dict[tuple[str, int], np.ndarray] = {}

    def _rfft(cid: str, p: np.ndarray, nfft: int) -> np.ndarray:
        """Forward FFT memoized per (clip, nfft): the pair list is sorted,
        so one clip's pairs are adjacent and its transform is reused
        across them instead of recomputed per pair (the FFTs are ~2/3 of
        the xcorr cost). FIFO-bounded so a pathological chunk cannot
        hold one transform per member."""
        key = (cid, nfft)
        r = ffts.get(key)
        if r is None:
            if len(ffts) >= _FFT_CACHE_MAX:
                ffts.pop(next(iter(ffts)))
            r = np.fft.rfft(p, nfft)
            ffts[key] = r
        return r

    def _prefix(cid: str, p: np.ndarray) -> np.ndarray:
        c = csq.get(cid)
        if c is None:
            c = np.concatenate(([0.0], np.cumsum(p * p)))
            csq[cid] = c
        return c

    def _pcm(cid: str) -> np.ndarray | None:
        if cid not in cache:
            buf, codec, sr_in = store[cid]
            try:
                p, sr0 = decode(buf, codec)
            except CodecError:
                cache[cid] = None
                return None
            p = np.asarray(p, dtype=np.float64)
            if sr0 != sr:
                p = fft_resample(p, sr0, sr)
            cache[cid] = p
        return cache[cid]

    for a, b in pairs:
        xa, xb = _pcm(a), _pcm(b)
        if xa is None or xb is None or not len(xa) or not len(xb):
            continue
        # Energy-window pre-gate, sound by Cauchy-Schwarz: at any single
        # lag the overlap covers at most len(shorter) samples of the
        # longer clip, so the xcorr numerator is <= sqrt(E_short) *
        # sqrt(max length-len(shorter) window energy of the longer), and
        # corr <= sqrt(Ewin_max / E_long). A pure duration-ratio gate is
        # NOT sound here (a silence pad adds duration but no energy and
        # _xcorr_peak normalizes by global energy), so the bound uses
        # decoded energies: one cached cumsum per clip, one O(n) slice
        # max per pair — far cheaper than the padded FFTs it skips.
        if len(xa) != len(xb):
            if len(xa) < len(xb):
                w, l_id, xl = len(xa), b, xb
            else:
                w, l_id, xl = len(xb), a, xa
            c = _prefix(l_id, xl)
            e_l = c[-1]
            ewin = float(np.max(c[w:] - c[:-w]))
            # 0.995 margin absorbs FFT/cumsum float rounding
            if e_l > 0.0 and ewin < (corr_threshold * 0.995) ** 2 * e_l:
                continue
        # same math as _xcorr_peak, with the two forward FFTs memoized
        # per clip (see _rfft); nfft covers n + max_lag for the same
        # wraparound reason documented there
        n = len(xa) + len(xb) - 1
        nfft = 1 << int(np.ceil(np.log2(max(n + max_lag, 2))))
        ca, cb = _prefix(a, xa), _prefix(b, xb)
        denom = float(np.sqrt(ca[-1]) * np.sqrt(cb[-1]))
        if denom == 0.0:
            continue
        r = np.fft.irfft(np.conj(_rfft(a, xa, nfft)) * _rfft(b, xb, nfft),
                         nfft)
        lags = np.arange(-max_lag, max_lag + 1)
        vals = r[lags % nfft]
        i = int(np.argmax(vals))
        lag, corr = int(lags[i]), float(vals[i] / denom)
        if corr >= corr_threshold:
            out.append((a, b, int(round(1000 * lag / sr)), corr))
    return out


@ray.remote
def _verify_chunk_blocks(
    refs: list, pairs: list, sr: int, max_shift_ms: int,
    corr_threshold: float, id_col: str,
) -> list:
    """Verify one pair chunk against payload BLOCKS in plasma: ``refs``
    are ObjectRefs to the (member-filtered) payload tables this chunk's
    members live in — ray.get maps them zero-copy from shared memory on
    a node (at most one transfer per node on a cluster), so payload
    bytes never route through the driver or a per-task pickled dict."""
    tables = [t for t in ray.get(list(refs)) if len(t)]
    members = {cid for p in pairs for cid in p}
    store: dict = {}
    for t in tables:
        ids = t[id_col].to_pylist()
        hit = [ri for ri, cid in enumerate(ids) if cid in members]
        for ri in hit:
            store[ids[ri]] = (
                t["bytes"][ri].as_py(), t["codec"][ri].as_py(),
                int(t["sr_hz"][ri].as_py()),
            )
    return _verify_pairs(store, pairs, sr, max_shift_ms, corr_threshold)


def shifted_dup_pairs(
    clips: ray.data.Dataset,
    embed_threshold: float = 0.98,
    corr_threshold: float = 0.85,
    max_shift_ms: int = 1000,
    work_sr: int = 16000,
    id_col: str = "clip_id",
) -> pd.DataFrame:
    """Shift-tolerant duplicate pairs with alignment:
    (clip_a, clip_b, offset_ms, corr). Positive offset: clip_b is the
    delayed side. See module docstring for the exchange shape."""
    from deduplidog_ray.pipelines.similarity import audio_embedding_near_dup

    # Candidates embed the TRIMMED audio: a lead-in pad dilutes mean‖std
    # pooling roughly linearly in the pad fraction (measured: a 480 ms
    # pad on a 1.5 s clip fell below cos 0.97), so trimming first makes
    # the candidate key shift-invariant BY CONSTRUCTION instead of by
    # threshold slack. The trim is FUSED into the embed actor
    # (trim_threshold): one decode per clip instead of the old
    # decode→trim→re-encode→decode→embed double codec pass, and no
    # trimmed payload ever enters the object store. Verification still
    # runs on the ORIGINAL payloads — the offset reported is the true
    # one, not the trimmed one.
    cand = audio_embedding_near_dup(
        clips, threshold=embed_threshold, id_col=id_col,
        trim_threshold=0.01,
    )
    if not len(cand):
        return pd.DataFrame(columns=["clip_a", "clip_b", "offset_ms",
                                     "corr"])
    members = sorted(set(cand["clip_a"]) | set(cand["clip_b"]))
    member_arr = pa.array(members, type=pa.string())

    def _fetch(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[id_col], value_set=member_arr)
        return t.filter(keep).select([id_col, "bytes", "codec", "sr_hz"])

    # Member payloads stay IN PLASMA as the materialized blocks of the
    # filtered scan — never ``take_all()``'d to the driver (when the
    # candidate graph covers most of the corpus, as it does on a
    # near-stationary corpus, "members ≤ 2·|pairs|" is no bound at all:
    # the old driver pull concentrated ~the whole payload table in one
    # process, then re-shipped it as pickled per-chunk dicts). Each
    # verify task ray.gets only the blocks its own pairs live in —
    # zero-copy on a node, at most one transfer per node on a cluster.
    mat = clips.map_batches(
        _fetch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    blocks = mat.to_arrow_refs()

    @ray.remote
    def _block_ids(t: pa.Table) -> list:
        # Ray Data may emit a zero-row bundle with an EMPTY schema for an
        # empty upstream split (executor warns "different schema than the
        # previous one"); guard by length before touching any column.
        return t[id_col].to_pylist() if len(t) else []

    block_of: dict = {}
    for bi, ids in enumerate(ray.get([_block_ids.remote(b) for b in blocks])):
        for cid in ids:
            block_of[cid] = bi
    # Sorting pairs groups shared members into the same chunk, so each
    # task maps few blocks.
    pair_list = sorted(zip(cand["clip_a"], cand["clip_b"]))
    futs = []
    for i in range(0, len(pair_list), _PAIR_CHUNK):
        chunk = pair_list[i:i + _PAIR_CHUNK]
        need = sorted({
            block_of[cid] for p in chunk for cid in p if cid in block_of
        })
        futs.append(_verify_chunk_blocks.remote(
            [blocks[b] for b in need], chunk, work_sr, max_shift_ms,
            corr_threshold, id_col,
        ))
    confirmed = [row for chunk in ray.get(futs) for row in chunk]
    return pd.DataFrame(
        confirmed, columns=["clip_a", "clip_b", "offset_ms", "corr"]
    ).sort_values(["clip_a", "clip_b"]).reset_index(drop=True)
