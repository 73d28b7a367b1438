"""Audio transform operators: resample, peak-normalize, silence-trim.

The payload-side TRANSFORM family for a trillion-clip audio corpus —
``audiostats`` reads the payload, these rewrite it. A training pipeline
runs exactly these before featurization: unify sample rates, normalize
levels, drop lead/tail silence. All three share one execution shape:

- an actor-pool ``map_batches`` stage (codec dispatch table built once
  per actor in ``__init__``), decode → transform (pure numpy, float64)
  → re-encode **in the clip's own codec**, stream out the rewritten row
  with recomputed ``sr_hz`` / ``dur_ms`` — schema identical to the input
  clips table, so stages compose (resample → normalize → dedup) without
  adapters;
- decode errors never poison the batch: the row passes through unchanged
  with a ``transform_error`` note (same quarantine philosophy as the
  flagship's decode stage, stages/decode.py).

Resampling is FFT-domain (rfft → spectrum truncate/zero-pad → irfft):
for band-limited content this is the ideal-low-pass resampler — exact up
to float rounding on upsample, ideal anti-alias on downsample — and it's
a handful of vectorized numpy kernels per clip, no convolution loops.
Amplitude is preserved by 1/n normalization symmetry (scale = new_n/n);
the shared Nyquist bin on even-length downsamples is halved, the exact
Hermitian-symmetry bookkeeping that keeps Parseval energy equality.

≙ reference ST1's media preprocessing hook (helpers.py:43-53 preloads
and normalizes images before hashing); the audio analog is
rate-normalize + level-normalize before fingerprinting, which is exactly
what ``DedupConfig``-driven pipelines do with these stages.

No SQL oracle is possible (DuckDB cannot decode RIFF/µ-law payloads);
the parity gates are pytest SNR/energy invariants
(tests/test_audiotransform.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from deduplidog_ray.audio.codecs import CodecError, decode, encode
from deduplidog_ray.stages.decode import _buffer_views

def fft_resample(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Ideal band-limited resample of a 1-D float signal (float64 math)."""
    n = len(pcm)
    if sr_from == sr_to or n == 0:
        return pcm.astype(np.float64)
    m = max(1, int(round(n * sr_to / sr_from)))
    spec = np.fft.rfft(pcm.astype(np.float64))
    k_out = m // 2 + 1
    out = np.zeros(k_out, dtype=np.complex128)
    k = min(len(spec), k_out)
    out[:k] = spec[:k]
    if m < n:
        if m % 2 == 0 and k_out <= len(spec):
            # downsample landing on an even length: the new Nyquist bin
            # FOLDS the source's +f and -f bins (conjugates), so it sums
            # to 2*Re(X[m/2]) — writing Re(X) alone halved fold-frequency
            # content vs exact decimation (scipy.signal.resample rule)
            out[-1] = 2.0 * spec[k_out - 1].real
    elif n % 2 == 0:
        # upsample from an even length: the source Nyquist bin carried
        # BOTH half-spectrum copies; in the wider spectrum that position
        # is an ordinary bin, so it must split in half or its component
        # doubles in amplitude
        out[len(spec) - 1] = spec[-1] * 0.5
    x = np.fft.irfft(out, n=m) * (m / n)
    return x


class _Transform:
    """Shared skeleton: decode in the row's codec, call ``_apply`` on
    float64 PCM, re-encode in the same codec, recompute sr/dur."""

    def __init__(self) -> None:
        pass

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        byts = batch["bytes"]
        buf = byts.combine_chunks() if isinstance(byts, pa.ChunkedArray) else byts
        bufs = _buffer_views(buf)
        codecs = batch["codec"].to_pylist()
        out_bytes: list[bytes | None] = [None] * n
        out_sr = np.zeros(n, dtype=np.int32)
        out_dur = np.zeros(n, dtype=np.int32)
        errors: list[str | None] = [None] * n
        # one clip's decoded PCM is alive per iteration (rebound each
        # pass) — that is the heap bound; no chunk tier needed
        for i in range(n):
            v = bufs[i]
            try:
                if v is None or len(v) == 0:
                    raise CodecError("empty bytes")
                pcm, sr = decode(v, codecs[i])
                y, sr2 = self._apply(np.asarray(pcm, dtype=np.float64), sr)
                y = np.clip(y, -1.0, 1.0).astype(np.float32)
                out_bytes[i] = encode(y, sr2, codecs[i])
                out_sr[i] = sr2
                out_dur[i] = int(round(1000 * len(y) / max(sr2, 1)))
            except CodecError as e:
                # pass the original row through, annotated — never
                # poison the batch
                out_bytes[i] = bytes(v) if v is not None else b""
                errors[i] = str(e)
        cols = {name: batch[name] for name in batch.column_names}
        cols["bytes"] = pa.array(out_bytes, type=pa.binary())
        # error rows keep their original sr/dur
        if "sr_hz" in cols:
            old_sr = batch["sr_hz"].to_numpy(zero_copy_only=False)
            keep = np.array([e is not None for e in errors])
            out_sr = np.where(keep, old_sr, out_sr)
        if "dur_ms" in cols:
            old_dur = batch["dur_ms"].to_numpy(zero_copy_only=False)
            keep = np.array([e is not None for e in errors])
            out_dur = np.where(keep, old_dur, out_dur)
        cols["sr_hz"] = pa.array(out_sr.astype(np.int32))
        cols["dur_ms"] = pa.array(out_dur.astype(np.int32))
        cols["transform_error"] = pa.array(errors, type=pa.string())
        return pa.table(cols)


class Resample(_Transform):
    def __init__(self, target_sr: int = 16000) -> None:
        super().__init__()
        self.target_sr = int(target_sr)

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        return fft_resample(pcm, sr, self.target_sr), self.target_sr


class PeakNormalize(_Transform):
    def __init__(self, target_peak: float = 0.9) -> None:
        super().__init__()
        self.target_peak = float(target_peak)

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        peak = float(np.max(np.abs(pcm))) if len(pcm) else 0.0
        if peak > 0:
            pcm = pcm * (self.target_peak / peak)
        return pcm, sr


class Delay(_Transform):
    """Prepend ``delay_ms`` of silence (augmentation / alignment-test
    fixture): the payload content is unchanged, only shifted — exactly
    the transformation `audioalign.shifted_dup_pairs` must see through."""

    def __init__(self, delay_ms: int = 100) -> None:
        super().__init__()
        self.delay_ms = int(delay_ms)

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        pad = np.zeros(sr * self.delay_ms // 1000, dtype=pcm.dtype)
        return np.concatenate([pad, pcm]), sr


class Crop(_Transform):
    """Keep ``[start_frac, start_frac + dur_frac)`` of each clip
    (fractions of its length) — the excerpt / containment-test fixture:
    the cropped payload is a strict sub-segment of the original, which
    `audiofp.landmark_dup_pairs` must localize inside its container."""

    def __init__(self, start_frac: float = 0.25, dur_frac: float = 0.5) -> None:
        super().__init__()
        self.start_frac = float(start_frac)
        self.dur_frac = float(dur_frac)

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        n = len(pcm)
        s = int(n * self.start_frac)
        e = min(n, s + max(1, int(n * self.dur_frac)))
        return pcm[s:e], sr


class Stretch(_Transform):
    """Playback-speed change by ``rate``: band-limited resample to
    ``rate``× the length, kept at the SAME nominal sample rate — so
    duration scales by ``rate`` and every frequency by 1/``rate``
    (vinyl/tape speed, 44.1k↔48k mislabels, podcast speed-ups). The
    transformation `audiostretch.stretch_dup_pairs` must see through;
    a LANDMARK hash (audiofp) breaks under it by design."""

    def __init__(self, rate: float = 1.05) -> None:
        super().__init__()
        self.rate = float(rate)

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        return fft_resample(pcm, sr, max(1, int(round(sr * self.rate)))), sr


class TrimSilence(_Transform):
    """Drop leading/trailing frames whose RMS is below ``threshold``
    (frame = ``frame_ms`` of samples); interior silence is kept."""

    def __init__(self, threshold: float = 0.01, frame_ms: int = 20) -> None:
        super().__init__()
        self.threshold = float(threshold)
        self.frame_ms = int(frame_ms)

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        f = max(1, sr * self.frame_ms // 1000)
        nfr = len(pcm) // f
        if nfr == 0:
            return pcm, sr
        frames = pcm[: nfr * f].reshape(nfr, f)
        rms = np.sqrt((frames * frames).mean(axis=1))
        act = np.nonzero(rms >= self.threshold)[0]
        if len(act) == 0:
            return pcm[:0], sr            # all-silent clip → empty
        lo = act[0] * f
        hi = min(len(pcm), (act[-1] + 1) * f)
        # a loud tail shorter than one frame survives via the remainder
        if (act[-1] + 1) == nfr and len(pcm) % f:
            tail = pcm[nfr * f:]
            if np.sqrt((tail * tail).mean()) >= self.threshold:
                hi = len(pcm)
        return pcm[lo:hi], sr


class Chain(_Transform):
    """Fused transform chain: decode ONCE, apply every step's ``_apply``
    in order on the float PCM, re-encode ONCE. Composing stages as
    separate ``map_batches`` calls costs a decode+encode per stage; at
    audio-corpus scale the codec work dominates, so fusion is the
    difference between N and 1 payload round-trips. ``steps`` is a list
    of (TransformClass, kwargs) — same classes as the standalone stages.
    """

    def __init__(self, steps) -> None:
        super().__init__()
        self.steps = [cls(**kw) for cls, kw in steps]

    def _apply(self, pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        for step in self.steps:
            pcm, sr = step._apply(pcm, sr)
        return pcm, sr


def transform_clips(ds: ray.data.Dataset, steps,
                    concurrency: int = 32,
                    batch_size: int = 128) -> ray.data.Dataset:
    """Apply a fused transform chain (one decode / one encode per clip).

    ``steps``: list of (TransformClass, kwargs), e.g.
    ``[(Resample, {"target_sr": 16000}), (PeakNormalize, {})]``.
    """
    return ds.map_batches(
        Chain,
        fn_constructor_kwargs={"steps": steps},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )


def _stage(cls_args, ds: ray.data.Dataset, concurrency: int,
           batch_size: int) -> ray.data.Dataset:
    cls, kwargs = cls_args
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )


def resample_clips(ds: ray.data.Dataset, target_sr: int = 16000,
                   concurrency: int = 8,
                   batch_size: int = 256) -> ray.data.Dataset:
    """Rewrite every clip at ``target_sr`` (ideal FFT resampler)."""
    return _stage((Resample, {"target_sr": target_sr}), ds,
                  concurrency, batch_size)


def normalize_clips(ds: ray.data.Dataset, target_peak: float = 0.9,
                    concurrency: int = 8,
                    batch_size: int = 256) -> ray.data.Dataset:
    """Peak-normalize every clip to ``target_peak`` full scale."""
    return _stage((PeakNormalize, {"target_peak": target_peak}), ds,
                  concurrency, batch_size)


def trim_silence_clips(ds: ray.data.Dataset, threshold: float = 0.01,
                       frame_ms: int = 20, concurrency: int = 8,
                       batch_size: int = 256) -> ray.data.Dataset:
    """Strip leading/trailing sub-threshold frames from every clip."""
    return _stage(
        (TrimSilence, {"threshold": threshold, "frame_ms": frame_ms}),
        ds, concurrency, batch_size,
    )


class SegmentClips:
    """Energy-based clip segmentation (flat-map shape): split each clip
    into its active (non-silent) regions and emit ONE ROW PER SEGMENT —
    the VAD-shaped preprocessing an ASR/embedding pipeline runs so
    downstream windows hold speech, not dead air. `TrimSilence` removes
    only lead/tail; this cuts interior silence into row boundaries.

    Per clip: frame RMS (``frame_ms``) → active mask ≥ ``threshold`` →
    gaps ≤ ``max_gap_ms`` bridged (vectorized run-length pass, no Python
    per-frame loop) → runs shorter than ``min_seg_ms`` dropped → each
    surviving run re-encoded IN THE CLIP'S OWN CODEC with recomputed
    sr/dur plus ``seg_idx`` (0-based) and ``start_ms``. Schema stays a
    clips table (+2 columns), so segments feed any downstream stage —
    including the flagship dedup — unchanged. Decode errors quarantine
    as a single ``seg_idx = -1`` passthrough row (`transform_error`
    set), same philosophy as `_Transform`.

    Actor-pool stage: codec dispatch + parameters live once per actor;
    one clip's decoded PCM is alive at a time (rebound per row).
    """

    def __init__(self, threshold: float = 0.01, frame_ms: int = 20,
                 max_gap_ms: int = 200, min_seg_ms: int = 100) -> None:
        self.threshold = float(threshold)
        self.frame_ms = int(frame_ms)
        self.max_gap_frames = max(0, int(max_gap_ms) // int(frame_ms))
        self.min_seg_frames = max(1, int(min_seg_ms) // int(frame_ms))

    def _segments(self, pcm: np.ndarray, sr: int) -> list[tuple[int, int]]:
        f = max(1, sr * self.frame_ms // 1000)
        nfr = len(pcm) // f
        tail = pcm[nfr * f:]
        tail_loud = len(tail) > 0 and \
            float(np.sqrt((tail * tail).mean())) >= self.threshold
        min_samples = self.min_seg_frames * f
        if nfr == 0:
            return [(0, len(pcm))] \
                if tail_loud and len(pcm) >= min_samples else []
        frames = pcm[: nfr * f].reshape(nfr, f)
        act = np.sqrt((frames * frames).mean(axis=1)) >= self.threshold
        if act.any():
            # bridge INTERIOR inactive runs <= max_gap (run-length pass)
            edges = np.flatnonzero(np.r_[True, act[1:] != act[:-1]])
            lens = np.diff(np.r_[edges, nfr])
            vals = act[edges].copy()
            bridge = (~vals) & (lens <= self.max_gap_frames) \
                & (edges > 0) & (edges + lens < nfr)
            vals[bridge] = True
            act = np.repeat(vals, lens)
        if not act.any():
            # lone loud tail: same min-length rule as every segment
            return [(nfr * f, len(pcm))] \
                if tail_loud and (len(pcm) - nfr * f) >= min_samples else []
        # emit active runs of the final mask
        e2 = np.flatnonzero(np.r_[True, act[1:] != act[:-1]])
        l2 = np.diff(np.r_[e2, nfr])
        v2 = act[e2]
        out: list[tuple[int, int]] = []
        for s, ln, v in zip(e2, l2, v2):
            if not v:
                continue
            lo, hi = int(s) * f, int(s + ln) * f
            if s + ln == nfr and tail_loud:
                hi = len(pcm)          # ragged loud tail joins last run
            if hi - lo >= min_samples:
                out.append((lo, min(hi, len(pcm))))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        byts = batch["bytes"]
        buf = byts.combine_chunks() if isinstance(byts, pa.ChunkedArray) \
            else byts
        bufs = _buffer_views(buf)
        codecs = batch["codec"].to_pylist()
        clip_ids = batch["clip_id"].to_pylist()
        rows: dict[str, list] = {
            "clip_id": [], "seg_idx": [], "start_ms": [], "bytes": [],
            "sr_hz": [], "dur_ms": [], "codec": [], "transform_error": [],
        }
        for i in range(len(batch)):
            v = bufs[i]
            try:
                if v is None or len(v) == 0:
                    raise CodecError("empty bytes")
                pcm, sr = decode(v, codecs[i])
                pcm = np.asarray(pcm, dtype=np.float64)
                for k, (lo, hi) in enumerate(self._segments(pcm, sr)):
                    seg = np.clip(pcm[lo:hi], -1.0, 1.0).astype(np.float32)
                    rows["clip_id"].append(clip_ids[i])
                    rows["seg_idx"].append(k)
                    rows["start_ms"].append(int(round(1000 * lo / sr)))
                    rows["bytes"].append(encode(seg, sr, codecs[i]))
                    rows["sr_hz"].append(sr)
                    rows["dur_ms"].append(int(round(1000 * len(seg) / sr)))
                    rows["codec"].append(codecs[i])
                    rows["transform_error"].append(None)
            except CodecError as e:
                rows["clip_id"].append(clip_ids[i])
                rows["seg_idx"].append(-1)
                rows["start_ms"].append(0)
                rows["bytes"].append(bytes(v) if v is not None else b"")
                rows["sr_hz"].append(0)
                rows["dur_ms"].append(0)
                rows["codec"].append(codecs[i])
                rows["transform_error"].append(str(e))
        return pa.table({
            "clip_id": pa.array(rows["clip_id"], type=pa.string()),
            "seg_idx": pa.array(rows["seg_idx"], type=pa.int32()),
            "start_ms": pa.array(rows["start_ms"], type=pa.int32()),
            "bytes": pa.array(rows["bytes"], type=pa.binary()),
            "sr_hz": pa.array(rows["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(rows["dur_ms"], type=pa.int32()),
            "codec": pa.array(rows["codec"], type=pa.string()),
            "transform_error": pa.array(rows["transform_error"],
                                        type=pa.string()),
        })


def segment_clips(ds: ray.data.Dataset, threshold: float = 0.01,
                  frame_ms: int = 20, max_gap_ms: int = 200,
                  min_seg_ms: int = 100, concurrency: int = 32,
                  batch_size: int = 128) -> ray.data.Dataset:
    """Split clips into active segments (one row per segment); see
    :class:`SegmentClips`."""
    return ds.map_batches(
        SegmentClips,
        fn_constructor_kwargs={
            "threshold": threshold, "frame_ms": frame_ms,
            "max_gap_ms": max_gap_ms, "min_seg_ms": min_seg_ms,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )


class AugmentClips:
    """Actor-pool batch fn: standard ASR training augmentation — each
    clip emits its original plus rate-perturbed copies (``rates``; the
    Kaldi 0.9/1.0/1.1 speed-perturb recipe) plus one additive-noise copy
    at ``snr_db``. ONE decode serves every variant. Noise is seeded from
    the 64-bit hash of (clip_id, variant tag): deterministic and
    layout-invariant — reruns and repartitions produce bit-identical
    augmented bytes, so the augmented corpus dedups/reproduces like any
    other table. Undecodable rows pass through annotated (aug='orig',
    transform_error set), never poisoning the batch.

    ≙ the reference has no augmentation (a dedup tool); this is the
    training-data-pipeline completion op the task sheet's multimodal
    axis calls for, on the real (audio) modality.
    """

    def __init__(
        self,
        rates: tuple = (0.9, 1.1),
        snr_db: float = 20.0,
        id_col: str = "clip_id",
    ) -> None:
        self.rates = tuple(float(r) for r in rates)
        self.snr_db = float(snr_db)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduplidog_ray.stages.hashing import hash_strings_u64

        ids = batch[self.id_col].to_pylist()
        byts = batch["bytes"]
        buf = byts.combine_chunks() if isinstance(byts, pa.ChunkedArray) else byts
        bufs = _buffer_views(buf)
        codecs = batch["codec"].to_pylist()
        srs = batch["sr_hz"].to_pylist()
        out = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms",
                               "codec", "aug", "transform_error")}

        def emit(cid, b, sr, codec, aug, n_samples, err=None):
            out["clip_id"].append(cid)
            out["bytes"].append(b)
            out["sr_hz"].append(int(sr))
            out["dur_ms"].append(
                int(round(1000 * n_samples / max(int(sr), 1)))
            )
            out["codec"].append(codec)
            out["aug"].append(aug)
            out["transform_error"].append(err)

        for cid, v, codec, sr in zip(ids, bufs, codecs, srs):
            sr = int(sr)
            try:
                if v is None or len(v) == 0:
                    raise CodecError("empty bytes")
                pcm, sr_dec = decode(v, codec)
                sr = sr_dec or sr
            except CodecError as e:
                emit(cid, bytes(v) if v is not None else b"", sr, codec,
                     "orig", 0, err=str(e))
                continue
            pcm = np.asarray(pcm, dtype=np.float64)
            emit(cid, bytes(v), sr, codec, "orig", len(pcm))
            for r in self.rates:
                y = fft_resample(pcm, sr, max(1, int(round(sr * r))))
                y = np.clip(y, -1.0, 1.0).astype(np.float32)
                emit(f"{cid}#rate{r:g}", encode(y, sr, codec), sr, codec,
                     f"rate{r:g}", len(y))
            p_sig = float(np.mean(pcm * pcm))
            if p_sig > 0:
                seed = int(hash_strings_u64(
                    np.array([f"{cid}#noise"]), seed=0xA06
                )[0])
                rng = np.random.default_rng(seed)
                sigma = np.sqrt(p_sig / (10.0 ** (self.snr_db / 10.0)))
                y = np.clip(pcm + rng.normal(0.0, sigma, len(pcm)),
                            -1.0, 1.0).astype(np.float32)
                emit(f"{cid}#noise", encode(y, sr, codec), sr, codec,
                     f"noise{self.snr_db:g}db", len(y))

        return pa.table({
            "clip_id": pa.array(out["clip_id"], type=pa.string()),
            "bytes": pa.array(out["bytes"], type=pa.binary()),
            "sr_hz": pa.array(out["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(out["dur_ms"], type=pa.int32()),
            "codec": pa.array(out["codec"], type=pa.string()),
            "aug": pa.array(out["aug"], type=pa.string()),
            "transform_error": pa.array(out["transform_error"],
                                        type=pa.string()),
        })


def augment_clips(
    ds: ray.data.Dataset,
    rates: tuple = (0.9, 1.1),
    snr_db: float = 20.0,
    id_col: str = "clip_id",
) -> ray.data.Dataset:
    """Streaming augmentation: clips table → (1 + len(rates) + 1)× rows
    with an ``aug`` tag column; see :class:`AugmentClips`."""
    return ds.map_batches(
        AugmentClips,
        fn_constructor_kwargs=dict(rates=rates, snr_db=snr_db,
                                   id_col=id_col),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
