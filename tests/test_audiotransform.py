"""Audio transform invariants: FFT resample SNR/energy, peak normalize,
silence trim, and the composing actor-pool stages (schema, poison rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.audio.codecs import decode, encode, snr_db
from deduplidog_ray.audio.synth import make_pcm
from deduplidog_ray.pipelines.audiotransform import (
    PeakNormalize,
    TrimSilence,
    fft_resample,
    normalize_clips,
    resample_clips,
    trim_silence_clips,
)


def test_fft_resample_bin_sine_exact():
    """A bin-aligned sine is reconstructed exactly (band-limited ideal)."""
    n, sr = 8000, 8000
    k = 440  # Hz == bin index at 1 s
    t8 = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * k * t8)
    y = fft_resample(x, sr, 2 * sr)
    t16 = np.arange(2 * n) / (2 * sr)
    want = 0.5 * np.sin(2 * np.pi * k * t16)
    assert snr_db(want, y) > 80


def test_fft_resample_round_trip_snr_and_energy():
    x = make_pcm(seed=123, dur_ms=700, sr_hz=8000).astype(np.float64)
    up = fft_resample(x, 8000, 16000)
    assert len(up) == 2 * len(x)
    back = fft_resample(up, 16000, 8000)
    assert snr_db(x, back) > 60
    # Parseval: mean power preserved by the ideal resampler (content is
    # band-limited below the lower Nyquist)
    p0 = float((x * x).mean())
    p1 = float((up * up).mean())
    assert abs(p0 - p1) / p0 < 1e-3


def test_resample_stage_rewrites_rows_and_quarantines_poison(ray_session):
    rows = []
    for i, codec in enumerate(["pcm_s16le", "ulaw", "pcm_s16le"]):
        pcm = make_pcm(seed=i, dur_ms=400, sr_hz=8000)
        rows.append(
            {"clip_id": f"c{i}", "bytes": encode(pcm, 8000, codec),
             "sr_hz": 8000, "dur_ms": 400, "codec": codec,
             "transcript": f"t{i}"}
        )
    rows.append(
        {"clip_id": "poison", "bytes": b"\x00garbage", "sr_hz": 8000,
         "dur_ms": 400, "codec": "pcm_s16le", "transcript": "x"}
    )
    t = pa.Table.from_pylist(rows)
    out = resample_clips(rd.from_arrow(t), target_sr=16000).to_pandas()
    out = out.set_index("clip_id")
    ok = out.drop(index="poison")
    assert (ok["sr_hz"] == 16000).all()
    assert (ok["dur_ms"] == 400).all()
    assert ok["transform_error"].isna().all()
    # schema passthrough: transcripts survive
    assert list(ok["transcript"].sort_values()) == ["t0", "t1", "t2"]
    # decoded output ≈ ideal resample of the decoded input (codec loss only)
    for i, codec in enumerate(["pcm_s16le", "ulaw", "pcm_s16le"]):
        src, _ = decode(rows[i]["bytes"], codec)
        want = fft_resample(np.asarray(src, np.float64), 8000, 16000)
        got, sr = decode(out.loc[f"c{i}", "bytes"], codec)
        assert sr == 16000 and len(got) == len(want)
        gate = 30 if codec == "ulaw" else 45
        assert snr_db(np.clip(want, -1, 1), np.asarray(got, np.float64)) > gate
    # poison row: annotated, payload passes through untouched
    assert out.loc["poison", "transform_error"]
    assert bytes(out.loc["poison", "bytes"]) == b"\x00garbage"
    assert out.loc["poison", "sr_hz"] == 8000


def test_peak_normalize(ray_session):
    pcm = 0.25 * make_pcm(seed=9, dur_ms=300, sr_hz=8000)
    t = pa.Table.from_pylist(
        [{"clip_id": "a", "bytes": encode(pcm, 8000, "pcm_s16le"),
          "sr_hz": 8000, "dur_ms": 300, "codec": "pcm_s16le"}]
    )
    out = normalize_clips(rd.from_arrow(t), target_peak=0.9).take_all()[0]
    got, _ = decode(out["bytes"], "pcm_s16le")
    peak = float(np.max(np.abs(got)))
    assert abs(peak - 0.9) < 2e-4          # within int16 quantization
    # shape preserved: correlation with source ~ 1
    src, _ = decode(t["bytes"][0].as_py(), "pcm_s16le")
    c = np.corrcoef(np.asarray(src, float), np.asarray(got, float))[0, 1]
    assert c > 0.9999


def test_trim_silence(ray_session):
    sr = 8000
    body = make_pcm(seed=4, dur_ms=300, sr_hz=sr)
    pad = np.zeros(sr // 2, dtype=np.float32)           # 500 ms silence
    pcm = np.concatenate([pad, body, pad])
    t = pa.Table.from_pylist(
        [{"clip_id": "a", "bytes": encode(pcm, sr, "pcm_s16le"),
          "sr_hz": sr, "dur_ms": 1300, "codec": "pcm_s16le"},
         {"clip_id": "allsilent", "bytes": encode(pad, sr, "pcm_s16le"),
          "sr_hz": sr, "dur_ms": 500, "codec": "pcm_s16le"}]
    )
    out = trim_silence_clips(rd.from_arrow(t), threshold=0.01).to_pandas()
    out = out.set_index("clip_id")
    got, _ = decode(out.loc["a", "bytes"], "pcm_s16le")
    # trimmed to the active span within one 20 ms frame of the body
    frame = sr * 20 // 1000
    assert abs(len(got) - len(body)) <= 2 * frame
    assert out.loc["a", "dur_ms"] <= 340
    # kernel-level: exact frame arithmetic
    y, _ = TrimSilence(threshold=0.01)._apply(
        np.asarray(pcm, np.float64), sr
    )
    lo = (len(pad) // frame) * frame
    assert len(pad) - frame < lo <= len(pad)
    assert len(y) == len(got)
    # the all-silent clip collapses to zero samples
    gs, _ = decode(out.loc["allsilent", "bytes"], "pcm_s16le")
    assert len(gs) == 0 and out.loc["allsilent", "dur_ms"] == 0


def test_chain_equals_sequential_stages(ray_session):
    """Fused Chain (decode once) must match the standalone stages run
    back to back — up to the inter-stage codec re-quantization the
    fusion deliberately skips, so decoded audio is compared at an
    SNR gate far above codec loss."""
    from deduplidog_ray.pipelines.audiotransform import (
        Chain,
        PeakNormalize,
        Resample,
        normalize_clips,
        resample_clips,
        transform_clips,
    )

    rows = []
    for i, codec in enumerate(["pcm_s16le", "ulaw"]):
        pcm = make_pcm(seed=40 + i, dur_ms=500, sr_hz=8000)
        rows.append({"clip_id": f"c{i}", "bytes": encode(pcm, 8000, codec),
                     "sr_hz": 8000, "dur_ms": 500, "codec": codec})
    t = pa.Table.from_pylist(rows)
    steps = [(Resample, {"target_sr": 16000}), (PeakNormalize, {})]
    fused = transform_clips(rd.from_arrow(t), steps).to_pandas()
    seq = normalize_clips(
        resample_clips(rd.from_arrow(t), target_sr=16000)
    ).to_pandas()
    fused = fused.set_index("clip_id").sort_index()
    seq = seq.set_index("clip_id").sort_index()
    for cid in fused.index:
        # sequential path re-quantizes to the codec between stages; fused
        # skips that round-trip, so compare DECODED audio, gated well
        # above codec loss
        codec = fused.loc[cid, "codec"]
        a, sra = decode(fused.loc[cid, "bytes"], codec)
        b, srb = decode(seq.loc[cid, "bytes"], codec)
        assert sra == srb == 16000
        gate = 30 if codec == "ulaw" else 50
        assert snr_db(np.asarray(b, np.float64), np.asarray(a, np.float64)) > gate
    assert (fused["sr_hz"] == seq["sr_hz"]).all()
    assert (fused["dur_ms"] == seq["dur_ms"]).all()


def test_augment_clips(ray_session):
    """Speed-perturb + seeded-noise augmentation: 4 rows per clip with
    exact duration scaling, measured SNR at target, deterministic across
    layouts, poison rows annotated not multiplied."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplidog_ray.audio.codecs import decode, encode
    from deduplidog_ray.audio.synth import make_pcm_textured
    from deduplidog_ray.pipelines.audiotransform import augment_clips

    sr = 8000
    pcms = {f"c{i}": make_pcm_textured(800 + i, 1500, sr) for i in range(4)}
    rows = [{
        "clip_id": c, "bytes": encode(p.astype(np.float32), sr, "pcm_s16le"),
        "sr_hz": sr, "dur_ms": int(1000 * len(p) / sr), "codec": "pcm_s16le",
    } for c, p in pcms.items()]
    rows.append({"clip_id": "poison", "bytes": b"junk", "sr_hz": sr,
                 "dur_ms": 0, "codec": "pcm_s16le"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = augment_clips(ds, rates=(0.9, 1.1), snr_db=20.0).to_pandas()

    # 4 clips x (orig + 2 rates + noise) + 1 annotated poison row
    assert len(out) == 4 * 4 + 1
    byaug = out.groupby("aug").size().to_dict()
    assert byaug == {"orig": 5, "rate0.9": 4, "rate1.1": 4,
                     "noise20db": 4}
    p = out[out["clip_id"] == "poison"].iloc[0]
    assert p["transform_error"] is not None and p["aug"] == "orig"

    idx = out.set_index("clip_id")
    # duration scaling exact (1500 ms base)
    assert idx.loc["c0#rate0.9", "dur_ms"] == 1350
    assert idx.loc["c0#rate1.1", "dur_ms"] == 1650
    # measured SNR within 1 dB of target
    orig = pcms["c0"].astype(np.float64)
    noisy, _ = decode(idx.loc["c0#noise", "bytes"], "pcm_s16le")
    d = np.asarray(noisy, dtype=np.float64)[: len(orig)] - orig
    snr = 10 * np.log10(np.mean(orig ** 2) / np.mean(d ** 2))
    assert abs(snr - 20.0) < 1.0, snr

    # layout invariance: bytes identical after repartition
    out2 = augment_clips(ds.repartition(3), rates=(0.9, 1.1),
                         snr_db=20.0).to_pandas()
    a = out.sort_values("clip_id").reset_index(drop=True)
    b = out2.sort_values("clip_id").reset_index(drop=True)
    assert (a["clip_id"] == b["clip_id"]).all()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
