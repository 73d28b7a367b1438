"""shifted_dup_pairs: time-shift-robust duplicate detection — planted
delays recovered to frame accuracy, re-encode+delay confirmed, distinct
content rejected, xcorr kernel unit checks."""

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.pipelines.audioalign import _xcorr_peak, shifted_dup_pairs

SR = 16000


def _sig(seed, dur_s=1.5):
    """Band-limited noise-ish signal: sum of a few random sinusoids with
    a random AM envelope — unique per seed, stationary enough for the
    mean-pooled embedding to be shift-invariant."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * dur_s)) / SR
    x = np.zeros_like(t)
    for _ in range(6):
        x += rng.uniform(0.1, 0.3) * np.sin(
            2 * np.pi * rng.uniform(100, 3000) * t + rng.uniform(0, 6.28)
        )
    env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t)
    return (0.4 * x * env / np.abs(x * env).max()).astype(np.float64)


def _row(cid, pcm, codec="pcm_s16le", sr=SR):
    return {
        "clip_id": cid, "bytes": encode(pcm.astype(np.float32), sr, codec),
        "sr_hz": sr, "dur_ms": int(1000 * len(pcm) / sr), "codec": codec,
    }


def test_xcorr_kernel_recovers_known_lag():
    x = _sig(1)
    for d_ms in (0, 37, 250):
        d = SR * d_ms // 1000
        y = np.r_[np.zeros(d), x]
        lag, corr = _xcorr_peak(x, y, SR)   # 1 s window
        assert lag == d
        assert corr > 0.95
    # reversed roles: negative lag
    d = SR * 120 // 1000
    lag, corr = _xcorr_peak(np.r_[np.zeros(d), x], x, SR)
    assert lag == -d and corr > 0.95


def test_planted_delays_found_with_offsets(ray_session):
    rows = []
    expect = {}
    for i in range(6):
        base = _sig(100 + i)
        rows.append(_row(f"orig_{i}", base))
        d_ms = 80 * (i + 1)                  # 80..480 ms
        delayed = np.r_[np.zeros(SR * d_ms // 1000), base]
        codec = "ulaw" if i % 2 else "pcm_s16le"
        rows.append(_row(f"delay_{i}", delayed, codec=codec))
        expect[(f"delay_{i}", f"orig_{i}")] = d_ms
    # distinct distractors
    for i in range(6):
        rows.append(_row(f"noise_{i}", _sig(900 + i)))

    out = shifted_dup_pairs(
        rd.from_pandas(pd.DataFrame(rows)),
        embed_threshold=0.97, corr_threshold=0.8, max_shift_ms=600,
    )
    got = {}
    for _, r in out.iterrows():
        a, b, off = r["clip_a"], r["clip_b"], int(r["offset_ms"])
        # normalize orientation: delayed side has positive offset
        if off >= 0:
            got[(b, a)] = off
        else:
            got[(a, b)] = -off

    for (delayed, orig), d_ms in expect.items():
        key = (delayed, orig)
        assert key in got, f"missing pair {key}; got {sorted(got)}"
        assert abs(got[key] - d_ms) <= 20, (key, got[key], d_ms)
    # no cross-content confirmations
    for (a, b) in got:
        ia, ib = a.split("_")[1], b.split("_")[1]
        assert ia == ib, (a, b)


def test_silence_padded_dup_not_gated():
    # Regression: a trailing silence pad adds duration but no energy, so
    # a duration-ratio pre-gate would wrongly skip this perfect dup
    # (2000 vs 5000 ms). The energy-window gate must let it through.
    from deduplidog_ray.pipelines.audioalign import _verify_pairs
    base = _sig(42, dur_s=2.0)
    padded = np.r_[base, np.zeros(3 * SR)]
    store = {
        "a": (encode(base.astype(np.float32), SR, "pcm_s16le"),
              "pcm_s16le", SR),
        "b": (encode(padded.astype(np.float32), SR, "pcm_s16le"),
              "pcm_s16le", SR),
    }
    out = _verify_pairs(store, [("a", "b")], SR, 1000, 0.85)
    assert len(out) == 1
    _, _, off, corr = out[0]
    assert corr > 0.95 and abs(off) <= 20


def test_energy_gate_skips_impossible_pairs(monkeypatch):
    # Uniform-energy clips at an 8x duration ratio cannot reach the
    # threshold (corr <= sqrt(Ewin/E_long) ~ sqrt(1/8)); the gate must
    # skip the FFT entirely.
    import deduplidog_ray.pipelines.audioalign as aa
    calls = []
    real = aa._xcorr_peak
    monkeypatch.setattr(
        aa, "_xcorr_peak", lambda *a: calls.append(1) or real(*a))
    store = {
        "s": (encode(_sig(7, dur_s=1.0).astype(np.float32), SR,
                     "pcm_s16le"), "pcm_s16le", SR),
        "l": (encode(_sig(8, dur_s=8.0).astype(np.float32), SR,
                     "pcm_s16le"), "pcm_s16le", SR),
    }
    out = aa._verify_pairs(store, [("s", "l")], SR, 500, 0.8)
    assert out == [] and not calls


def test_no_pairs_on_distinct_corpus(ray_session):
    rows = [_row(f"c{i}", _sig(500 + i)) for i in range(8)]
    out = shifted_dup_pairs(
        rd.from_pandas(pd.DataFrame(rows)),
        embed_threshold=0.97, corr_threshold=0.8,
    )
    assert len(out) == 0


def test_empty_schema_split_tolerated(ray_session, tmp_path):
    # Regression: Ray Data can emit a zero-row RefBundle with an EMPTY
    # schema for an empty upstream split (seen nondeterministically when
    # a unioned parquet read splits into an empty block late in a long
    # session); _block_ids must not KeyError on it. Force the condition
    # deterministically with a zero-row parquet side in the union.
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _sig(900)
    rows = [_row("orig", base),
            _row("delay", np.r_[np.zeros(SR * 160 // 1000), base])]
    full = pa.Table.from_pylist(rows)
    pq.write_table(full, tmp_path / "clips.parquet")
    pq.write_table(full.slice(0, 0), tmp_path / "empty.parquet")
    ds = rd.read_parquet(str(tmp_path / "clips.parquet")).union(
        rd.read_parquet(str(tmp_path / "empty.parquet"))
    )
    out = shifted_dup_pairs(ds, embed_threshold=0.97, corr_threshold=0.8,
                            max_shift_ms=500)
    assert list(zip(out["clip_a"], out["clip_b"])) == [("delay", "orig")]
    assert abs(int(out["offset_ms"][0])) == 160
