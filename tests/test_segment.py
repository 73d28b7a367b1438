"""segment_clips: energy-based VAD-style segmentation — planted
tone/silence layouts, gap bridging, min-length drop, codec round-trip
fidelity, poison-row quarantine, layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.audio.codecs import decode, encode
from deduplidog_ray.pipelines.audiotransform import SegmentClips, segment_clips

SR = 16000


def _tone(dur_s, freq=440.0, amp=0.5):
    t = np.arange(int(SR * dur_s)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def _silence(dur_s):
    return np.zeros(int(SR * dur_s))


def _clip(pcm, clip_id="c0", codec="pcm_s16le"):
    return {
        "clip_id": clip_id,
        "bytes": encode(pcm.astype(np.float32), SR, codec),
        "sr_hz": SR, "dur_ms": int(1000 * len(pcm) / SR), "codec": codec,
    }


def _run_rows(rows):
    df = pd.DataFrame(rows)
    out = segment_clips(
        rd.from_pandas(df), concurrency=2, batch_size=4,
    ).to_pandas()
    if len(out) == 0:
        return out
    return out.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)


def test_two_tones_split_by_long_silence(ray_session):
    pcm = np.r_[_tone(1.0), _silence(1.0), _tone(0.5)]
    out = _run_rows([_clip(pcm)])
    assert out["seg_idx"].tolist() == [0, 1]
    assert abs(out.loc[0, "start_ms"] - 0) <= 20
    assert abs(out.loc[0, "dur_ms"] - 1000) <= 40
    assert abs(out.loc[1, "start_ms"] - 2000) <= 40
    assert abs(out.loc[1, "dur_ms"] - 500) <= 40


def test_short_gap_bridged(ray_session):
    pcm = np.r_[_tone(0.5), _silence(0.1), _tone(0.5)]   # 100ms <= 200ms gap
    out = _run_rows([_clip(pcm)])
    assert len(out) == 1
    assert abs(out.loc[0, "dur_ms"] - 1100) <= 40


def test_short_blip_dropped(ray_session):
    pcm = np.r_[_silence(1.0), _tone(0.04), _silence(1.0)]  # 40ms < 100ms min
    out = _run_rows([_clip(pcm)])
    assert len(out) == 0


def test_segment_pcm_matches_source_slice(ray_session):
    pcm = np.r_[_tone(0.8), _silence(1.0), _tone(0.6, freq=880)]
    out = _run_rows([_clip(pcm)])
    for _, row in out.iterrows():
        seg, sr = decode(row["bytes"], row["codec"])
        lo = int(row["start_ms"] * SR / 1000)
        ref = pcm[lo:lo + len(seg)]
        err = np.abs(np.asarray(seg, dtype=np.float64) - ref).max()
        assert err < 1e-3    # int16 quantization bound
        assert sr == SR


def test_all_silent_yields_no_rows_and_poison_quarantines(ray_session):
    rows = [
        _clip(_silence(2.0), clip_id="quiet"),
        {"clip_id": "bad", "bytes": b"\x00\x01junk", "sr_hz": SR,
         "dur_ms": 100, "codec": "pcm_s16le"},
        _clip(_tone(0.5), clip_id="ok"),
    ]
    out = _run_rows(rows)
    assert "quiet" not in set(out["clip_id"])
    bad = out[out["clip_id"] == "bad"]
    assert len(bad) == 1 and bad.iloc[0]["seg_idx"] == -1
    assert bad.iloc[0]["transform_error"]
    assert len(out[out["clip_id"] == "ok"]) == 1


def test_layout_invariance_and_codecs(ray_session):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(24):
        parts = []
        for _ in range(rng.integers(1, 4)):
            parts += [_tone(rng.uniform(0.2, 0.8),
                            freq=rng.uniform(200, 1000)),
                      _silence(rng.uniform(0.3, 1.0))]
        codec = ["pcm_s16le", "ulaw"][i % 2]
        rows.append(_clip(np.concatenate(parts), clip_id=f"c{i:02d}",
                          codec=codec))
    a = _run_rows(rows)
    b_df = pd.DataFrame(rows).sample(frac=1.0, random_state=0)
    b = segment_clips(rd.from_pandas(b_df), concurrency=4,
                      batch_size=3).to_pandas() \
        .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["seg_idx"] >= 0).all()


def test_kernel_tail_handling():
    """Ragged loud tail shorter than one frame joins the last run."""
    seg = SegmentClips(min_seg_ms=20)
    pcm = np.r_[_tone(0.1), _tone(0.015)]    # 115ms: 5 frames + 15ms tail
    spans = seg._segments(pcm, SR)
    assert spans == [(0, len(pcm))]
    # lone loud tail with silent frames before it -> dropped by min length
    pcm2 = np.r_[_silence(0.1), _tone(0.015)]
    assert seg._segments(pcm2, SR) == []
