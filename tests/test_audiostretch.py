"""Speed-change-robust duplicate detection: planted stretched copies
(resample mislabels / playback-speed changes) recovered with the right
factor; exact and shifted copies matched at stretch 1.0; distinct clips
rejected; landmark hashing's blind spot demonstrably covered."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm_textured
from deduplidog_ray.pipelines.audiostretch import stretch_dup_pairs
from deduplidog_ray.pipelines.audiotransform import fft_resample

SR = 8000


def _clip(cid: str, pcm: np.ndarray, codec: str = "pcm_s16le") -> dict:
    pcm = np.clip(pcm, -1.0, 1.0).astype(np.float32)
    return {
        "clip_id": cid, "bytes": encode(pcm, SR, codec), "sr_hz": SR,
        "dur_ms": int(1000 * len(pcm) / SR), "codec": codec,
    }


def _stretched(pcm: np.ndarray, rate: float) -> np.ndarray:
    return fft_resample(
        pcm.astype(np.float64), SR, int(round(SR * rate))
    )


@pytest.fixture(scope="module")
def planted_result(ray_session):
    base = {f"c{i}": make_pcm_textured(i, 1800 + 70 * i, SR)
            for i in range(10)}
    rows = [_clip(c, p) for c, p in base.items()]
    # planted speed-changed copies (clip_id sorts AFTER its original)
    plants = {
        "c0_str095": ("c0", 0.95),
        "c1_str105": ("c1", 1.05),
        "c2_str112": ("c2", 1.12),
        "c3_copy": ("c3", 1.0),
    }
    for cid, (src, r) in plants.items():
        rows.append(_clip(cid, _stretched(base[src], r)))
    out = stretch_dup_pairs(rd.from_pandas(pd.DataFrame(rows)))
    return plants, out


def test_planted_stretches_recovered(planted_result):
    plants, out = planted_result
    got = {(a, b) for a, b in zip(out["clip_a"], out["clip_b"])}
    for cid, (src, _r) in plants.items():
        assert (src, cid) in got, (cid, sorted(got))


def test_stretch_factor_estimate(planted_result):
    plants, out = planted_result
    est = {(a, b): s for a, b, s in
           zip(out["clip_a"], out["clip_b"], out["stretch"])}
    for cid, (src, r) in plants.items():
        got = est[(src, cid)]
        # resolution is the vote bin width (3%) + ±1 jitter merge
        assert abs(np.log(got / r)) <= 0.045, (cid, got, r)


def test_no_false_pairs(planted_result):
    plants, out = planted_result
    expected = {(src, cid) for cid, (src, _r) in plants.items()}
    got = {(a, b) for a, b in zip(out["clip_a"], out["clip_b"])}
    assert got == expected, got ^ expected


def test_ulaw_stretch_combo(ray_session):
    """Speed change THROUGH a lossy µ-law re-encode: codec noise kills
    ~80% of the quads (measured 131 → 17 clean-vs-ulaw matches on one
    pair), so the distinct-hash coverage gate must come down to its
    documented hard-case setting — recall under combined transforms is
    a gate trade, not a default."""
    base = {f"u{i}": make_pcm_textured(20 + i, 2000, SR) for i in range(6)}
    rows = [_clip(c, p) for c, p in base.items()]
    rows.append(_clip("u1_strulaw", _stretched(base["u1"], 1.05),
                      codec="ulaw"))
    out = stretch_dup_pairs(
        rd.from_pandas(pd.DataFrame(rows)), min_hash_coverage=0.008
    )
    got = {(a, b) for a, b in zip(out["clip_a"], out["clip_b"])}
    assert ("u1", "u1_strulaw") in got, got


def test_excerpt_mode(ray_session):
    """dur_tolerance=0 disables the full-clip duration gate: a DELAYED
    + speed-changed copy (duration ratio ≠ speed factor) must still
    confirm — every quad invariant is shift-invariant within a clip."""
    base = {f"e{i}": make_pcm_textured(50 + i, 2000, SR) for i in range(6)}
    rows = [_clip(c, p) for c, p in base.items()]
    d = np.concatenate([np.zeros(SR // 2), _stretched(base["e1"], 1.05)])
    rows.append(_clip("e1_strshift", d))
    out = stretch_dup_pairs(
        rd.from_pandas(pd.DataFrame(rows)), dur_tolerance=0.0
    )
    got = {(a, b) for a, b in zip(out["clip_a"], out["clip_b"])}
    assert ("e1", "e1_strshift") in got, got
    # and the default full-clip mode rejects it: 500 ms of lead-in on a
    # 2.1 s clip breaks the duration/speed agreement by design
    strict = stretch_dup_pairs(rd.from_pandas(pd.DataFrame(rows)))
    got2 = {(a, b) for a, b in zip(strict["clip_a"], strict["clip_b"])}
    assert ("e1", "e1_strshift") not in got2, got2


def test_landmark_blind_spot_is_covered(ray_session):
    """The motivating case: a ±5% speed change defeats the landmark
    hash (absolute (f, Δf, Δt) packing) but not the scale-invariant
    triples — both run on the SAME pair of clips."""
    from deduplidog_ray.pipelines.audiofp import landmark_dup_pairs

    pcm = make_pcm_textured(77, 2000, SR)
    rows = [_clip("orig", pcm), _clip("orig_str", _stretched(pcm, 1.05))]
    ds = rd.from_pandas(pd.DataFrame(rows))
    lm = landmark_dup_pairs(ds, exchange="sort")
    st = stretch_dup_pairs(ds)
    assert len(lm) == 0          # landmark: blind under speed change
    assert len(st) == 1 and st.loc[0, "clip_a"] == "orig"


def test_stretch_index_probe(ray_session, tmp_path):
    """Build-once probe-many: a cropped AND speed-changed snippet finds
    its source clip at rank 1 with the right factor; an unrelated query
    returns nothing; a second probe reuses the index without rebuild."""
    from deduplidog_ray.pipelines.audiostretch import (
        build_stretch_index,
        search_stretch_index,
    )

    base = {f"x{i}": make_pcm_textured(500 + i, 2200, SR) for i in range(8)}
    idx = build_stretch_index(
        rd.from_pandas(pd.DataFrame([_clip(c, p) for c, p in base.items()])),
        str(tmp_path / "stridx"), partitions=8,
    )

    def crop_stretch(pcm, rate):
        n = len(pcm)
        return _stretched(pcm[int(0.2 * n): int(0.8 * n)], rate)

    qrows = [
        _clip("q_up", crop_stretch(base["x1"], 1.05)),
        _clip("q_dn", crop_stretch(base["x2"], 0.94)),
        _clip("q_plain", crop_stretch(base["x3"], 1.0)),
        _clip("q_none", make_pcm_textured(999, 1500, SR)),
    ]
    for _ in range(2):   # second probe: same index, no rebuild
        out = search_stretch_index(idx, rd.from_pandas(pd.DataFrame(qrows)))
        top = out[out["rank"] == 1].set_index("query_id")
        assert top.loc["q_up", "clip_id"] == "x1"
        assert abs(np.log(top.loc["q_up", "stretch"] / 1.05)) <= 0.045
        assert top.loc["q_dn", "clip_id"] == "x2"
        assert abs(np.log(top.loc["q_dn", "stretch"] / 0.94)) <= 0.045
        assert top.loc["q_plain", "clip_id"] == "x3"
        assert "q_none" not in set(out["query_id"])


def test_edge_inputs(ray_session, tmp_path):
    """Degenerate inputs flow through, never crash: sub-n_fft clips,
    silence (no peaks), undecodable bytes, and an empty query set
    against a built index."""
    from deduplidog_ray.pipelines.audiostretch import (
        build_stretch_index,
        search_stretch_index,
    )

    rows = [
        _clip("tiny", make_pcm_textured(1, 40, SR)),      # < one frame
        _clip("quiet", np.zeros(SR // 2, dtype=np.float32) + 1e-6),
        _clip("ok", make_pcm_textured(2, 2000, SR)),
    ]
    rows.append({"clip_id": "bad", "bytes": b"\x00junk", "sr_hz": SR,
                 "dur_ms": 100, "codec": "pcm_s16le"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    assert len(stretch_dup_pairs(ds)) == 0      # nothing to pair

    idx = build_stretch_index(ds, str(tmp_path / "edge"), partitions=4)
    # empty query set
    out = search_stretch_index(idx, rd.from_pandas(pd.DataFrame(
        [], columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]
    )))
    assert len(out) == 0
    # a query that produces zero quads (silence) answers nothing
    out2 = search_stretch_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip("qz", np.zeros(SR // 2, dtype=np.float32))]
    )))
    assert "qz" not in set(out2["query_id"])
