"""tiered_clips_dedup: the tier cascade on the AUDIO payload axis.

Planted fixture — one duplicate per tier, each invisible to the cheaper
tiers above it:

- byte-exact copy           → caught at tier 1 (exact_bytes)
- container-padded WAV      → same decoded int16, different bytes
                              → caught at tier 2 (exact_pcm)
- µ-law re-encode (lossy)   → different quantized PCM, cosine ≈ 1
                              → caught at tier 3 (perceptual)
- distinct clips            → never emitted
- undecodable poison row    → quarantined from tiers 2-3, not merged
                              with other poison rows

Tier attribution must be FIRST-catching: the byte copy is also a PCM
and perceptual dup, but only the cheapest tier may claim it (the
reference's escalation order, deduplidog/deduplidog.py:707-767).
"""

import struct

import numpy as np
import pytest

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.pipelines.tiered import (
    TIER_EXACT_BYTES,
    TIER_EXACT_PCM,
    TIER_PERCEPTUAL,
    tiered_clips_dedup,
)

SR = 8000


def _sig(seed, dur_s=2.0):
    """Non-stationary multi-partial signal, unique per seed (same
    construction as tests/test_audiofp.py — frequencies step every
    ~200 ms so spectral embeddings differ between seeds)."""
    rng = np.random.default_rng(seed)
    n = int(SR * dur_s)
    step = int(SR * 0.2)
    x = np.zeros(n)
    for _ in range(4):
        amp = rng.uniform(0.15, 0.3)
        for s in range(0, n, step):
            f = rng.uniform(150, 3200)
            tt = np.arange(min(step, n - s)) / SR
            x[s:s + len(tt)] += amp * np.sin(2 * np.pi * f * tt)
    x += rng.normal(0, 0.004, n)
    return (0.8 * x / np.abs(x).max()).astype(np.float32)


def _row(cid, byts, dur_ms, codec="pcm_s16le", sr=SR):
    return {"clip_id": cid, "bytes": byts, "sr_hz": sr,
            "dur_ms": dur_ms, "codec": codec}


def _pad_container(wav: bytes) -> bytes:
    """Insert a junk RIFF chunk after 'WAVE': byte-different container,
    bit-identical decoded samples (the 'converted copy' duplicate)."""
    junk = b"pad " + struct.pack("<I", 8) + b"\x00" * 8
    out = wav[:12] + junk + wav[12:]
    # keep the RIFF size field consistent
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


@pytest.fixture(scope="module")
def removed(ray_session):
    rows = []
    pcms = {f"c{i:02d}": _sig(100 + i) for i in range(6)}
    for cid, pcm in pcms.items():
        rows.append(_row(cid, encode(pcm, SR, "pcm_s16le"),
                         int(1000 * len(pcm) / SR)))
    # tier-1 plant: byte-exact copy of c00
    rows.append(_row("c00_bytecopy", encode(pcms["c00"], SR, "pcm_s16le"),
                     2000))
    # tier-2 plant: container-padded re-wrap of c01
    rows.append(_row("c01_rewrap",
                     _pad_container(encode(pcms["c01"], SR, "pcm_s16le")),
                     2000))
    # tier-3 plant: lossy µ-law re-encode of c02
    rows.append(_row("c02_ulaw", encode(pcms["c02"], SR, "ulaw"), 2000,
                     codec="ulaw"))
    # two byte-identical poison rows + one distinct poison row
    rows.append(_row("p0", b"garbage-not-riff", 0))
    rows.append(_row("p1", b"garbage-not-riff", 0))
    rows.append(_row("p2", b"other-garbage", 0))
    out = tiered_clips_dedup(rd.from_items(rows), partitions=4)
    return out.set_index("clip_id")


def test_each_tier_catches_its_plant(removed):
    assert removed.loc["c00_bytecopy", "tier"] == TIER_EXACT_BYTES
    assert removed.loc["c00_bytecopy", "root"] == "c00"
    assert removed.loc["c01_rewrap", "tier"] == TIER_EXACT_PCM
    assert removed.loc["c01_rewrap", "root"] == "c01"
    assert removed.loc["c02_ulaw", "tier"] == TIER_PERCEPTUAL
    assert removed.loc["c02_ulaw", "root"] == "c02"


def test_first_tier_wins_and_survivors_absent(removed):
    # the byte copy is ALSO a pcm + perceptual dup: exactly one row per
    # removed clip, attributed to the cheapest tier
    assert removed.index.is_unique
    # distinct clips and every cluster root keep their seats
    for kept in ["c00", "c01", "c02", "c03", "c04", "c05"]:
        assert kept not in removed.index


def test_poison_rows(removed):
    # byte-identical garbage IS an exact byte dup; min id keeps the seat
    assert removed.loc["p1", "tier"] == TIER_EXACT_BYTES
    assert removed.loc["p1", "root"] == "p0"
    # but undecodable rows never merge via the all-zero pcm_hash and
    # never reach the perceptual tier
    assert "p0" not in removed.index
    assert "p2" not in removed.index
