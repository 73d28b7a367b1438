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
    # payload-less rows: all share (content_hash=0, n_bytes=0) — must
    # NOT merge as byte dups (nothing was ever compared)
    rows.append(_row("n0", None, 0))
    rows.append(_row("n1", None, 0))
    rows.append(_row("e0", b"", 0))
    rows.append(_row("e1", b"", 0))
    # chained root: c05_z bytecopies c05, and a00_rewrap (< "c05") is a
    # container rewrap of the same PCM — tier 1 removes c05_z with root
    # c05, tier 2 removes c05 with root a00_rewrap; the reported root of
    # c05_z must be transitively resolved to the clip that kept its seat
    rows.append(_row("c05_z", encode(pcms["c05"], SR, "pcm_s16le"), 2000))
    rows.append(_row("a00_rewrap",
                     _pad_container(encode(pcms["c05"], SR, "pcm_s16le")),
                     2000))
    # same int16 samples declared at DOUBLE the rate: different audio
    # (half duration, octave up) — must NOT merge at the PCM tier
    rows.append(_row("c03_fast", encode(pcms["c03"], 2 * SR, "pcm_s16le"),
                     1000, sr=2 * SR))
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
    # distinct clips and every cluster root keep their seats (c05's
    # seat legitimately passes to a00_rewrap — the chained-root test)
    for kept in ["c00", "c01", "c02", "c03", "c04", "a00_rewrap"]:
        assert kept not in removed.index


def test_poison_rows(removed):
    # byte-identical garbage IS an exact byte dup; min id keeps the seat
    assert removed.loc["p1", "tier"] == TIER_EXACT_BYTES
    assert removed.loc["p1", "root"] == "p0"
    # but undecodable rows never merge via the all-zero pcm_hash and
    # never reach the perceptual tier
    assert "p0" not in removed.index
    assert "p2" not in removed.index


def test_payloadless_rows_never_merge(removed):
    # null/empty payloads share (content_hash=0, n_bytes=0) but nothing
    # was compared — none of them may be removed
    for cid in ["n0", "n1", "e0", "e1"]:
        assert cid not in removed.index


def test_chained_roots_resolved(removed):
    # c05_z (byte copy of c05) must point at the clip that KEPT its
    # seat after c05 itself fell to the container-rewrap tier
    assert removed.loc["c05", "tier"] == TIER_EXACT_PCM
    assert removed.loc["c05", "root"] == "a00_rewrap"
    assert removed.loc["c05_z", "root"] == "a00_rewrap"
    assert "a00_rewrap" not in removed.index
    # every reported root kept its seat — no root is itself removed
    assert not set(removed["root"]) & set(removed.index)


def test_same_samples_different_rate_not_merged(removed):
    # identical int16 payload at 2x the rate is different audio
    assert "c03_fast" not in removed.index or (
        removed.loc["c03_fast", "tier"] != TIER_EXACT_PCM
    )
    assert "c03" not in removed.index


def test_fused_embedding_matches_unfused(ray_session):
    """The decode-fused embedding (DecodeFingerprint(with_embedding=True))
    must equal stages/embed.py's AudioEmbedder output bit for bit at the
    same params — tier 3 of the cascade depends on this parity."""
    import pandas as pd

    from deduplidog_ray.stages.decode import DecodeFingerprint
    from deduplidog_ray.stages.embed import embed_clips

    rows = [
        _row("a", encode(_sig(1), SR, "pcm_s16le"), 2000),
        _row("b", encode(_sig(2), SR, "ulaw"), 2000, codec="ulaw"),
        _row("p", b"\x00garbage", 100),      # poison: zero vector + err
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    fused = ds.map_batches(
        DecodeFingerprint, fn_constructor_kwargs={"with_embedding": True},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=1,
    ).to_pandas().set_index("clip_id")
    unfused = embed_clips(
        rd.from_pandas(pd.DataFrame(rows)), concurrency=1
    ).to_pandas().set_index("clip_id")
    for cid in ("a", "b", "p"):
        fv = np.asarray(fused.loc[cid, "embedding"], dtype=np.float32)
        uv = np.asarray(unfused.loc[cid, "embedding"], dtype=np.float32)
        assert np.array_equal(fv, uv), cid
    assert fused.loc["p", "embed_error"] is not None
    assert np.all(np.asarray(fused.loc["p", "embedding"]) == 0.0)


def test_stretch_tier(ray_session):
    """with_stretch=True appends the time-scale-invariant tier: a 1.05×
    speed-changed copy (invisible to the byte/PCM/embedding tiers) is
    removed and attributed to it; first-tier-wins still holds; without
    the flag the stretched copy survives."""
    from deduplidog_ray.pipelines.audiotransform import fft_resample
    from deduplidog_ray.pipelines.tiered import TIER_STRETCH

    pcms = {f"s{i:02d}": _sig(300 + i) for i in range(6)}
    rows = [_row(cid, encode(p, SR, "pcm_s16le"), int(1000 * len(p) / SR))
            for cid, p in pcms.items()]
    rows.append(_row("s00_copy", encode(pcms["s00"], SR, "pcm_s16le"),
                     2000))
    st = fft_resample(pcms["s01"].astype(np.float64), SR,
                      int(round(SR * 1.05)))
    rows.append(_row("s01_str",
                     encode(np.clip(st, -1, 1).astype(np.float32), SR,
                            "pcm_s16le"),
                     int(1000 * len(st) / SR)))
    out = tiered_clips_dedup(
        rd.from_items(rows), partitions=4, with_stretch=True
    ).set_index("clip_id")
    assert out.loc["s01_str", "tier"] == TIER_STRETCH
    assert out.loc["s01_str", "root"] == "s01"
    assert out.loc["s00_copy", "tier"] == TIER_EXACT_BYTES
    assert set(out.index) == {"s01_str", "s00_copy"}

    out2 = tiered_clips_dedup(rd.from_items(rows), partitions=4)
    assert "s01_str" not in set(out2["clip_id"])
