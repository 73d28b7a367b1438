"""Deterministic synthetic audio generation (no external data, no wall-clock).

≙ the reference test fixture generator ``FileRepresentation`` which writes
deterministic files from ``random.seed(text_seed)`` (reference
tests/setup.py:77-79). Every clip's PCM is a seeded sine/chirp/noise mixture
fully determined by (seed, duration, sample rate).
"""

from __future__ import annotations

import numpy as np


def make_pcm(seed: int, dur_ms: int, sr_hz: int) -> np.ndarray:
    """Deterministic mono float32 clip in [-1, 1]."""
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0xA0D10))
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float32) / sr_hz
    x = np.zeros(n, dtype=np.float32)
    # 2-4 sinusoid partials with random frequency/phase/amplitude
    for _ in range(int(rng.integers(2, 5))):
        f0 = float(rng.uniform(80.0, min(4000.0, sr_hz / 2.5)))
        amp = float(rng.uniform(0.1, 0.4))
        phase = float(rng.uniform(0, 2 * np.pi))
        # slight chirp so frames differ along time (fingerprint entropy)
        chirp = float(rng.uniform(-0.1, 0.1)) * f0
        x += amp * np.sin(2 * np.pi * (f0 + chirp * t) * t + phase).astype(np.float32)
    x += rng.normal(0, 0.01, n).astype(np.float32)          # noise floor
    peak = float(np.max(np.abs(x)))
    if peak > 0:
        x *= 0.9 / peak
    return x


def seed_from_text(text: str) -> int:
    """Stable 63-bit seed from a string (clip_id / transcript)."""
    import hashlib

    h = hashlib.blake2b(text.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFF_FFFF_FFFF_FFFF


def make_pcm_textured(seed: int, dur_ms: int, sr_hz: int) -> np.ndarray:
    """Deterministic mono float32 clip with TIME-VARYING spectral content:
    sinusoid partials whose frequencies re-draw every ~200 ms.

    `make_pcm` produces near-stationary tone mixtures — the documented
    degenerate case for landmark (constellation) fingerprinting, where
    the distinct-hash vocabulary collapses to a handful of values and
    cross-clip coincidences dominate (pipelines/audiofp.py docstring).
    Landmark-based queries synthesize from this generator instead; both
    stay fully deterministic in (seed, duration, rate)."""
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0x7E47))
    n = max(1, int(sr_hz * dur_ms / 1000))
    step = max(1, int(sr_hz * 0.2))
    x = np.zeros(n, dtype=np.float64)
    for _ in range(4):
        amp = float(rng.uniform(0.12, 0.3))
        phase = 0.0
        for s in range(0, n, step):
            f = float(rng.uniform(120.0, min(3400.0, sr_hz / 2.4)))
            m = min(step, n - s)
            tt = np.arange(m) / sr_hz
            x[s:s + m] += amp * np.sin(2 * np.pi * f * tt + phase)
            phase += 2 * np.pi * f * m / sr_hz
    x += rng.normal(0, 0.004, n)
    peak = float(np.max(np.abs(x)))
    if peak > 0:
        x *= 0.8 / peak
    return x.astype(np.float32)
