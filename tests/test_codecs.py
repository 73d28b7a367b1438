"""Codec + fingerprint unit tests (no Ray).

≙ reference content-equality fixtures (tests/setup.py:77-79 deterministic
content from seeds) and the SNR >= 30 dB invariant from BASELINE.json.
"""

import numpy as np
import pytest

from deduplidog_ray.audio.codecs import (
    CodecError,
    CodecUnavailable,
    decode,
    encode,
    snr_db,
)
from deduplidog_ray.audio.fingerprint import fingerprint, hamming
from deduplidog_ray.audio.synth import make_pcm


def test_wav_roundtrip_lossless_snr():
    pcm = make_pcm(42, 1000, 16000)
    buf = encode(pcm, 16000, "pcm_s16le")
    out, sr = decode(buf, "pcm_s16le")
    assert sr == 16000
    assert len(out) == len(pcm)
    assert snr_db(pcm, out) >= 80           # 16-bit quantization only


def test_ulaw_lossy_but_above_30db():
    pcm = make_pcm(42, 1000, 16000)
    out, sr = decode(encode(pcm, 16000, "ulaw"), "ulaw")
    assert sr == 16000
    s = snr_db(pcm, out)
    assert 30 <= s < 60                     # genuinely lossy, invariant holds


def test_poison_bytes_raise_codec_error():
    with pytest.raises(CodecError):
        decode(b"not a wav at all", "pcm_s16le")
    with pytest.raises(CodecError):
        decode(b"", "ulaw")
    with pytest.raises(CodecError):
        decode(b"x" * 100, "unknown_codec")


def test_gated_codec_unavailable():
    pcm = make_pcm(1, 100, 8000)
    with pytest.raises(CodecUnavailable):
        encode(pcm, 8000, "mp3")


def test_fingerprint_robust_to_reencode_and_trim():
    sr = 16000
    pcm = make_pcm(123, 1500, sr)
    fp0, nf0 = fingerprint(pcm, sr)
    # lossy re-encode: small distance
    ul, _ = decode(encode(pcm, sr, "ulaw"), "ulaw")
    fp1, nf1 = fingerprint(ul, sr)
    assert nf1 == nf0
    assert hamming(fp0, fp1) < 0.25 * 16 * nf0
    # 20 ms end-trim: still small (absolute-time framing)
    fp2, nf2 = fingerprint(pcm[: -int(sr * 0.02)], sr)
    assert abs(nf2 - nf0) <= 1
    assert hamming(fp0, fp2) < 0.25 * 16 * min(nf0, nf2)
    # different content: large
    fp3, _ = fingerprint(make_pcm(999, 1500, sr), sr)
    assert hamming(fp0, fp3) > 0.35 * 16 * nf0


def test_fingerprint_deterministic():
    pcm = make_pcm(7, 700, 8000)
    assert fingerprint(pcm, 8000) == fingerprint(pcm.copy(), 8000)
