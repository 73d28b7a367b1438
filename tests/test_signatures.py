"""Signature kernel unit tests (no Ray)."""

import numpy as np
import pyarrow as pa

from deduplidog_ray.config import NormalizeConfig, SignatureConfig
from deduplidog_ray.stages.normalize import normalize_array
from deduplidog_ray.stages.signatures import (
    band_hashes,
    minhash_signatures,
    shingle_hashes,
    simhash_block_keys,
    simhash_signatures,
    winnow_keys,
)

CFG = SignatureConfig()


def _sig(texts):
    flat, off = shingle_hashes(texts, CFG.shingle_k, CFG.seed)
    return flat, off


def test_shingle_counts():
    flat, off = _sig(["a b c d e", "a b", "", None])
    counts = (off[1:] - off[:-1]).tolist()
    assert counts == [3, 1, 1, 1]           # n-k+1; short/empty docs get 1


def test_identical_texts_identical_signatures():
    t = "the quick brown fox jumps over the lazy dog " * 3
    flat, off = _sig([t, t])
    sig = minhash_signatures(flat, off, CFG)
    assert (sig[0] == sig[1]).all()
    sh = simhash_signatures(flat, off)
    assert sh[0] == sh[1]
    bh = band_hashes(sig, CFG)
    assert (bh[0] == bh[1]).all()


def test_minhash_jaccard_estimate_accuracy():
    a = " ".join(f"tok{i}" for i in range(100))
    b = " ".join(f"tok{i}" for i in range(50)) + " " + " ".join(
        f"other{i}" for i in range(50)
    )
    flat, off = _sig([a, b])
    sig = minhash_signatures(flat, off, CFG)
    est = (sig[0] == sig[1]).mean()
    # true jaccard of the shingle sets ≈ 48/148 ≈ 0.32
    assert 0.15 < est < 0.50


def test_simhash_hamming_small_for_small_edits():
    a = " ".join(f"tok{i}" for i in range(60))
    toks = [f"tok{i}" for i in range(60)]
    toks[30] = "EDITED"
    b = " ".join(toks)
    flat, off = _sig([a, b])
    sh = simhash_signatures(flat, off)
    ham = bin(int(sh[0]) ^ int(sh[1])).count("1")
    assert ham <= 6


def test_simhash_block_keys_pigeonhole():
    # Hamming distance <= 3 words must share at least one of 4 block keys
    rng = np.random.default_rng(0)
    for _ in range(50):
        x = rng.integers(0, 2**63, dtype=np.uint64)
        flip = np.uint64(0)
        for b in rng.choice(64, size=3, replace=False):
            flip |= np.uint64(1) << np.uint64(int(b))
        y = x ^ flip
        kx = simhash_block_keys(np.array([x], dtype=np.uint64), 3)
        ky = simhash_block_keys(np.array([y], dtype=np.uint64), 3)
        assert (kx == ky).any()


def test_winnow_containment_guarantee():
    base = [f"w{i}" for i in range(40)]
    contained = base[5:25]                    # 20-token contiguous span
    flat, off = _sig([" ".join(base), " ".join(contained)])
    d, v, c = winnow_keys(flat, off, CFG.winnow_window)
    s0 = set(v[d == 0].tolist())
    s1 = set(v[d == 1].tolist())
    assert s0 & s1                            # shared fingerprint guaranteed


def test_normalizers():
    cfg = NormalizeConfig(
        space2char="_",
        strip_end_counter=True,
        strip_suffix="-tail",
        casefold=True,
        truncate=20,
    )
    arr = pa.array(["Hello  World (3)", "ABC-tail", "  padded   text  "])
    out = normalize_array(arr, cfg).to_pylist()
    assert out[0] == "hello_world"
    assert out[1] == "abc"
    assert out[2] == "padded_text"


def test_normalize_truncate():
    cfg = NormalizeConfig(truncate=5)
    out = normalize_array(pa.array(["abcdefghij"]), cfg).to_pylist()
    assert out == ["abcde"]


def test_signature_determinism_across_calls():
    texts = ["deterministic check one two three four five six seven"]
    f1, o1 = _sig(texts)
    f2, o2 = _sig(texts)
    assert (f1 == f2).all() and (o1 == o2).all()
