"""Property-based tests (hypothesis) for the pure kernels — beyond the
reference's example-based strategy (it has no property tests; SURVEY.md §5).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from deduplidog_ray.audio.codecs import decode, encode, snr_db
from deduplidog_ray.config import NormalizeConfig, SignatureConfig
from deduplidog_ray.stages.normalize import normalize_array
from deduplidog_ray.stages.signatures import (
    minhash_signatures,
    shingle_hashes,
    simhash_signatures,
)

CFG = SignatureConfig()


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    dur=st.integers(60, 800),
    sr=st.sampled_from([8000, 16000, 22050]),
)
def test_wav_roundtrip_property(seed, dur, sr):
    rng = np.random.default_rng(seed)
    pcm = rng.uniform(-1, 1, int(sr * dur / 1000)).astype(np.float32)
    out, sr2 = decode(encode(pcm, sr, "pcm_s16le"), "pcm_s16le")
    assert sr2 == sr and len(out) == len(pcm)
    assert np.abs(out - pcm).max() <= 1.5 / 32767


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    dur=st.integers(60, 800),
)
def test_ulaw_snr_property(seed, dur):
    rng = np.random.default_rng(seed)
    # signals with reasonable level (µ-law SNR degrades near silence)
    pcm = (0.3 + 0.6 * rng.random()) * np.sin(
        2 * np.pi * rng.uniform(50, 2000) * np.arange(int(8 * dur)) / 8000
    ).astype(np.float32)
    out, _ = decode(encode(pcm, 8000, "ulaw"), "ulaw")
    assert snr_db(pcm, out) >= 30


@settings(max_examples=30, deadline=None)
@given(words=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=60))
def test_shingle_minhash_self_identity(words):
    text = " ".join(words)
    flat, off = shingle_hashes([text, text], CFG.shingle_k, CFG.seed)
    sig = minhash_signatures(flat, off, CFG)
    assert (sig[0] == sig[1]).all()
    sh = simhash_signatures(flat, off)
    assert sh[0] == sh[1]


@settings(max_examples=30, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
    )
)
def test_normalize_idempotent(text):
    import pyarrow as pa

    cfg = NormalizeConfig(space2char="_", casefold=True, strip_end_counter=True)
    once = normalize_array(pa.array([text]), cfg).to_pylist()[0]
    twice = normalize_array(pa.array([once]), cfg).to_pylist()[0]
    assert once == twice


@settings(max_examples=20, deadline=None)
@given(
    n_shared=st.integers(0, 40),
    n_a=st.integers(0, 30),
    n_b=st.integers(0, 30),
)
def test_minhash_jaccard_estimate_bounded(n_shared, n_a, n_b):
    shared = [f"s{i}" for i in range(n_shared)]
    a = " ".join(shared + [f"a{i}" for i in range(n_a)])
    b = " ".join(shared + [f"b{i}" for i in range(n_b)])
    flat, off = shingle_hashes([a, b], CFG.shingle_k, CFG.seed)
    sig = minhash_signatures(flat, off, CFG)
    est = float((sig[0] == sig[1]).mean())
    assert 0.0 <= est <= 1.0
    if n_shared == 0 and n_a > 5 and n_b > 5:
        assert est < 0.5            # disjoint-ish sets estimate low


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    k=st.integers(0, 3),
    n=st.integers(1, 40),
)
def test_lev_kernel_property(seed, k, n):
    """Vectorized bounded Levenshtein == scalar DP on random short
    strings (the editdedup verify kernel)."""
    from deduplidog_ray.pipelines.editdedup import lev_le_k

    rng = np.random.default_rng(seed)
    alpha = list("abcd")  # small alphabet -> many near-misses at the bound

    def rand_s():
        return "".join(rng.choice(alpha, rng.integers(0, 10)))

    def lev(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, lb + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[lb]

    a = [rand_s() for _ in range(n)]
    b = [rand_s() for _ in range(n)]
    got = lev_le_k(a, b, k)
    want = np.array([lev(x, y) <= k for x, y in zip(a, b)])
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    descending=st.booleans(),
)
def test_sort_composite_order_property(seed, descending):
    """The int64 composite used by distributed_sort_rank preserves the
    (key asc|desc, tie asc) total order for any in-range inputs."""
    import pyarrow as pa

    from deduplidog_ray.pipelines.sort import _composite

    rng = np.random.default_rng(seed)
    n = 200
    key = rng.integers(-(1 << 29), 1 << 29, n).astype(np.int64)
    tie = rng.permutation(n).astype(np.int64)
    t = pa.table({"k": pa.array(key), "t": pa.array(tie)})
    comp = _composite(t, "k", "t", descending)
    order_comp = np.argsort(comp, kind="stable")
    order_ref = np.lexsort((tie, -key if descending else key))
    assert np.array_equal(order_comp, order_ref)
