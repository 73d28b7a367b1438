"""edit_distance_dup_pairs: FastSS deletion-neighborhood dedup.

Gates: the vectorized bounded-Levenshtein kernel vs a scalar DP
reference (random strings, unicode, empty, length skew); end-to-end
pair parity vs brute force at k=1 and k=2 over a corpus with planted
typo families; hot-variant guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.editdedup import (
    edit_distance_dup_pairs,
    lev_le_k,
)


def _lev_ref(a: str, b: str) -> int:
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


def test_lev_kernel_vs_scalar_dp():
    rng = np.random.default_rng(21)
    alpha = list("abcde") + ["ž", "é"]
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 12, 2)
        pairs.append((
            "".join(rng.choice(alpha, la)),
            "".join(rng.choice(alpha, lb)),
        ))
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    a, b = zip(*pairs)
    for k in (0, 1, 2, 3):
        got = lev_le_k(list(a), list(b), k)
        want = np.array([_lev_ref(x, y) <= k for x, y in pairs])
        assert np.array_equal(got, want), f"k={k}"


def _corpus(rng, n=120, key_len=16):
    alpha = list("abcdefghij")
    base = ["".join(rng.choice(alpha, key_len)) for _ in range(n)]
    texts = list(base)
    # planted typo families: substitution, deletion, insertion, 2-edit
    t = base[0]
    texts += [("X" + t[1:]), (t[:-1]), (t + "q")[:key_len + 4]]
    t2 = base[1]
    texts += [("Y" + t2[1:-1] + "Z")]          # 2 edits from t2
    return texts


def _brute(texts, key_len, k):
    keys = [t[:key_len] for t in texts]
    out = set()
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if _lev_ref(keys[i], keys[j]) <= k:
                out.add((i, j))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_pair_parity_vs_bruteforce(ray_session, k):
    rng = np.random.default_rng(5)
    key_len = 16
    texts = _corpus(rng, key_len=key_len)
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    got = edit_distance_dup_pairs(
        rd.from_arrow(t), key_len=key_len, max_edits=k, partitions=8,
    ).to_pandas()
    got_set = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    want = _brute(texts, key_len, k)
    assert got_set == want
    # planted family: texts[120]=substitution, [121]=deletion, [122]=key
    # identical to base[0] after truncation, [123]=2-edit from base[1]
    assert {(0, 120), (0, 121), (0, 122)} <= got_set
    if k == 2:
        assert (1, 123) in want and (1, 123) in got_set


def test_hot_variant_guard(ray_session):
    t = pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "text": pa.array(["identicalkey"] * 40),
    })
    with pytest.raises(Exception):
        edit_distance_dup_pairs(
            rd.from_arrow(t), key_len=12, max_edits=1, max_group=8,
        ).to_pandas()
