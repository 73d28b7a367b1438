"""Generalized suffix array: construction, queries, and pipeline parity.

The SA kernel (`stages/suffixes.py`) is the exact-verify alternative to
per-pair substring scans in `contained_doc_pairs` (SURVEY §2.8's
suffix-array axis ≙ the reference's shrunk/partial-copy duplicate case).
Correctness bar: bit-identical pairs vs brute-force `in` on randomized
corpora, and vs the `verify="chars"` kernel through the full pipeline.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.stages.suffixes import (
    GeneralizedSuffixArray,
    gsa_containment_pairs,
    suffix_array,
)
from deduplidog_ray.pipelines.containment import contained_doc_pairs


def test_suffix_array_matches_naive_sort():
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(0, 60))
        s = rng.integers(1, 5, size=n)
        sa = suffix_array(s)
        naive = sorted(range(n), key=lambda i: tuple(s[i:]))
        assert list(sa) == naive


def test_suffix_array_degenerate_inputs():
    assert list(suffix_array(np.array([], dtype=np.int64))) == []
    # all-equal symbols: suffixes sort by decreasing start position
    assert list(suffix_array(np.ones(6, dtype=np.int64))) == [5, 4, 3, 2, 1, 0]


def test_gsa_containment_matches_bruteforce_random():
    rng = np.random.default_rng(42)
    for _ in range(150):
        k = int(rng.integers(1, 12))
        texts = [
            "".join(rng.choice(list("abc"), size=int(rng.integers(0, 16))))
            for _ in range(k)
        ]
        ids = np.arange(100, 100 + k)
        a, b = gsa_containment_pairs(ids, texts)
        got = set(zip(a.tolist(), b.tolist()))
        want = {
            (100 + i, 100 + j)
            for i in range(k)
            for j in range(k)
            if i != j and texts[i] in texts[j]
        }
        assert got == want


def test_gsa_unicode_and_duplicates():
    texts = ["naïve café", "the naïve café reopened", "naïve café",
             "unrelated", ""]
    ids = np.array([1, 2, 3, 4, 5])
    a, b = gsa_containment_pairs(ids, texts)
    got = set(zip(a.tolist(), b.tolist()))
    want = {
        (i, j)
        for i, ti in zip(ids.tolist(), texts)
        for j, tj in zip(ids.tolist(), texts)
        if i != j and ti in tj
    }
    assert got == want
    # '' is contained in everything (SQL position('' IN x) = 1)
    assert {(5, 1), (5, 2), (5, 3), (5, 4)} <= got


def test_find_containers_no_cross_boundary_match():
    # "ab|cd" concatenation must NOT match pattern "bc" across the sentinel
    gsa = GeneralizedSuffixArray(np.array([1, 2]), ["ab", "cd"])
    assert len(gsa.find_containers("bc")) == 0
    assert list(gsa.find_containers("ab")) == [1]
    assert list(gsa.find_containers("d")) == [2]


def test_pipeline_sa_verify_parity(ray_session):
    from tests.test_containment_paths import _corpus

    t = _corpus()

    def norm(df: pd.DataFrame):
        return sorted(map(tuple, df.to_numpy().tolist()))

    for thr in (10**9, 0):  # small-task path and partitioned path
        chars = contained_doc_pairs(
            rd.from_arrow(t), small_threshold_bytes=thr, verify="chars"
        )
        sa = contained_doc_pairs(
            rd.from_arrow(t), small_threshold_bytes=thr, verify="sa"
        )
        assert norm(chars) == norm(sa)
