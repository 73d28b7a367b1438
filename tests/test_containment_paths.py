"""Parity of the two containment execution plans.

contained_doc_pairs collapses its three exchange rounds into one task
below `small_threshold_bytes` (adaptive execution); this gates that the
small-path and the hash-partitioned path produce identical pairs.
"""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.containment import contained_doc_pairs


def _corpus():
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry numbered crates across a frozen river "
        "delta before dawn breaks over the eastern ridge line today"
    )
    rows = {
        1: base,
        2: "PREFIX " + base + " SUFFIX",          # contains 1
        3: base[10:90],                            # contained in 1 and 2
        4: "completely unrelated text about submarine cables and moss",
        5: "tiny",                                 # short-doc sideband
        6: "PREFIX " + base + " SUFFIX",           # duplicate of 2
    }
    return pa.table(
        {
            "doc_id": pa.array(list(rows), type=pa.int64()),
            "text": pa.array(list(rows.values()), type=pa.string()),
        }
    )


def test_short_doc_sideband_1k(ray_session):
    """1,000 sub-guarantee docs through the multi-pattern sideband
    (VERDICT r2 #4: the old nested Python loop was O(shorts x corpus)
    per row). Exact vs a brute-force reference, including short-in-short
    and short-in-long pairs and an empty-text doc."""
    import numpy as np

    rng = np.random.default_rng(13)
    ids, texts = [], []
    # 1k short docs (< 39 bytes): random 3-token snippets, some planted
    # as substrings of the long docs below, some duplicated
    vocab = [f"w{i:03d}" for i in range(40)]
    long_base = " ".join(rng.choice(vocab, size=120).tolist())
    for i in range(1000):
        if i % 50 == 0:       # planted: a slice of the long doc
            start = int(rng.integers(0, len(long_base) - 30))
            s = long_base[start : start + 20]
        elif i % 97 == 0:     # short contained in another short
            s = "xyzq common core"
        else:
            s = " ".join(rng.choice(vocab, size=3).tolist())[:30]
        ids.append(i)
        texts.append(s)
    ids.append(2000)
    texts.append("")                       # empty text: contained in all
    for j in range(20):                    # long docs, winnowing path
        ids.append(3000 + j)
        texts.append(long_base + f" tail{j}")
    ids.append(4000)
    texts.append("AAA xyzq common core BBB")   # contains the i%97 shorts
    t = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    got_df = contained_doc_pairs(rd.from_arrow(t).repartition(4))
    got = set(map(tuple, got_df.to_numpy().tolist()))
    texts_m = dict(zip(ids, texts))
    want = {
        (a, b)
        for a in texts_m
        for b in texts_m
        if a != b and texts_m[a] in texts_m[b]
    }
    assert got == want


def test_string_ids_rejected_with_guidance(ray_session):
    t = pa.table(
        {"doc_id": pa.array(["x", "y"], type=pa.string()),
         "text": pa.array(["abc", "abcdef"], type=pa.string())}
    )
    import pytest

    with pytest.raises(TypeError, match="integer id column"):
        contained_doc_pairs(rd.from_arrow(t))


def test_small_and_partitioned_paths_match(ray_session):
    t = _corpus()
    small = contained_doc_pairs(rd.from_arrow(t), small_threshold_bytes=10**12)
    parted = contained_doc_pairs(rd.from_arrow(t), small_threshold_bytes=0)

    def norm(df: pd.DataFrame):
        return sorted(map(tuple, df.to_numpy().tolist()))

    assert norm(small) == norm(parted)
    got = set(map(tuple, small.to_numpy().tolist()))
    # ground truth: every ordered substring pair
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {
        (a, b)
        for a in texts
        for b in texts
        if a != b and texts[a] in texts[b]
    }
    assert got == want
