"""BPE training/encoding + bigram counts (pipelines/bpe.py): merge-table
parity vs hand-derivable corpora, determinism across layouts, encoder ≡
training segmentation, and combiner-count correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplidog_ray.pipelines.bpe import (
    BpeEncoder,
    bigram_counts,
    bpe_token_counts,
    train_bpe,
)


def _ds(texts, blocks=1):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_train_bpe_hand_checked(ray_session):
    # corpus: 'low' x5, 'lower' x2 — the classic Sennrich example shape
    texts = ["low low low", "low low lower", "lower"]
    m = train_bpe(_ds(texts), n_merges=4)
    # 'lo' wins first (count 7); then 'lo'+'w' (7); then w</w> vs lower…
    assert list(m.itertuples(index=False, name=None))[:2] == [
        (0, "l", "o", "lo"),
        (1, "lo", "w", "low"),
    ]
    # rank 2: 'low</w>' (count 5) beats 'low'+'e' (2)
    assert tuple(m.iloc[2][["left", "right"]]) == ("low", "</w>")


def test_layout_and_order_invariance(ray_session):
    texts = [f"tok{i % 7} tok{(i * 3) % 7} tok{i % 5}" for i in range(60)]
    a = train_bpe(_ds(texts), n_merges=10)
    b = train_bpe(_ds(list(reversed(texts)), blocks=7), n_merges=10)
    pd.testing.assert_frame_equal(a, b)


def test_encoder_reproduces_training_segmentation(ray_session):
    texts = ["banana band bandana", "ban banana and sand", "sandal and"]
    m = train_bpe(_ds(texts), n_merges=12)
    enc = BpeEncoder(m)
    words = sorted({w for t in texts for w in t.split()})
    for w in words:
        seq = enc.encode_word(w)
        # lossless: concatenation gives the word + terminal marker
        assert "".join(seq) == w + "</w>"
    # distinct words segment differently only where merges differ
    assert enc.encode_word("banana") != enc.encode_word("bandana")


def test_bpe_token_counts_conserve(ray_session):
    texts = ["aa ab aa", "ab aa b"]
    m = train_bpe(_ds(texts), n_merges=3)
    out = bpe_token_counts(_ds(texts, blocks=2), m, concurrency=(1, 2))
    got = {r["token"]: r["n"] for r in out.take_all()}
    enc = BpeEncoder(m)
    want: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            for tok in enc.encode_word(w):
                want[tok] = want.get(tok, 0) + 1
    assert got == want


def test_bigram_counts_vs_bruteforce(ray_session):
    texts = ["a b a b c", "b c", "a", "", "c c c"]
    out = bigram_counts(_ds(texts, blocks=3)).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    want: dict[tuple[str, str], int] = {}
    for t in texts:
        toks = t.split(" ")
        for x, y in zip(toks, toks[1:]):
            want[(x, y)] = want.get((x, y), 0) + 1
    # '' docs produce single-token [''] → no pairs
    assert got == {k: v for k, v in want.items()}
    assert int(out["n"].sum()) == sum(want.values())
    assert got[("c", "c")] == 2 and got[("a", "b")] == 2


def test_early_stop_below_min_pair_count(ray_session):
    m = train_bpe(_ds(["x y", "z w"]), n_merges=10, min_pair_count=2)
    assert len(m) == 0  # every pair unique → nothing reaches the floor
