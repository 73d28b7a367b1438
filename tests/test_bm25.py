"""search_bm25_topk: scalar BM25 reference parity (exact doubles),
idf ordering behavior, and block-layout invariance."""

import math
import re

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.textops import search_bm25_topk

VOCAB = ["alpha", "beta", "gamma", "delta", "common"]


def _corpus(n=400, seed=17):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        words = list(rng.choice(VOCAB, size=rng.integers(5, 60),
                                p=[0.1, 0.1, 0.05, 0.05, 0.7]))
        texts.append(" ".join(words))
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
    })


def _ref_bm25(df, terms, k):
    terms = sorted(terms)
    toks = [re.findall(r"\w+", t.lower()) for t in df["text"]]
    n = len(df)
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    idf = {}
    for t in terms:
        dft = sum(1 for d in toks if t in d)
        idf[t] = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
    rows = []
    for i, d in enumerate(toks):
        score = 0.0
        hit = False
        for t in terms:
            tf = d.count(t)
            rel = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl[i] / avgdl)))
            score = score + idf[t] * rel
            hit = hit or tf > 0
        if hit:
            rows.append((int(df["doc_id"].iloc[i]), score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_matches_scalar_reference_bitexact(ray_session):
    df = _corpus()
    out = search_bm25_topk(rd.from_pandas(df), ["gamma", "alpha"], k=15)
    ref = _ref_bm25(df, ["gamma", "alpha"], 15)
    assert out["doc_id"].tolist() == [r[0] for r in ref]
    assert np.array_equal(
        out["score"].to_numpy().view(np.int64),
        np.array([r[1] for r in ref]).view(np.int64),
    )


def test_rare_term_outranks_common(ray_session):
    """A doc matching only the rare term beats one matching only the
    common term at equal tf and dl — the idf property tf-only misses."""
    df = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["gamma filler filler filler",
                 "common filler filler filler"],
    })
    big = _corpus(seed=23)
    all_df = pd.concat([df, big.assign(doc_id=big.doc_id + 10)],
                       ignore_index=True)
    out = search_bm25_topk(rd.from_pandas(all_df), ["gamma", "common"],
                           k=len(all_df))
    s = out.set_index("doc_id")["score"]
    assert s[1] > s[2]


def test_layout_invariance(ray_session):
    df = _corpus(seed=31)
    a = search_bm25_topk(rd.from_pandas(df), ["beta", "delta"], k=10)
    shuffled = rd.from_pandas(
        df.sample(frac=1.0, random_state=0)
    ).repartition(7)
    b = search_bm25_topk(shuffled, ["beta", "delta"], k=10)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.array_equal(a["score"].to_numpy().view(np.int64),
                          b["score"].to_numpy().view(np.int64))
