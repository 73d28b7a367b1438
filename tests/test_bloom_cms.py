"""Bloom + Count-Min sketches (pipelines/sketches.py): no-false-negative
guarantee vs the exact decontamination path, FP-rate bound, OR-merge /
linearity bit equality across layouts, and CMS error bounds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from deduplidog_ray.pipelines.decontam import decontaminate
from deduplidog_ray.pipelines.sketches import (
    bloom_contains,
    build_ngram_bloom,
    cms_estimate,
    cms_token_counts,
    decontaminate_bloom,
)


def _corpus(seed=7, n=120, planted=15):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    hold = [" ".join(rng.choice(vocab, 12)) for _ in range(30)]
    train = [" ".join(rng.choice(vocab, 20)) for _ in range(n)]
    # plant holdout 3-grams into some train docs (true contamination)
    for i in range(planted):
        src = hold[i % len(hold)].split()
        j = int(rng.integers(0, len(src) - 3))
        t = train[i].split()
        train[i] = " ".join(t[:5] + src[j : j + 3] + t[5:])
    return train, hold


def _ds(texts, blocks=1):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_bloom_no_false_negatives_vs_exact(ray_session):
    train, hold = _corpus()
    exact = (
        decontaminate(_ds(train), _ds(hold), k=3)
        .to_pandas()
        .set_index("doc_id")
    )
    approx = (
        decontaminate_bloom(_ds(train, blocks=4), _ds(hold, blocks=3), k=3)
        .to_pandas()
        .set_index("doc_id")
    )
    # every exactly-contaminated doc is flagged, with >= the exact hits
    ex = exact[exact["contaminated"]]
    assert bool(approx.loc[ex.index, "contaminated"].all())
    assert (
        approx.loc[ex.index, "n_hits_est"].to_numpy()
        >= ex["n_contaminated"].to_numpy()
    ).all()
    assert int(ex["contaminated"].sum()) >= 10  # non-vacuous plant


def test_bloom_fp_rate_within_bound(ray_session):
    train, hold = _corpus()
    exact = decontaminate(_ds(train), _ds(hold), k=3).to_pandas()
    approx = decontaminate_bloom(
        _ds(train), _ds(hold), k=3, log2_bits=22
    ).to_pandas()
    # at 2^22 bits over a few hundred grams, FP probability ~ 0 —
    # flags must match the exact path outright
    assert (
        approx["contaminated"].to_numpy()
        == exact["contaminated"].to_numpy()
    ).all()
    # tiny filter (2^8 bits): FPs appear but never FNs
    tiny = decontaminate_bloom(
        _ds(train), _ds(hold), k=3, log2_bits=8, n_hashes=2
    ).to_pandas()
    assert (
        tiny["contaminated"].to_numpy() >= exact["contaminated"].to_numpy()
    ).all()


def test_bloom_or_merge_layout_invariant(ray_session):
    _, hold = _corpus()
    a = build_ngram_bloom(_ds(hold, blocks=1), k=3, log2_bits=16)
    b = build_ngram_bloom(_ds(list(reversed(hold)), blocks=7), k=3,
                          log2_bits=16)
    assert np.array_equal(a, b)  # OR-merge: layout cannot change a bit
    # membership probe agrees with construction
    from deduplidog_ray.stages.signatures import shingle_hashes

    flat, _ = shingle_hashes(hold, 3, 0x5EED)
    assert bloom_contains(a, np.unique(flat), 7).all()


def test_cms_linearity_and_bounds(ray_session):
    train, _ = _corpus(n=200)
    sk1, seeds = cms_token_counts(_ds(train, blocks=1), width=1 << 10)
    sk2, _ = cms_token_counts(
        _ds(list(reversed(train)), blocks=9), width=1 << 10
    )
    # CMS is linear: partial sums == single pass, bit for bit
    assert np.array_equal(sk1, sk2)
    # estimates: >= truth always, <= truth + eN with e = e/width
    from collections import Counter

    from deduplidog_ray.stages.hashing import hash_strings_u64

    true = Counter(w for t in train for w in t.split())
    toks = sorted(true)
    est = cms_estimate(sk1, hash_strings_u64(toks, seed=0xC0DE), seeds)
    tv = np.array([true[w] for w in toks])
    assert (est >= tv).all()
    n_total = int(tv.sum())
    assert (est - tv <= np.e / (1 << 10) * n_total + 1).all()
    # a 40-word vocab at width 1024: collisions rare → mostly exact
    assert (est == tv).mean() >= 0.9
