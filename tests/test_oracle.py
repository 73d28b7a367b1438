"""Oracle semantics tests — the single-process ground truth (no Ray).

≙ the reference's golden-outcome fixtures (tests/setup.py:119-133 asserting
exactly which files are affected and that everything else is untouched).
"""

import collections

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.oracle import oracle_clusters, oracle_pairs


def _by_label(golden):
    d = collections.defaultdict(list)
    for cid, lab in golden.items():
        d[lab].append(cid)
    return d


def test_planted_clusters_coclustered(corpus):
    table, golden = corpus
    cfg = DedupConfig()
    pairs = oracle_pairs(table, cfg)
    cl = oracle_clusters(pairs)
    for lab, members in _by_label(golden).items():
        if len(members) < 2 or lab.endswith("neg"):
            continue
        roots = {cl.get(m, m) for m in members}
        assert len(roots) == 1, f"planted cluster {lab} split: {roots}"


def test_negative_controls_no_direct_pairs(corpus):
    """The base clip must never DIRECTLY pair with its planted negatives.

    (Transitive merges through the contained sub-clip are legitimate
    containment semantics — SURVEY.md §7 decision 1 accepts transitive
    closure; this test pins the pairwise predicate like the reference's
    ±3599/3600/3601 s boundary fixtures.)
    """
    table, golden = corpus
    cfg = DedupConfig()
    pairs = oracle_pairs(table, cfg)
    by = _by_label(golden)
    for lab, negs in by.items():
        if not lab.endswith("neg"):
            continue
        base_label = lab.rsplit("_", 1)[0]
        base_orig = min(by[base_label])       # the original base clip
        for neg in negs:
            key = (base_orig, neg) if base_orig < neg else (neg, base_orig)
            assert key not in pairs, f"negative {lab} paired with base: {pairs[key]}"


def test_singletons_stay_singletons(corpus):
    table, golden = corpus
    cfg = DedupConfig()
    cl = oracle_clusters(oracle_pairs(table, cfg))
    for cid, lab in golden.items():
        if lab.startswith("singleton"):
            assert cid not in cl or cl[cid] == cid


def test_poison_row_excluded(corpus):
    table, golden = corpus
    cfg = DedupConfig()
    pairs = oracle_pairs(table, cfg)
    poison = [c for c, l in golden.items() if l == "poison"]
    for a, b in pairs:
        assert a not in poison and b not in poison


def test_reason_mix(corpus):
    table, golden = corpus
    cfg = DedupConfig()
    reasons = collections.Counter(oracle_pairs(table, cfg).values())
    assert reasons["exact"] >= 6              # one exact copy per cluster
    assert reasons["jaccard"] > 0
    assert reasons["contain"] > 0
