"""Decontamination vs a brute-force n-gram-overlap oracle.

Semantics: a train doc's contamination count is the number of its
DISTINCT token k-grams present anywhere in the holdout; docs shorter
than k tokens are one whole-doc gram (matching shingle_hashes).
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.decontam import decontaminate, holdout_ngram_set


def _grams(text: str, k: int = 3) -> set:
    toks = text.split()
    if len(toks) < k:
        return {tuple(toks)}
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute(train: dict, holdout: dict, k: int = 3) -> dict:
    hold = set().union(*(_grams(t, k) for t in holdout.values()))
    return {i: len(_grams(t, k) & hold) for i, t in train.items()}


def _tbl(rows: dict) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(list(rows), type=pa.int64()),
            "text": pa.array(list(rows.values()), type=pa.string()),
        }
    )


def test_decontaminate_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    holdout = {
        100 + i: " ".join(rng.choice(vocab, size=int(rng.integers(0, 12))))
        for i in range(6)
    }
    train = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(0, 15))))
        for i in range(40)
    }
    # planted cases: verbatim copy · partial overlap · short doc · empty
    train[90] = holdout[100]                      # full contamination
    train[91] = "zz yy " + holdout[101]           # suffix overlap
    train[92] = "one two"                          # short: whole-doc gram
    holdout[200] = "one two"                       # matching short holdout doc
    train[93] = ""                                 # empty doc

    out = decontaminate(rd.from_arrow(_tbl(train)), rd.from_arrow(_tbl(holdout))).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contaminated"]))
    want = _brute(train, holdout)
    assert got == want
    flags = dict(zip(out["doc_id"], out["contaminated"]))
    assert flags[90] and flags[92]
    assert all(flags[i] == (want[i] >= 1) for i in train)


def test_decontaminate_drop_mode_and_empty_holdout(ray_session):
    train = {1: "a b c d", 2: "x y z w", 3: "a b c q"}
    holdout = {9: "a b c"}
    kept = decontaminate(rd.from_arrow(_tbl(train)), rd.from_arrow(_tbl(holdout)), mode="drop").to_pandas()
    assert sorted(kept["doc_id"]) == [2]          # 1 and 3 share gram (a,b,c)
    # empty holdout: nothing contaminated, set is empty
    assert len(holdout_ngram_set(rd.from_arrow(_tbl({})))) == 0
    allkept = decontaminate(rd.from_arrow(_tbl(train)), rd.from_arrow(_tbl({})), mode="drop").to_pandas()
    assert sorted(allkept["doc_id"]) == [1, 2, 3]


def test_semantic_decontaminate_overlapping_ids(ray_session):
    """Cross-table cosine anti-join; ids may COLLIDE between train and
    holdout (the low-bit side encoding must keep them apart)."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from deduplidog_ray.pipelines.decontam import semantic_decontaminate

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # train: rows 0..3; holdout: one row NEAR train row 1 (same vector,
    # tiny jitter) and one far row — and the holdout row REUSES id 0
    jit = base[1] + 0.01 * rng.normal(size=16).astype(np.float32)
    train = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": [v.tolist() for v in base],
    }))
    holdout = rd.from_pandas(pd.DataFrame({
        "vec_id": np.array([0, 9], dtype=np.int64),
        "embedding": [jit.tolist(), (-base[3]).tolist()],
    }))
    out = semantic_decontaminate(train, holdout, threshold=0.9)
    survivors = sorted(out.to_pandas()["vec_id"])
    # row 1 is contaminated (cos ~ 1 with the jittered holdout row);
    # train row 0 must NOT be dropped just because a holdout row shares
    # its id; -base[3] has cos -1 with row 3 (below threshold)
    assert survivors == [0, 2, 3]
