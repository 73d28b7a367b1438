"""Property gates for the layout / repetition / scrub kernels.

The oracle-parity tests (test_queries_oracle.py) pin these operators to
DuckDB on the driver corpus; these tests pin the KERNEL semantics on
adversarial inputs the corpus doesn't contain — oversized docs, empty
docs, pattern-shaped text — and the invariants that make the designs
scale-safe (bijective shuffle keys, greedy maximality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deduplidog_ray.pipelines.layout import _KNUTH32, _MOD32, _greedy_fill, _shuffle_key


# ------------------------------------------------------------- seq_pack

@pytest.mark.parametrize("seed", range(6))
def test_greedy_fill_invariants(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    cap = int(rng.integers(8, 600))
    toks = rng.integers(0, cap * 2, size=n).astype(np.int64)  # incl. oversized
    bins = _greedy_fill(toks, cap)

    assert len(bins) == n
    # bin ids are 0-based, contiguous, non-decreasing
    assert bins[0] == 0
    steps = np.diff(bins)
    assert ((steps == 0) | (steps == 1)).all()

    sums = np.bincount(bins, weights=toks).astype(np.int64)
    sizes = np.bincount(bins)
    # a bin exceeds cap only when it is a single oversized doc
    over = sums > cap
    assert (sizes[over] == 1).all()
    # greedy maximality: the first doc of bin k+1 would not have fit in k
    firsts = np.searchsorted(bins, np.arange(1, bins[-1] + 1))
    assert (sums[:-1] + toks[firsts] > cap).all()


def test_greedy_fill_degenerate():
    assert list(_greedy_fill(np.array([], dtype=np.int64), 10)) == []
    assert list(_greedy_fill(np.array([0, 0, 0], dtype=np.int64), 1)) == [0, 0, 0]
    assert list(_greedy_fill(np.array([5], dtype=np.int64), 1)) == [0]


# -------------------------------------------------------- epoch_shuffle

def test_shuffle_key_bijective_sample():
    """Odd multiplier mod 2^32 is a permutation — no collisions on any
    distinct-id sample, so ORDER BY key is tie-free by construction."""
    ids = np.concatenate(
        [np.arange(100_000), np.array([2**31 - 1, 2**32 - 1, 12345678])]
    ).astype(np.int64)
    keys = _shuffle_key(ids)
    assert len(np.unique(keys)) == len(ids)
    assert (keys < _MOD32).all()
    # matches the SQL bigint arithmetic expression exactly
    assert (
        keys.astype(object) == (ids.astype(object) * int(_KNUTH32)) % int(_MOD32)
    ).all()


def test_epoch_shuffle_is_permutation(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.layout import epoch_shuffle

    ids = pa.table({"doc_id": pa.array(np.arange(977, dtype=np.int64) * 7)})
    out = (
        epoch_shuffle(ray.data.from_arrow(ids).repartition(5))
        .to_pandas()
        .sort_values("pos")
    )
    assert list(out["pos"]) == list(range(977))
    # deterministic across layouts
    out2 = (
        epoch_shuffle(ray.data.from_arrow(ids).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.reset_index(drop=True),
    )


# ---------------------------------------------------------------- scrub

def test_scrub_counts_and_idempotence(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.scrub import scrub

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "mail a@b.co and c.d+x@e-f.org now",
                    "call +1-555-0100 or 44-202-7946-0958",
                    "host 10.0.0.1 peer 192.168.255.254",
                    None,
                ]
            ),
        }
    )
    out = (
        scrub(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_email"] == 2
    assert out.loc[0, "scrubbed"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[1, "n_phone"] == 2
    assert out.loc[1, "scrubbed"] == "call <PHONE> or <PHONE>"
    assert out.loc[2, "n_ipv4"] == 2
    assert out.loc[2, "scrubbed"] == "host <IP> peer <IP>"
    assert out.loc[3, "scrubbed"] == ""

    # idempotent: placeholders match no pattern, so a second pass is a no-op
    again = (
        scrub(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                        "text": pa.array(out["scrubbed"].tolist()),
                    }
                )
            )
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (again["scrubbed"] == out["scrubbed"]).all()
    assert (again[["n_email", "n_phone", "n_ipv4"]].to_numpy() == 0).all()


# ----------------------------------------------------- repetition kernel

def test_doc_repetition_crafted(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.repetition import doc_repetition

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "a a a b c",          # top=3(a), dup=3, n=5
                    "x y z",              # no repeats
                    "w w w w",            # all one token
                ]
            ),
        }
    )
    df = (
        doc_repetition(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[0].tolist() == [5, 3, 3 / 5, 3]
    assert df.loc[1].tolist() == [3, 1, 1 / 3, 0]
    assert df.loc[2].tolist() == [4, 4, 1.0, 4]


def test_lm_score_bounds_and_layout_invariance(ray_session):
    import ray.data

    from deduplidog_ray.pipelines.repetition import lm_score

    rng = np.random.default_rng(0)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "rare"])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30), p=[0.4, 0.3, 0.2, 0.09, 0.01]))
        for _ in range(120)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    a = (
        lm_score(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert ((a["mean_unigram_p"] > 0) & (a["mean_unigram_p"] <= 1)).all()
    b = (
        lm_score(ray.data.from_arrow(t).repartition(7))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_clips_pack_boundaries(ray_session):
    """Cap boundary exactly honored; an oversized clip gets its own bin;
    rate groups pack independently."""
    import pandas as pd
    import ray.data as rd

    from deduplidog_ray.pipelines.layout import clips_pack

    rows = [
        ("a1", 8000, 10_000), ("a2", 8000, 20_000),   # 30 000 = cap: same
        ("a3", 8000, 1),                              # next ms spills
        ("a4", 8000, 99_000),                         # oversized: own bin
        ("a5", 8000, 2_000),
        ("b1", 16000, 29_999), ("b2", 16000, 1),      # other rate: fresh
    ]
    out = clips_pack(rd.from_pandas(pd.DataFrame(
        rows, columns=["clip_id", "sr_hz", "dur_ms"]
    ))).to_pandas().set_index("clip_id")
    b = out["bin_id"]
    assert b["a1"] == b["a2"] == 0
    assert b["a3"] == 1
    assert b["a4"] == 2          # > cap: a bin of its own
    assert b["a5"] == 3          # the walk resumes after the jumbo
    assert b["b1"] == b["b2"] == 0
    # per-group duration never exceeds the cap except for jumbo singletons
    g = out.groupby(["sr_hz", "bin_id"])["dur_ms"]
    assert ((g.sum() <= 30_000) | (g.count() == 1)).all()
