"""rollup_agg: hierarchical subtotals derived exactly from one
distributed leaf aggregate — pandas-reference parity, genuine-NULL key
vs subtotal-row disambiguation via lvl, float value refusal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.stats import rollup_agg


def _t():
    return pa.table({
        "a": pa.array(["x", "x", "y", "y", None]),
        "b": pa.array(["p", "q", "p", "p", "p"]),
        "v": pa.array([1, 2, 4, 8, 16], type=pa.int64()),
    })


def test_rollup_levels(ray_session):
    out = rollup_agg(rd.from_arrow(_t()), ["a", "b"], "v")
    # leaf: 4 groups (incl. the genuine-NULL a); a-level: 3; total: 1
    assert dict(out["lvl"].value_counts()) == {0: 4, 1: 3, 2: 1}
    total = out[out["lvl"] == 2]
    assert int(total["n_rows"].iloc[0]) == 5
    assert int(total["sum_val"].iloc[0]) == 31
    a_lvl = out[out["lvl"] == 1].set_index("a")
    assert int(a_lvl.loc["x", "sum_val"]) == 3
    assert int(a_lvl.loc["y", "sum_val"]) == 12
    # the genuine NULL key is a REAL group at lvl 0 and lvl 1 — only the
    # lvl column separates it from subtotal rows
    null_leaf = out[(out["lvl"] == 0) & (out["a"].isna())]
    assert len(null_leaf) == 1 and int(null_leaf["sum_val"].iloc[0]) == 16
    assert int(a_lvl.loc[np.nan, "sum_val"]) == 16


def test_rollup_matches_pandas_reference(ray_session):
    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(list("abcd"), n),
        "b": rng.choice(list("uvw"), n),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    out = rollup_agg(rd.from_arrow(pa.Table.from_pandas(df)), ["a", "b"],
                     "v")
    leaf = out[out["lvl"] == 0].set_index(["a", "b"]).sort_index()
    ref = df.groupby(["a", "b"]).agg(n_rows=("v", "size"),
                                     sum_val=("v", "sum")).sort_index()
    assert (leaf["sum_val"] == ref["sum_val"]).all()
    assert (leaf["n_rows"] == ref["n_rows"]).all()
    assert int(out[out["lvl"] == 2]["sum_val"].iloc[0]) == int(df["v"].sum())


def test_float_value_refused(ray_session):
    t = pa.table({"a": pa.array(["x"]), "v": pa.array([1.5])})
    with pytest.raises(TypeError):
        rollup_agg(rd.from_arrow(t), ["a"], "v")


def test_cube_levels(ray_session):
    from deduplidog_ray.pipelines.stats import cube_agg

    out = cube_agg(rd.from_arrow(_t()), ["a", "b"], "v")
    # bitmask levels: 0=leaf, 1=(a), 2=(b), 3=total
    assert set(out["lvl"].unique()) == {0, 1, 2, 3}
    b_lvl = out[out["lvl"] == 2].set_index("b")
    assert int(b_lvl.loc["p", "sum_val"]) == 29   # 1+4+8+16
    assert int(b_lvl.loc["q", "sum_val"]) == 2
    assert int(out[out["lvl"] == 3]["sum_val"].iloc[0]) == 31
    # (a)-subtotals and (b)-subtotals never collide even though both
    # roll exactly one column
    a_lvl = out[out["lvl"] == 1]
    assert a_lvl["b"].isna().all() and a_lvl["a"].notna().sum() == 2


def test_dup_gram_ratio_bruteforce(ray_session):
    from collections import Counter

    from deduplidog_ray.pipelines.repetition import dup_gram_ratio

    texts = [
        "a b c d e",          # shares grams with doc 1
        "a b c x y",          # 'a b c' duplicated
        "u v w z q",          # unique
        "a b",                # too short: no grams, no row
        "u v w z q",          # exact dup of doc 2
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(texts),
    })
    out = dup_gram_ratio(rd.from_arrow(t), k=3).to_pandas().set_index(
        "doc_id"
    )
    # brute force
    def grams(s):
        ts = s.split()
        return {tuple(ts[i:i + 3]) for i in range(len(ts) - 2)}

    docs_per = Counter()
    for s in texts:
        for g in grams(s):
            docs_per[g] += 1
    for i, s in enumerate(texts):
        gs = grams(s)
        if not gs:
            assert i not in out.index
            continue
        nd = sum(1 for g in gs if docs_per[g] >= 2)
        assert int(out.loc[i, "n_grams"]) == len(gs)
        assert int(out.loc[i, "n_dup"]) == nd
        assert out.loc[i, "dup_ratio"] == nd / len(gs)
