"""hash_join: large x large co-partitioned equi-join semantics.

The shape under test is the module docstring's "explicit bucket-hash
join" made first-class (≙ reference J1, the stem-index dict join,
deduplidog/deduplidog.py:285-288, with both sides distributed): one
keyed shuffle, true-key equality inside each partition, pandas-merge
kernel. Checks: pandas-merge parity for every `how`, duplicate-key fan
out (m x n), left-join null typing stays integer across partitions,
semi/anti return left columns only, and string keys route correctly.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.joins import hash_join


def _left():
    return pa.table(
        {
            "k": pa.array([1, 2, 2, 3, 5], type=pa.int64()),
            "lv": pa.array([10, 20, 21, 30, 50], type=pa.int64()),
            "ls": pa.array(list("abcde")),
        }
    )


def _right():
    return pa.table(
        {
            "k": pa.array([2, 2, 3, 4], type=pa.int64()),
            "rv": pa.array([200, 201, 300, 400], type=pa.int64()),
        }
    )


def _norm(df, cols):
    return (
        df[cols]
        .sort_values(cols, kind="stable")
        .reset_index(drop=True)
        .astype({c: "Int64" for c in cols if df[c].dtype.kind in "if"})
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_merge_parity(ray_session, how):
    out = hash_join(
        rd.from_arrow(_left()), rd.from_arrow(_right()),
        "k", ["lv", "ls"], ["rv"], how=how, partitions=7,
    ).to_pandas()
    ref = _left().to_pandas().merge(_right().to_pandas(), on="k", how=how)
    cols = ["k", "lv", "ls", "rv"]
    num = ["k", "lv", "rv"]
    got = _norm(out.astype({c: "Int64" for c in num}), cols)
    want = _norm(ref.astype({c: "Int64" for c in num}), cols)
    pd.testing.assert_frame_equal(got, want)
    if how == "inner":
        # duplicate keys fan out m x n: k=2 has 2 left x 2 right = 4 rows
        assert (out["k"] == 2).sum() == 4


def test_left_join_null_typing(ray_session):
    """Unmatched left rows must emit NULL (not NaN-as-float) right ints,
    with the SAME Arrow type from every partition."""
    out = hash_join(
        rd.from_arrow(_left()), rd.from_arrow(_right()),
        "k", ["lv"], ["rv"], how="left", partitions=5,
    )
    schema = out.schema()
    assert dict(zip(schema.names, schema.types))["rv"] == pa.int64()
    df = out.to_pandas()
    assert df.loc[df["k"] == 5, "rv"].isna().all()
    assert df.loc[df["k"] == 2, "rv"].notna().all()


def test_semi_anti(ray_session):
    semi = hash_join(
        rd.from_arrow(_left()), rd.from_arrow(_right()),
        "k", ["lv"], [], how="semi", partitions=3,
    ).to_pandas()
    anti = hash_join(
        rd.from_arrow(_left()), rd.from_arrow(_right()),
        "k", ["lv"], [], how="anti", partitions=3,
    ).to_pandas()
    assert sorted(semi["k"]) == [2, 2, 3]
    assert sorted(anti["k"]) == [1, 5]
    # left columns only — no right payload leaks into semi/anti output
    assert set(semi.columns) == {"k", "lv"}
    # semi/anti are row filters: multiplicity of the left side preserved,
    # never multiplied by right-side match count
    assert len(semi) + len(anti) == 5


def test_string_keys_and_empty_side(ray_session):
    l = pa.table({"k": pa.array(["x", "y", "z"]),
                  "lv": pa.array([1, 2, 3], type=pa.int64())})
    r = pa.table({"k": pa.array(["y", "y"]),
                  "rv": pa.array([7, 8], type=pa.int64())})
    out = hash_join(rd.from_arrow(l), rd.from_arrow(r), "k",
                    ["lv"], ["rv"], how="inner", partitions=4).to_pandas()
    assert sorted(map(tuple, out[["k", "rv"]].to_numpy())) == [
        ("y", 7), ("y", 8)
    ]
    empty = r.slice(0, 0)
    out2 = hash_join(rd.from_arrow(l), rd.from_arrow(empty), "k",
                     ["lv"], ["rv"], how="inner", partitions=4)
    assert out2.count() == 0
    out3 = hash_join(rd.from_arrow(l), rd.from_arrow(empty), "k",
                     ["lv"], ["rv"], how="left", partitions=4).to_pandas()
    assert len(out3) == 3 and out3["rv"].isna().all()


def test_column_collision_rejected(ray_session):
    with pytest.raises(ValueError):
        hash_join(rd.from_arrow(_left()), rd.from_arrow(_right()),
                  "k", ["lv"], ["lv"], how="inner")


def test_null_keys_sql_semantics(ray_session):
    """NULL join keys never match (SQL), even though pandas merge would
    happily pair NaN with NaN; null-key left rows survive only under
    left/anti."""
    l = pa.table({
        "k": pa.array([1, None, 2, None], type=pa.int64()),
        "lv": pa.array([10, 11, 20, 21], type=pa.int64()),
    })
    r = pa.table({
        "k": pa.array([1, None], type=pa.int64()),
        "rv": pa.array([100, 999], type=pa.int64()),
    })
    inner = hash_join(rd.from_arrow(l), rd.from_arrow(r), "k",
                      ["lv"], ["rv"], how="inner", partitions=4).to_pandas()
    assert inner["lv"].tolist() == [10] and inner["rv"].tolist() == [100]
    left = hash_join(rd.from_arrow(l), rd.from_arrow(r), "k",
                     ["lv"], ["rv"], how="left", partitions=4).to_pandas()
    assert len(left) == 4
    assert left.set_index("lv")["rv"].notna().to_dict() == {
        10: True, 11: False, 20: False, 21: False
    }
    semi = hash_join(rd.from_arrow(l), rd.from_arrow(r), "k",
                     ["lv"], [], how="semi", partitions=4).to_pandas()
    anti = hash_join(rd.from_arrow(l), rd.from_arrow(r), "k",
                     ["lv"], [], how="anti", partitions=4).to_pandas()
    assert semi["lv"].tolist() == [10]
    assert sorted(anti["lv"]) == [11, 20, 21]


def test_runtime_filter_identical_results(ray_session):
    """The pushdown filter prunes right rows before the shuffle but must
    never change the result — incl. when the key budget forces it off."""
    kw = dict(how="inner", partitions=5)
    base = hash_join(rd.from_arrow(_left()), rd.from_arrow(_right()),
                     "k", ["lv"], ["rv"], **kw).to_pandas()
    filt = hash_join(rd.from_arrow(_left()), rd.from_arrow(_right()),
                     "k", ["lv"], ["rv"], runtime_filter=True,
                     **kw).to_pandas()
    off = hash_join(rd.from_arrow(_left()), rd.from_arrow(_right()),
                    "k", ["lv"], ["rv"], runtime_filter=True,
                    filter_max_keys=1, **kw).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].to_numpy()))
    assert key(base) == key(filt) == key(off)
    # anti join with the filter: pruned right rows must not turn
    # matching left rows into "unmatched"
    anti_f = hash_join(rd.from_arrow(_left()), rd.from_arrow(_right()),
                       "k", ["lv"], [], how="anti",
                       runtime_filter=True).to_pandas()
    assert sorted(anti_f["k"]) == [1, 5]
