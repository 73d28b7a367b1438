"""dataset_diff: snapshot added/removed/changed — pandas-reference
parity, hash-compare path equivalence, duplicate-key validation, null
payload handling, layout invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.diff import dataset_diff


def _snapshots(n=800, seed=5):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    old = pd.DataFrame({
        "doc_id": ids,
        "text": [f"doc {i} body" for i in ids],
        "n_chars": rng.integers(10, 500, n).astype(np.int64),
    })
    # new: drop ~1/8, add n//8 fresh ids, mutate text on ~1/5
    keep = rng.random(n) > 0.125
    new = old[keep].copy()
    mut = rng.random(len(new)) < 0.2
    new.loc[mut, "text"] = new.loc[mut, "text"] + " v2"
    fresh = pd.DataFrame({
        "doc_id": np.arange(n, n + n // 8, dtype=np.int64),
        "text": [f"doc {i} body" for i in range(n, n + n // 8)],
        "n_chars": rng.integers(10, 500, n // 8).astype(np.int64),
    })
    return old, pd.concat([new, fresh], ignore_index=True)


def _ref(old, new):
    m = old.merge(new, on="doc_id", how="outer", suffixes=("_o", "_n"),
                  indicator=True)
    status = np.where(m["_merge"] == "left_only", "removed",
                      np.where(m["_merge"] == "right_only", "added",
                               "changed"))
    differs = (
        (m["text_o"] != m["text_n"]) & ~(m["text_o"].isna()
                                         & m["text_n"].isna())
    ) | (
        (m["n_chars_o"] != m["n_chars_n"]) & ~(m["n_chars_o"].isna()
                                               & m["n_chars_n"].isna())
    )
    keep = (m["_merge"] != "both") | differs
    out = m.loc[keep, ["doc_id"]].copy()
    out["status"] = status[keep.to_numpy()]
    return out.sort_values("doc_id").reset_index(drop=True)


def _run(old, new, partitions=7, hash_compare=False):
    return dataset_diff(
        rd.from_pandas(old), rd.from_pandas(new),
        key_cols=["doc_id"], compare_cols=["text", "n_chars"],
        partitions=partitions, hash_compare=hash_compare,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_matches_pandas_reference(ray_session):
    old, new = _snapshots()
    out = _run(old, new)
    ref = _ref(old, new)
    pd.testing.assert_frame_equal(out, ref)
    assert set(out["status"]) == {"added", "removed", "changed"}


def test_hash_compare_path_matches_value_path(ray_session):
    old, new = _snapshots(seed=9)
    a = _run(old, new, hash_compare=False)
    b = _run(old, new, partitions=13, hash_compare=True)
    pd.testing.assert_frame_equal(a, b)


def test_duplicate_keys_raise(ray_session):
    old, _ = _snapshots(n=50)
    dup = pd.concat([old, old.iloc[[0]]], ignore_index=True)
    with pytest.raises(Exception, match="duplicate keys"):
        _run(dup, old, partitions=1)


def test_identical_snapshots_empty_diff(ray_session):
    old, _ = _snapshots(n=200, seed=2)
    out = dataset_diff(
        rd.from_pandas(old), rd.from_pandas(old.copy()),
        key_cols=["doc_id"], compare_cols=["text", "n_chars"],
        partitions=7,
    ).to_pandas()
    assert len(out) == 0


def test_layout_invariance(ray_session):
    old, new = _snapshots(seed=3)
    a = _run(old, new, partitions=4)
    b = _run(old.sample(frac=1.0, random_state=1),
             new.sample(frac=1.0, random_state=2), partitions=19)
    pd.testing.assert_frame_equal(a, b)
