"""Inverted-index build (pipelines/textops.py:inverted_index):
brute-force parity, distinct-per-doc semantics, layout invariance."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from deduplidog_ray.pipelines.textops import inverted_index


def _ds(texts, blocks=1):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


_TEXTS = [
    "a b a b c",      # repeats inside a doc count once
    "b c d",
    "a",
    "",               # empty doc contributes nothing
    "d d d",
]


def _want():
    post: dict[str, list[int]] = {}
    for i, t in enumerate(_TEXTS):
        for tok in set(t.split(" ")):
            if tok:
                post.setdefault(tok, []).append(i)
    return {
        tok: (len(ids), ",".join(map(str, sorted(ids))))
        for tok, ids in post.items()
    }


def test_inverted_index_bruteforce_parity(ray_session):
    out = inverted_index(_ds(_TEXTS), partitions=8).to_pandas()
    got = {r.token: (r.df, r.doc_ids) for r in out.itertuples()}
    assert got == _want()
    # spot facts: 'a' in docs 0 and 2 once each despite repeats
    assert got["a"] == (2, "0,2")
    assert got["d"] == (2, "1,4")
    assert "" not in got


def test_layout_invariance(ray_session):
    a = (
        inverted_index(_ds(_TEXTS), partitions=4)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    b = (
        inverted_index(_ds(_TEXTS, blocks=5), partitions=16)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_cross_batch_distinct(ray_session):
    # the same (token, doc) pair arriving from different batches must
    # still count once: split one doc's tokens across rows of the SAME
    # doc_id (simulates chunked ingestion of one logical doc)
    t = pa.table(
        {"doc_id": pa.array([7, 7, 8], pa.int64()),
         "text": pa.array(["x y", "x z", "x"], pa.string())}
    )
    out = inverted_index(
        rd.from_arrow(t).repartition(3), partitions=4
    ).to_pandas()
    got = {r.token: (r.df, r.doc_ids) for r in out.itertuples()}
    assert got["x"] == (2, "7,8")
    assert got["y"] == (1, "7") and got["z"] == (1, "7")
