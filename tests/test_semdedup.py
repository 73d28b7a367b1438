"""SemDeDup: bit-parity vs a driver-side numpy reference implementing
the same spec, keep-rule (lowest centroid-cosine survives), layout
invariance, and degenerate-cluster safety."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.semdedup import (
    semantic_dedup,
    semantic_dedup_reference,
)


def _fixture(seed: int = 3):
    """4 well-separated axis cones; cones 0 and 2 carry planted duplicate
    families (pairwise cos ≈ 0.9996 ≫ threshold, but clearly distinct
    centroid-cosines so the keep rule is exercised, not tie-broken)."""
    rng = np.random.default_rng(seed)
    d, per = 16, 40
    rows, fams = [], []
    next_id = 1000
    for c in range(4):
        base = np.zeros(d)
        base[c] = 1.0
        pts = base + 0.30 * rng.normal(size=(per, d))
        ids = np.arange(next_id, next_id + per)
        next_id += per + 7
        rows.append((ids, pts))
        if c in (0, 2):  # planted family: base + increasing tiny nudges
            fam = np.stack([base + 0.001 * (i + 1) * np.eye(d)[5]
                            for i in range(4)])
            fids = np.arange(next_id, next_id + 4)
            next_id += 11
            rows.append((fids, fam))
            fams.append(list(map(int, fids)))
    ids = np.concatenate([r[0] for r in rows]).astype(np.int64)
    mat = np.vstack([r[1] for r in rows]).astype(np.float32)
    perm = rng.permutation(len(ids))
    return ids[perm], mat[perm], fams


def _tbl(ids, mat):
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
        }
    )


PARAMS = dict(k=4, threshold=0.97, iters=5)


def test_matches_reference(ray_session):
    ids, mat, _ = _fixture()
    got = (
        semantic_dedup(rd.from_arrow(_tbl(ids, mat)), **PARAMS)
        .to_pandas()
        .set_index("vec_id")
    )
    want = semantic_dedup_reference(ids, mat, **PARAMS)
    assert len(got) == len(ids)
    assert dict(zip(got.index.astype(int), got["keep"])) == want


def test_keep_rule_lowest_centroid_cosine(ray_session):
    ids, mat, fams = _fixture()
    df = (
        semantic_dedup(rd.from_arrow(_tbl(ids, mat)), **PARAMS)
        .to_pandas()
        .set_index("vec_id")
    )
    for fam in fams:
        sub = df.loc[fam]
        assert int(sub["keep"].sum()) == 1  # exactly one survivor
        kept = sub[sub["keep"]].index[0]
        assert np.isclose(
            sub.loc[kept, "ccos"], sub["ccos"].min()
        ), (kept, sub["ccos"])


def test_layout_invariance(ray_session):
    ids, mat, _ = _fixture(seed=9)
    outs = []
    for par in (1, 6):
        ds = rd.from_arrow(_tbl(ids, mat)).repartition(par)
        df = semantic_dedup(ds, **PARAMS).to_pandas()
        outs.append(
            set(df.loc[df["keep"], "vec_id"].astype(int))
        )
    assert outs[0] == outs[1]


def test_no_duplicates_means_all_kept(ray_session):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(30, 16)).astype(np.float32)  # random ≈ orthogonal
    ids = np.arange(30, dtype=np.int64)
    df = semantic_dedup(
        rd.from_arrow(_tbl(ids, mat)), k=3, threshold=0.99, iters=3
    ).to_pandas()
    assert bool(df["keep"].all())
    assert len(df) == 30
