"""Recall gates for the approximate similarity paths (VERDICT r1 #7).

Both LSH operators are measured against exact in-repo oracles at
sf0.001: banded near-dup vs the brute-force cosine pair set, multi-table
kNN vs ``knn_cosine_bruteforce`` (itself SQL-oracle-verified).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
EMB = f"{SF_DIR}/embeddings.parquet"


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table(EMB, columns=["vec_id", "embedding"])
    from deduplidog_ray.pipelines.similarity import _normalize

    m = _normalize(
        np.stack([np.asarray(x) for x in t["embedding"].to_pylist()]).astype(
            np.float64
        )
    )
    return t["vec_id"].to_numpy(), m


def test_embedding_near_dup_recall(ray_session, corpus):
    import ray.data as rd

    from deduplidog_ray.pipelines.similarity import embedding_near_dup_pairs

    ids, m = corpus
    threshold = 0.35  # synthetic corpus: max off-diagonal cosine ~0.48
    sims = m @ m.T
    iu = np.triu_indices(len(ids), 1)
    mask = sims[iu] >= threshold
    want = set(zip(ids[iu[0][mask]], ids[iu[1][mask]]))
    assert want, "oracle should produce pairs at this threshold"

    ds = rd.read_parquet(EMB, columns=["vec_id", "embedding"])
    got = embedding_near_dup_pairs(
        ds, threshold=threshold, bands=32, bits_per_band=4
    ).to_pandas()
    gotset = set(zip(got["a"], got["b"]))
    recall = len(gotset & want) / len(want)
    assert recall >= 0.95, (recall, len(want))
    # the verify stage is exact: no false positives, ever
    assert not (gotset - want)


def test_knn_lsh_recall(ray_session, corpus):
    import ray.data as rd

    from deduplidog_ray.pipelines.similarity import (
        knn_cosine_bruteforce,
        knn_cosine_lsh,
    )

    t = pq.read_table(EMB)
    qdf = t.slice(0, 3).to_pandas().sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = rd.read_parquet(EMB, columns=["vec_id", "embedding"])
    bf = knn_cosine_bruteforce(ds, queries, k=10, dtype=np.float64)
    lsh = knn_cosine_lsh(ds, queries, k=10)
    bfset = set(zip(bf["query_idx"], bf["vec_id"]))
    lshset = set(zip(lsh["query_idx"], lsh["vec_id"]))
    assert len(lsh) == len(bf)
    recall = len(bfset & lshset) / len(bfset)
    assert recall >= 0.8, recall


def test_knn_ivf_recall(ray_session, corpus):
    import ray.data as rd

    from deduplidog_ray.pipelines.similarity import (
        knn_cosine_bruteforce,
        knn_cosine_ivf,
    )

    t = pq.read_table(EMB)
    qdf = t.slice(0, 3).to_pandas().sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = rd.read_parquet(EMB, columns=["vec_id", "embedding"])
    bf = knn_cosine_bruteforce(ds, queries, k=10, dtype=np.float64)
    ivf = knn_cosine_ivf(ds, queries, k=10)
    bfset = set(zip(bf["query_idx"], bf["vec_id"]))
    ivfset = set(zip(ivf["query_idx"], ivf["vec_id"]))
    assert len(ivf) == len(bf)
    recall = len(bfset & ivfset) / len(bfset)
    assert recall >= 0.8, recall


def test_byte_threshold_routes_wide_embeddings(ray_session, monkeypatch):
    """VERDICT r2 #5: routing is by MATERIAL bytes, not rows — a wide
    embedding table with few rows must take the partitioned path when it
    exceeds the byte bound (the old 2M-ROW bound would have sent ~6 GB
    of 768-dim vectors into one task)."""
    import pyarrow as pa

    import ray.data as rd

    from deduplidog_ray.pipelines import similarity as sim

    rng = np.random.default_rng(3)
    n, dim = 400, 1024                      # ~1.6 MB — few rows, wide
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    mat[1] = mat[0]                         # one planted near-dup pair
    t = pa.table(
        {"vec_id": pa.array(np.arange(n)),
         "embedding": pa.array(list(mat), type=pa.list_(pa.float32()))}
    )
    ds = rd.from_arrow(t)
    assert ds.size_bytes() > 1 << 20

    class _Boom:
        def remote(self, *a, **k):
            raise AssertionError("wide dataset routed to the small path")

    monkeypatch.setattr(sim, "_emb_neardup_small_task", _Boom())
    out = sim.embedding_near_dup_pairs(
        ds, threshold=0.95, small_threshold_bytes=1 << 20
    ).to_pandas()
    assert {(0, 1)} == set(zip(out["a"], out["b"]))


def test_embedding_near_dup_path_parity(ray_session):
    """Small-path (one task) and partitioned-path results are identical."""
    import ray.data as rd

    from deduplidog_ray.pipelines.similarity import embedding_near_dup_pairs

    kw = dict(threshold=0.35, bands=32, bits_per_band=4)
    small = (
        embedding_near_dup_pairs(
            rd.read_parquet(EMB, columns=["vec_id", "embedding"]), **kw
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    parted = (
        embedding_near_dup_pairs(
            rd.read_parquet(EMB, columns=["vec_id", "embedding"]),
            small_threshold_bytes=0,
            **kw,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(small) == len(parted) and len(small) > 0
    assert (small["a"] == parted["a"]).all()
    assert (small["b"] == parted["b"]).all()
    assert np.allclose(small["cos"], parted["cos"])


class TestNNSelfJoin:
    """nn_self_join: every row's top-k OTHER neighbors, exact."""

    def _brute(self, m, ids, k):
        sims = m @ m.T
        sims[ids[:, None] == ids[None, :]] = -np.inf
        out = {}
        for i in range(len(ids)):
            order = np.lexsort((ids, -sims[i]))[:k]
            out[int(ids[i])] = [int(ids[j]) for j in order]
        return out

    def test_bruteforce_parity_and_dup_vectors(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from deduplidog_ray.pipelines.similarity import (
            _normalize, nn_self_join,
        )

        rng = np.random.default_rng(3)
        m = rng.normal(size=(60, 8))
        m[7] = m[3]          # exact duplicate vectors, distinct ids
        ids = np.arange(100, 160, dtype=np.int64)
        t = pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })
        out = nn_self_join(rd.from_arrow(t), k=3).to_pandas()
        mm = _normalize(
            np.stack([np.asarray(r, dtype=np.float64) for r in
                      t["embedding"].to_pylist()])
        )
        want = self._brute(mm, ids, 3)
        got = {
            int(v): g.sort_values("rn")["nn_id"].tolist()
            for v, g in out.groupby("vec_id")
        }
        assert got == want
        # the duplicate pair must be each other's top-1 (exclusion is by
        # id, not by vector equality)
        assert got[103][0] == 107 and got[107][0] == 103

    def test_layout_invariance(self, ray_session):
        import pyarrow as pa
        import ray
        import ray.data as rd

        from deduplidog_ray.pipelines.similarity import nn_self_join

        rng = np.random.default_rng(5)
        m = rng.normal(size=(40, 6)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })

        def run(ds):
            df = nn_self_join(ds, k=2).to_pandas()
            return sorted(map(tuple, df.to_numpy()))

        a = run(rd.from_arrow(t))
        parts = [t.slice(0, 13), t.slice(13, 20), t.slice(33, 7)]
        b = run(rd.from_arrow_refs([ray.put(p) for p in parts]))
        assert a == b
