"""Skinny two-exchange parity vs the payload (hive) exchange.

The keys-only exchange (stages/pairgen.py) must produce the same duplicate
clusters as the payload exchange — same candidate segments, same kernel —
on both a plain corpus and a hot-key (salted) corpus.
"""

import collections

from dataclasses import replace

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.fixtures import make_corpus
from deduplidog_ray.pipelines.dedup import NearDupPipeline


def _clusters(table, cfg):
    import ray.data as rd

    res = NearDupPipeline(cfg).run(rd.from_arrow(table)).to_pandas()
    groups = collections.defaultdict(set)
    for cid, cl in zip(res["clip_id"], res["cluster_id"]):
        groups[cl].add(cid)
    return sorted(frozenset(g) for g in groups.values())


def _with_exchange(cfg, name):
    return replace(cfg, execution=replace(cfg.execution, exchange=name))


def test_skinny_matches_hive_clusters(ray_session):
    table, _ = make_corpus(n_clusters=6, n_singletons=5, seed=7)
    cfg = DedupConfig()
    assert _clusters(table, _with_exchange(cfg, "skinny")) == _clusters(
        table, _with_exchange(cfg, "hive")
    )


def test_skinny_matches_hive_with_hot_keys(ray_session):
    """Salted segments: skinny emits rep rows + rep-round pairs like the
    payload path; cluster-level result must agree (pair sets may differ —
    the skinny path can emit extra valid pairs the rank filter skipped)."""
    table, golden = make_corpus(
        n_clusters=2, n_singletons=2, seed=11, hot_cluster_size=150
    )
    cfg = DedupConfig()
    cfg = replace(cfg, execution=replace(cfg.execution, hot_band_cap=24))
    assert _clusters(table, _with_exchange(cfg, "skinny")) == _clusters(
        table, _with_exchange(cfg, "hive")
    )


def test_store_lookup_resolves_hash_collisions():
    """Pair identity is exact even when two clips share a 64-bit clip_h
    (VERDICT r1 'what's wrong #4' applied to pairs)."""
    import numpy as np

    from deduplidog_ray.stages.pairgen import store_lookup

    store = {
        "clip_h": np.array([5, 5, 9], dtype=np.uint64),
        "clip_id": np.array(["a", "b", "c"], dtype=object),
    }
    h = np.array([5, 5, 9, 7], dtype=np.uint64)
    ids = np.array(["b", "a", "c", "zz"], dtype=object)
    pos, ok = store_lookup(store, h, ids)
    assert list(ok) == [True, True, True, False]
    assert list(pos[:3]) == [1, 0, 2]


def test_hive_safe_requires_shared_workdir_on_multinode(monkeypatch):
    """Multi-node: the env var asserting shared storage is not enough —
    the exchange must also be ROOTED there (a workdir), else it falls
    back to node-local tmpfs and remote partitions vanish (r3 review)."""
    import ray as _ray

    from deduplidog_ray.stages import exchange as ex

    monkeypatch.setattr(
        _ray, "nodes", lambda: [{"Alive": True}, {"Alive": True}]
    )
    monkeypatch.delenv("DEDUPLIDOG_SHARED_EXCHANGE", raising=False)
    assert not ex.hive_safe()
    assert not ex.hive_safe("/mnt/shared/work")
    monkeypatch.setenv("DEDUPLIDOG_SHARED_EXCHANGE", "1")
    assert not ex.hive_safe()            # env var alone: still unsafe
    assert ex.hive_safe("/mnt/shared/work")
    # single node: always safe
    monkeypatch.setattr(_ray, "nodes", lambda: [{"Alive": True}])
    assert ex.hive_safe()


def test_landmark_explicit_hive_raises_when_unsafe(monkeypatch):
    import ray as _ray

    import pytest

    from deduplidog_ray.pipelines.audiofp import landmark_dup_pairs

    monkeypatch.setattr(
        _ray, "nodes", lambda: [{"Alive": True}, {"Alive": True}]
    )
    monkeypatch.delenv("DEDUPLIDOG_SHARED_EXCHANGE", raising=False)
    with pytest.raises(RuntimeError, match="shared"):
        landmark_dup_pairs(None, exchange="hive")
