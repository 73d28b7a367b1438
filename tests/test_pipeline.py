"""End-to-end distributed pipeline tests vs the oracle (north-rule gates)."""

import collections

import pytest

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.oracle import oracle_pairs, pair_recall
from deduplidog_ray.pipelines.dedup import NearDupPipeline


@pytest.fixture(scope="module")
def pipeline_result(ray_session, corpus):
    import ray.data as rd

    table, golden = corpus
    cfg = DedupConfig()
    pipe = NearDupPipeline(cfg)
    res = pipe.run(rd.from_arrow(table)).to_pandas()
    return table, golden, cfg, pipe, res


def test_all_rows_present_exactly_once(pipeline_result):
    table, golden, cfg, pipe, res = pipeline_result
    assert sorted(res["clip_id"]) == sorted(table["clip_id"].to_pylist())


def test_recall_vs_oracle(pipeline_result):
    """North rule: dup-pair recall >= 0.99 at identical config."""
    table, golden, cfg, pipe, res = pipeline_result
    truth = set(oracle_pairs(table, cfg))
    clusters = dict(zip(res["clip_id"], res["cluster_id"]))
    assert pair_recall(truth, clusters) >= 0.99


def test_no_false_merges_of_hard_negatives(pipeline_result):
    """Precision guard: txtneg rows (different text + audio) never co-cluster
    with their base cluster."""
    table, golden, cfg, pipe, res = pipeline_result
    clusters = dict(zip(res["clip_id"], res["cluster_id"]))
    by = collections.defaultdict(list)
    for cid, lab in golden.items():
        by[lab].append(cid)
    for lab, negs in by.items():
        if not lab.endswith("txtneg"):
            continue
        base = lab.rsplit("_", 1)[0]
        for neg in negs:
            for m in by[base]:
                assert clusters[neg] != clusters[m], (lab, neg, m)


def test_exactly_one_canonical_per_cluster(pipeline_result):
    table, golden, cfg, pipe, res = pipeline_result
    per = res.groupby("cluster_id")["is_canonical"].sum()
    assert (per == 1).all()


def test_canonical_is_original_side(pipeline_result):
    """Role policy ≙ original_dir wins (deduplidog.py:185-190)."""
    table, golden, cfg, pipe, res = pipeline_result
    roles = dict(zip(table["clip_id"].to_pylist(), table["role"].to_pylist()))
    for _, row in res[res["is_canonical"]].iterrows():
        cluster_members = res[res["cluster_id"] == row["cluster_id"]]["clip_id"]
        if any(roles[m] == "original" for m in cluster_members):
            assert roles[row["clip_id"]] == "original"


def test_poison_row_quarantined(pipeline_result):
    table, golden, cfg, pipe, res = pipeline_result
    poison = [c for c, l in golden.items() if l == "poison"]
    q = res[res["clip_id"].isin(poison)]
    assert (q["action"] == "quarantine").all()
    assert q["reasons"].iloc[0][0].startswith("decode_error")


def test_determinism_two_runs(ray_session, corpus):
    import ray.data as rd

    table, golden = corpus
    cfg = DedupConfig()
    r1 = NearDupPipeline(cfg).run(rd.from_arrow(table)).to_pandas()
    r2 = NearDupPipeline(cfg).run(rd.from_arrow(table)).to_pandas()
    m1 = dict(zip(r1["clip_id"], zip(r1["cluster_id"], r1["action"])))
    m2 = dict(zip(r2["clip_id"], zip(r2["cluster_id"], r2["action"])))
    assert m1 == m2


def test_canonical_metadata_propagation():
    """A5 analog (reference set_both_to_older_date / _change_file_date,
    deduplidog.py:547-553, :681-696): every member adopts the canonical's
    dur_ms, and members whose own duration exceeds it get a DUR WARNING."""
    import pandas as pd

    from deduplidog_ray.config import CanonicalPolicy
    from deduplidog_ray.stages.canonical import make_canonicalizer

    g = pd.DataFrame(
        {
            "clip_id": ["c1", "c2", "c3"],
            "cluster_id": ["k", "k", "k"],
            "n_bytes": [300, 200, 100],
            "dur_ms": [1000, 1500, 900],
        }
    )
    out = make_canonicalizer(CanonicalPolicy())(g).set_index("clip_id")
    # c1 canonical (biggest) → everyone adopts dur 1000
    assert bool(out.loc["c1", "is_canonical"])
    assert list(out["canonical_dur_ms"]) == [1000, 1000, 1000]
    assert any("DUR WARNING +500 ms" in r for r in out.loc["c2", "reasons"])
    assert not any("DUR WARNING" in r for r in out.loc["c3", "reasons"])
    assert not any("DUR WARNING" in r for r in out.loc["c1", "reasons"])
