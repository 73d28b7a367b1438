"""Kill-and-resume over the per-partition lineage manifest (north rule).

≙ the reference's ordinal-skip resume (deduplidog.py:196-197, :433-441):
a restarted run must not recompute completed partitions and must produce
identical results.
"""

import json
import os
import shutil

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.fixtures import write_corpus
from deduplidog_ray.pipelines.dedup import NearDupPipeline


def test_resume_skips_completed_partitions(ray_session, tmp_path):
    data_dir = str(tmp_path / "clips")
    write_corpus(data_dir, n_clusters=4, n_singletons=3, seed=21)

    work1 = str(tmp_path / "work1")
    cfg = DedupConfig()
    pipe1 = NearDupPipeline(cfg, workdir=work1)
    res1 = pipe1.run(data_dir, partitions=4).to_pandas()

    manifest = os.path.join(work1, "manifest.jsonl")
    recs = [json.loads(x) for x in open(manifest) if x.strip()]
    sig_recs = [r for r in recs if r["stage"] == "signatures"]
    assert len(sig_recs) == 4
    assert any(r["stage"] == "pairs" for r in recs)        # cluster state too
    assert all(r["rows_per_sec"] > 0 for r in recs)        # metrics emitted

    # simulate a kill after 2 of 4 signature partitions: drop 2,3 and the
    # downstream pair checkpoint
    kept = [r for r in recs if r["stage"] == "signatures" and r["partition"] < 2]
    with open(manifest, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")
    for pid in (2, 3):
        shutil.rmtree(os.path.join(work1, "signatures", f"part-{pid:05d}"))
    shutil.rmtree(os.path.join(work1, "pairs"), ignore_errors=True)

    # resumed run: must recompute ONLY 2,3 and match the full result
    pipe2 = NearDupPipeline(cfg, workdir=work1)
    res2 = pipe2.run(data_dir, partitions=4).to_pandas()
    recs2 = [
        json.loads(x)
        for x in open(manifest)
        if x.strip() and json.loads(x)["stage"] == "signatures"
    ]
    assert len(recs2) == 4
    recomputed = {r["partition"] for r in recs2} - {r["partition"] for r in kept}
    assert recomputed == {2, 3}

    m1 = dict(zip(res1["clip_id"], res1["cluster_id"]))
    m2 = dict(zip(res2["clip_id"], res2["cluster_id"]))
    assert m1 == m2


def test_pairs_stage_checkpointed_and_reused(ray_session, tmp_path):
    """The cluster-state (pair table) checkpoint: a second run must reuse
    the recorded pairs instead of re-running the band shuffle."""
    data_dir = str(tmp_path / "clips")
    write_corpus(data_dir, n_clusters=3, n_singletons=2, seed=31)
    work = str(tmp_path / "work")
    cfg = DedupConfig()
    p1 = NearDupPipeline(cfg, workdir=work)
    r1 = p1.run(data_dir, partitions=2).to_pandas()
    recs = [json.loads(x) for x in open(os.path.join(work, "manifest.jsonl"))]
    assert any(r["stage"] == "pairs" for r in recs)

    p2 = NearDupPipeline(cfg, workdir=work)
    r2 = p2.run(data_dir, partitions=2).to_pandas()
    # resumed run computed no hot pass (pairs came from the checkpoint)
    assert "hot_keys" not in p2.metrics
    assert dict(zip(r1["clip_id"], r1["cluster_id"])) == dict(
        zip(r2["clip_id"], r2["cluster_id"])
    )


def test_config_change_invalidates_checkpoint(ray_session, tmp_path):
    from dataclasses import replace

    data_dir = str(tmp_path / "clips")
    write_corpus(data_dir, n_clusters=2, n_singletons=2, seed=22)
    work = str(tmp_path / "work")

    cfg1 = DedupConfig()
    NearDupPipeline(cfg1, workdir=work).signatures_checkpointed(data_dir, 2)

    cfg2 = replace(cfg1, signature=replace(cfg1.signature, shingle_k=4))
    pipe = NearDupPipeline(cfg2, workdir=work)
    assert pipe.ckpt.done_partitions("signatures") == set()   # stale → ignored


def test_changed_input_invalidates_partition(ray_session, tmp_path):
    """ADVICE r1: rerunning the same workdir after an input fragment
    changed must recompute the affected partitions, not silently reuse
    stale signature/pairs checkpoints."""
    import glob

    import pyarrow.parquet as pq

    data_dir = str(tmp_path / "clips")
    write_corpus(data_dir, n_clusters=3, n_singletons=2, seed=33)
    work = str(tmp_path / "work")
    cfg = DedupConfig()
    res1 = NearDupPipeline(cfg, workdir=work).run(data_dir, partitions=2).to_pandas()

    # rewrite one input fragment: drop its last row (size+mtime change)
    frag = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))[0]
    t = pq.read_table(frag)
    removed = t["clip_id"][len(t) - 1].as_py()
    pq.write_table(t.slice(0, len(t) - 1), frag)

    res2 = NearDupPipeline(cfg, workdir=work).run(data_dir, partitions=2).to_pandas()
    assert removed in set(res1["clip_id"])
    assert removed not in set(res2["clip_id"])      # stale row NOT reused
    assert len(res2) == len(res1) - 1

    manifest = os.path.join(work, "manifest.jsonl")
    recs = [json.loads(x) for x in open(manifest) if x.strip()]
    sig_recs = [r for r in recs if r["stage"] == "signatures"]
    # at least one signature partition recomputed (appended manifest line)
    assert len(sig_recs) > 2
    assert all("input_hash" in r for r in recs)
