"""Worker-crash fault injection: SIGKILL Ray worker processes while the
flagship pipeline runs; Ray's task retry must recompute the lost blocks
and the final results table must be IDENTICAL to an uninterrupted run —
the single-node stand-in for a node loss on a real cluster (the north
rule's resume story covers driver death via checkpoints, test_resume;
this covers executor death via lineage re-execution)."""

import os
import signal
import threading
import time

import pandas as pd
import pytest


def _clips_dir(tmp_path_factory):
    from deduplidog_ray.fixtures import write_corpus

    path = str(tmp_path_factory.mktemp("fault_clips") / "clips")
    write_corpus(path, n_clusters=10, n_singletons=8, seed=31)
    return path


def _run_flagship(clips):
    from deduplidog_ray.config import DedupConfig
    from deduplidog_ray.pipelines.dedup import NearDupPipeline

    pipe = NearDupPipeline(DedupConfig())
    df = pipe.run(clips, partitions=4).to_pandas()
    return df.sort_values("clip_id").reset_index(drop=True)


def _worker_pids() -> list[int]:
    """PIDs of ray:: task/actor worker processes (never raylet/gcs/plasma
    — killing those takes the cluster down, which is a different test)."""
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if cmd.startswith("ray::") and "IDLE" not in cmd:
            out.append(int(pid))
    return out


def test_results_survive_worker_kills(ray_session, tmp_path_factory):
    clips = _clips_dir(tmp_path_factory)
    baseline = _run_flagship(clips)
    assert len(baseline) > 0

    killed: list[int] = []
    stop = threading.Event()

    def _assassin():
        # a bounded burst: two worker kills early in the run (a sustained
        # massacre exhausts Ray's per-task retry budget by design — that
        # failure mode is surfaced, not retried forever)
        deadline = time.monotonic() + 20
        while not stop.is_set() and len(killed) < 2 \
                and time.monotonic() < deadline:
            for pid in _worker_pids()[:1]:
                try:
                    os.kill(pid, signal.SIGKILL)
                    killed.append(pid)
                except OSError:
                    pass
            time.sleep(0.5)

    t = threading.Thread(target=_assassin, daemon=True)
    t.start()
    try:
        interrupted = _run_flagship(clips)
    finally:
        stop.set()
        t.join(timeout=5)

    assert killed, "assassin never found a busy worker — test is vacuous"
    pd.testing.assert_frame_equal(baseline, interrupted)


def test_results_after_kills_still_deterministic(ray_session,
                                                 tmp_path_factory):
    """The session keeps working after the massacre: a fresh run (new
    workers) still reproduces the baseline bit-for-bit."""
    clips = _clips_dir(tmp_path_factory)
    a = _run_flagship(clips)
    b = _run_flagship(clips)
    pd.testing.assert_frame_equal(a, b)
