"""cached_stage: generic stage-granular resume — reuse without
recompute, config/input invalidation, kill-safety of the tmp+rename
write, deterministic resume output."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.state.checkpoint import cached_stage


@pytest.fixture()
def corpus(tmp_path):
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "n_chars": np.arange(200, dtype=np.int64) * 3,
    })
    p = str(tmp_path / "input")
    rd.from_pandas(df).write_parquet(p)
    files = sorted(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    )
    return files


def test_reuse_skips_recompute(ray_session, corpus, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return rd.read_parquet(corpus).map_batches(lambda t: t)

    wd = str(tmp_path / "wd")
    a = cached_stage(wd, "stage1", "cfgA", corpus, build).to_pandas()
    b = cached_stage(wd, "stage1", "cfgA", corpus, build).to_pandas()
    assert len(calls) == 1                  # second call read the checkpoint
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_config_change_invalidates(ray_session, corpus, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return rd.read_parquet(corpus)

    wd = str(tmp_path / "wd")
    cached_stage(wd, "s", "cfgA", corpus, build).to_pandas()
    cached_stage(wd, "s", "cfgB", corpus, build).to_pandas()
    assert len(calls) == 2


def test_input_change_invalidates(ray_session, corpus, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return rd.read_parquet(corpus)

    wd = str(tmp_path / "wd")
    cached_stage(wd, "s", "cfg", corpus, build).to_pandas()
    os.utime(corpus[0])                      # mtime bump = new lineage
    cached_stage(wd, "s", "cfg", corpus, build).to_pandas()
    assert len(calls) == 2


def test_half_written_tmp_never_reused(ray_session, corpus, tmp_path):
    """A kill mid-write leaves only a .tmp dir — the next run must
    recompute, not read the partial output."""
    wd = str(tmp_path / "wd")
    tmp_dir = os.path.join(wd, "s", "part-00000.tmp")
    os.makedirs(tmp_dir)
    with open(os.path.join(tmp_dir, "garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    calls = []

    def build():
        calls.append(1)
        return rd.read_parquet(corpus)

    out = cached_stage(wd, "s", "cfg", corpus, build).to_pandas()
    assert len(calls) == 1 and len(out) == 200
