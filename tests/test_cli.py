"""CLI entry-point (`python -m deduplidog_ray`) driven in-process."""

from __future__ import annotations

import json
import os


def test_cli_synth_and_run(ray_session, tmp_path, capsys):
    from deduplidog_ray.__main__ import main

    clips = str(tmp_path / "clips")
    out = str(tmp_path / "out")
    rc = main(
        ["synth", "--output", clips, "--clusters", "4", "--singletons", "2",
         "--seed", "3"]
    )
    assert rc == 0
    synth = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert synth["rows"] > 0 and os.path.isdir(clips)

    rc = main(["run", "--input", clips, "--output", out, "--partitions", "2"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == synth["rows"]
    assert res["metrics"]["verified_pairs"] > 0

    import pyarrow.dataset as pads

    t = pads.dataset(out, format="parquet").to_table()
    assert set(t["action"].to_pylist()) <= {"flag", "keep", "quarantine",
                                            "drop", "replace", "link"}


def test_cli_joins_cluster_when_ray_address_set(
    ray_session, tmp_path, monkeypatch, capsys
):
    """Under `ray job submit` RAY_ADDRESS names the cluster: the CLI must
    join it (no num_cpus — a local-only knob) instead of starting a
    private local Ray inside the job."""
    import ray

    from deduplidog_ray.__main__ import main

    clips = str(tmp_path / "clips")
    main(["synth", "--output", clips, "--clusters", "2", "--singletons", "1",
          "--seed", "4"])
    capsys.readouterr()

    recorded = {}

    class _Joined(Exception):
        pass

    def _fake_init(**kw):
        recorded.update(kw)
        raise _Joined   # stop before the pipeline touches the fake session

    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    monkeypatch.setattr(ray, "init", _fake_init)
    import pytest

    with pytest.raises(_Joined):
        main(["run", "--input", clips, "--output", str(tmp_path / "o"),
              "--partitions", "1"])
    assert recorded["address"] == "ray://head:10001"
    assert "num_cpus" not in recorded
