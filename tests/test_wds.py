"""WebDataset tar shard sink/source: exact round trip, byte-determinism
across layouts and reruns, atomic resume skip."""

import glob
import hashlib
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm
from deduplidog_ray.sources.wds import read_wds_shards, write_wds_shards

SR = 8000


def _corpus(n=24):
    rows = []
    for i in range(n):
        pcm = make_pcm(i, 600 + 13 * i, SR)
        codec = "ulaw" if i % 5 == 0 else "pcm_s16le"
        rows.append({
            "clip_id": f"c{i:04d}",
            "bytes": encode(pcm.astype(np.float32), SR, codec),
            "sr_hz": SR, "dur_ms": int(1000 * len(pcm) / SR),
            "codec": codec, "transcript": f"words of clip {i}",
            "role": "original" if i % 3 else "work",
        })
    return pd.DataFrame(rows)


def _sha_dir(d):
    return {
        os.path.basename(f): hashlib.sha256(open(f, "rb").read()).hexdigest()
        for f in glob.glob(os.path.join(d, "*.tar"))
    }


def test_roundtrip_exact(ray_session, tmp_path):
    df = _corpus()
    man = write_wds_shards(rd.from_pandas(df), str(tmp_path / "w"), shards=6)
    assert man["n_clips"].sum() == len(df)
    back = read_wds_shards(str(tmp_path / "w")).to_pandas()
    a = df.sort_values("clip_id").reset_index(drop=True)
    b = back.sort_values("clip_id").reset_index(drop=True)
    assert (a["clip_id"] == b["clip_id"]).all()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    for c in ("sr_hz", "dur_ms", "codec", "transcript", "role"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_deterministic_bytes_across_layouts(ray_session, tmp_path):
    df = _corpus()
    write_wds_shards(rd.from_pandas(df), str(tmp_path / "x"), shards=6)
    write_wds_shards(
        rd.from_pandas(df).repartition(5), str(tmp_path / "y"), shards=6
    )
    assert _sha_dir(str(tmp_path / "x")) == _sha_dir(str(tmp_path / "y"))


def test_resume_skips_existing_shards(ray_session, tmp_path):
    df = _corpus()
    d = str(tmp_path / "r")
    write_wds_shards(rd.from_pandas(df), d, shards=6)
    # poison one shard, delete another: a rerun must leave the poisoned
    # file alone (exists ⇒ skip) and regenerate only the missing one
    shards = sorted(glob.glob(os.path.join(d, "*.tar")))
    poisoned, removed = shards[0], shards[1]
    open(poisoned, "wb").write(b"DO NOT TOUCH")
    os.unlink(removed)
    man = write_wds_shards(rd.from_pandas(df), d, shards=6)
    assert open(poisoned, "rb").read() == b"DO NOT TOUCH"
    assert os.path.exists(removed)
    # the manifest must not bless the poisoned shard: its row is flagged
    # as a mismatch, the regenerated one as written, the rest verified
    st = man.set_index("shard")["status"]
    assert st[os.path.basename(poisoned)] == "skipped_mismatch"
    assert st[os.path.basename(removed)] == "written"
    assert (st.drop([os.path.basename(poisoned),
                     os.path.basename(removed)])
            == "skipped_verified").all()
    # n_bytes of the poisoned row reflects the file actually on disk
    assert (man.set_index("shard")["n_bytes"][os.path.basename(poisoned)]
            == len(b"DO NOT TOUCH"))
    # full rewrite after clearing restores the exact original bytes
    with open(removed, "rb") as f:
        assert f.read(260)[257:260] != b""   # a real tar again
