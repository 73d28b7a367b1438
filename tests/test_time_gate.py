"""Creation-timestamp gate on the fuzzy match axis.

≙ the reference's date gate on the perceptual compare
(deduplidog/deduplidog.py:744-756): ``image_similar`` only compares hashes
when the two files' mtime/EXIF timestamps fall within 3600 s. The engine
analog: when ``MatchConfig.time_window_ms`` is set and the input carries a
``created_ms`` column, NEAR (SimHash/Jaccard + audio-fp) matches also
require |created_a - created_b| <= window; exact/pcm equality stays
ungated (the reference's exact path has its own date logic — here the dur
window).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm
from deduplidog_ray.config import DedupConfig, MatchConfig
from deduplidog_ray.oracle import oracle_pairs

HOUR_MS = 3_600_000


def _table() -> pa.Table:
    sr = 16000
    pcm = make_pcm(42, 1500, sr)
    toks = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu"
    ).split()
    tr = " ".join(toks)
    rng = np.random.default_rng(7)

    def fuzzy(edit_at: int, nseed: int):
        t2 = list(toks)
        t2[edit_at] = "edited"
        noisy = np.clip(
            pcm + np.random.default_rng(nseed).normal(0, 2e-3, len(pcm)).astype(
                np.float32
            ),
            -1,
            1,
        )
        return encode(noisy, sr, "pcm_s16le"), " ".join(t2)

    b_far, tr_far = fuzzy(3, 11)
    b_near, tr_near = fuzzy(20, 13)
    base_b = encode(pcm, sr, "pcm_s16le")
    rows = [
        # (clip_id, bytes, transcript, created_ms)
        ("c_base", base_b, tr, 0),
        ("c_exact", base_b, tr, 25 * HOUR_MS),       # exact copy, far in time
        ("c_fuzzy_far", b_far, tr_far, 50 * HOUR_MS),  # fuzzy, far in time
        ("c_fuzzy_near", b_near, tr_near, 1_000),      # fuzzy, within window
    ]
    dur = int(round(len(pcm) * 1000 / sr))
    _ = rng
    return pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], type=pa.string()),
            "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
            "sr_hz": pa.array([sr] * 4, type=pa.int32()),
            "dur_ms": pa.array([dur] * 4, type=pa.int32()),
            "codec": pa.array(["pcm_s16le"] * 4, type=pa.string()),
            "transcript": pa.array([r[2] for r in rows], type=pa.string()),
            "created_ms": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def test_oracle_kernel_time_gate():
    t = _table()
    # ungated: both fuzzy variants pair with the base
    pairs0 = oracle_pairs(t, DedupConfig())
    assert ("c_base", "c_fuzzy_far") in pairs0
    assert ("c_base", "c_fuzzy_near") in pairs0

    cfg = DedupConfig(match=MatchConfig(time_window_ms=HOUR_MS))
    pairs = oracle_pairs(t, cfg)
    # fuzzy pair outside the window: gated away
    assert ("c_base", "c_fuzzy_far") not in pairs
    # fuzzy pair inside the window: kept
    assert ("c_base", "c_fuzzy_near") in pairs
    # exact copy far in time: UNGATED (content equality, reference exact path)
    assert pairs[("c_base", "c_exact")] == "exact"


def test_pipeline_time_gate_end_to_end(ray_session, tmp_path):
    from deduplidog_ray.pipelines.dedup import NearDupPipeline

    t = _table()
    path = str(tmp_path / "clips")
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "part-000.parquet"))

    cfg = DedupConfig(match=MatchConfig(time_window_ms=HOUR_MS))
    res = NearDupPipeline(cfg).run(path).to_pandas()
    cid = dict(zip(res["clip_id"], res["cluster_id"]))
    # base + exact + fuzzy_near co-cluster; fuzzy_far is kept apart
    assert cid["c_base"] == cid["c_exact"] == cid["c_fuzzy_near"]
    assert cid["c_fuzzy_far"] != cid["c_base"]

    # ungated control: everything merges
    res0 = NearDupPipeline(DedupConfig()).run(path).to_pandas()
    cid0 = dict(zip(res0["clip_id"], res0["cluster_id"]))
    assert len({cid0[c] for c in cid0}) == 1

    # a table WITHOUT created_ms + a window set: gate passes trivially
    t2 = t.drop_columns(["created_ms"])
    path2 = str(tmp_path / "clips2")
    os.makedirs(path2, exist_ok=True)
    pq.write_table(t2, os.path.join(path2, "part-000.parquet"))
    res2 = NearDupPipeline(cfg).run(path2).to_pandas()
    cid2 = dict(zip(res2["clip_id"], res2["cluster_id"]))
    assert len({cid2[c] for c in cid2}) == 1
