"""ignore_* config modes ≙ reference ignore_name / ignore_date
(deduplidog.py:103-116) — the pure-content and no-duration match paths."""

from dataclasses import replace

import numpy as np
import pyarrow as pa

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.oracle import oracle_clusters, oracle_pairs
from deduplidog_ray.pipelines.dedup import NearDupPipeline


def _corpus():
    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm

    rows = []
    pcm = make_pcm(9, 800, 16000)
    # same audio, COMPLETELY different transcripts (only ignore_transcript
    # mode may match them via the pcm-hash content key, ≙ ignore_name)
    for i, tr in enumerate(["alpha bravo charlie delta echo",
                            "totally different words entirely here"]):
        rows.append(("same_audio_%d" % i, encode(pcm, 16000, "pcm_s16le"),
                     16000, 800, "pcm_s16le", tr))
    # same transcript, 300ms-different audio (only ignore_duration matches)
    t = "the quick brown fox jumps over the lazy dog again and again ok"
    for i, dur in enumerate([900, 1300]):
        p = make_pcm(77, dur, 16000)
        rows.append(("dur_%d" % i, encode(p, 16000, "pcm_s16le"),
                     16000, dur, "pcm_s16le", t))
    return pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows]),
            "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
            "sr_hz": pa.array([r[2] for r in rows], type=pa.int32()),
            "dur_ms": pa.array([r[3] for r in rows], type=pa.int32()),
            "codec": pa.array([r[4] for r in rows]),
            "transcript": pa.array([r[5] for r in rows]),
        }
    )


def _clusters(res):
    return dict(zip(res["clip_id"], res["cluster_id"]))


def test_default_mode_keeps_both_apart(ray_session):
    import ray.data as rd

    t = _corpus()
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(t)).to_pandas()
    cl = _clusters(res)
    assert cl["same_audio_0"] == cl["same_audio_1"]   # pcm equality is content
    assert cl["dur_0"] != cl["dur_1"]                 # 400ms apart: dur gate


def test_ignore_duration_merges_dur_variants(ray_session):
    import ray.data as rd

    cfg = DedupConfig()
    cfg = replace(cfg, match=replace(cfg.match, ignore_duration=True))
    t = _corpus()
    res = NearDupPipeline(cfg).run(rd.from_arrow(t)).to_pandas()
    cl = _clusters(res)
    # same transcript, similar-but-trimmed audio still needs the fp gate;
    # oracle agreement is the contract
    truth = oracle_clusters(oracle_pairs(t, cfg))
    for a in ("dur_0", "dur_1"):
        for b in ("dur_0", "dur_1"):
            assert (cl[a] == cl[b]) == (
                truth.get(a, a) == truth.get(b, b)
            )


def test_ignore_transcript_pipeline_matches_oracle(ray_session):
    import ray.data as rd

    cfg = DedupConfig()
    cfg = replace(cfg, match=replace(cfg.match, ignore_transcript=True))
    t = _corpus()
    res = NearDupPipeline(cfg).run(rd.from_arrow(t)).to_pandas()
    cl = _clusters(res)
    truth = oracle_clusters(oracle_pairs(t, cfg))
    ids = t["clip_id"].to_pylist()
    for a in ids:
        for b in ids:
            assert (cl[a] == cl[b]) == (truth.get(a, a) == truth.get(b, b)), (a, b)
