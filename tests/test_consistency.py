"""Cross-axis speech-rate consistency: planted mislabels flagged against
the per-sample-rate median, normals pass, empty transcripts count 0."""

import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.consistency import speech_rate_outliers


def _clips(rows):
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["clip_id", "sr_hz", "dur_ms", "transcript"]
    ))


def test_planted_mislabel_flagged(ray_session):
    rows = [(f"c{i}", 8000, 1000, "w " * 19 + "w") for i in range(8)]
    rows.append(("bad_long", 8000, 1000, "w " * 99 + "w"))   # 100 tok/s
    rows.append(("bad_short", 8000, 1000, "w"))              # 1 tok/s
    out = speech_rate_outliers(_clips(rows)).to_pandas().set_index("clip_id")
    assert bool(out.loc["bad_long", "is_outlier"])
    assert bool(out.loc["bad_short", "is_outlier"])
    assert not out.loc[[f"c{i}" for i in range(8)], "is_outlier"].any()
    assert out.loc["c0", "n_tok"] == 20
    assert out.loc["c0", "rate_tps"] == 20.0
    assert out.loc["c0", "med_tps"] == 20.0


def test_per_sr_groups_independent(ray_session):
    # 16 kHz corpus runs twice as fast; each group gets its own median,
    # so neither group flags its own normal rows
    rows = [(f"a{i}", 8000, 1000, "w " * 9 + "w") for i in range(5)]
    rows += [(f"b{i}", 16000, 1000, "w " * 19 + "w") for i in range(5)]
    out = speech_rate_outliers(_clips(rows)).to_pandas()
    assert not out["is_outlier"].any()
    med = out.set_index("clip_id")["med_tps"]
    assert med["a0"] == 10.0 and med["b0"] == 20.0


def test_empty_transcript(ray_session):
    rows = [(f"c{i}", 8000, 1000, "x y z") for i in range(4)]
    rows.append(("empty", 8000, 1000, ""))
    out = speech_rate_outliers(_clips(rows)).to_pandas().set_index("clip_id")
    assert out.loc["empty", "n_tok"] == 0
    assert out.loc["empty", "rate_tps"] == 0.0
    assert bool(out.loc["empty", "is_outlier"])


def test_transcript_conflicts(ray_session):
    """Same text + different decoded audio flagged; byte-exact twins and
    unique transcripts not; undecodable rows excluded, not conflicting."""

    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm
    from deduplidog_ray.pipelines.consistency import transcript_conflicts

    def clip(cid, seed, text, codec="pcm_s16le", byts=None):
        pcm = make_pcm(seed, 700, 8000)
        return {
            "clip_id": cid,
            "bytes": byts if byts is not None else encode(pcm, 8000, codec),
            "sr_hz": 8000, "dur_ms": 700, "codec": codec,
            "transcript": text,
        }

    rows = [
        clip("a1", 1, "same words here"),          # conflict group: three
        clip("a2", 2, "same words here"),          # distinct payloads
        clip("a3", 1, "same words here", codec="ulaw"),  # lossy re-encode
        clip("b1", 5, "twin text"),                # byte-exact twin: NOT a
        clip("b2", 5, "twin text"),                # conflict (same PCM)
        clip("c1", 7, "unique text"),
        clip("p1", 9, "same words here", byts=b"\x00garbage"),  # poison
    ]
    out = transcript_conflicts(
        rd.from_pandas(pd.DataFrame(rows))
    ).to_pandas().sort_values("group_id").reset_index(drop=True)
    assert list(out["group_id"]) == ["a1"]
    assert int(out.loc[0, "n_clips"]) == 3      # poison row excluded
    assert int(out.loc[0, "n_audio"]) == 3
