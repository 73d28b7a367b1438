"""Degenerate-input robustness: empty tables, single rows, all-poison."""

import pyarrow as pa
import pytest

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.pipelines.dedup import NearDupPipeline
from deduplidog_ray.schema import CLIPS_SCHEMA


def _clips_table(rows):
    cols = {name: [] for name in CLIPS_SCHEMA.names}
    for r in rows:
        for name in CLIPS_SCHEMA.names:
            cols[name].append(r.get(name))
    return pa.table(
        {
            "clip_id": pa.array(cols["clip_id"], type=pa.string()),
            "bytes": pa.array(cols["bytes"], type=pa.binary()),
            "sr_hz": pa.array(cols["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(cols["dur_ms"], type=pa.int32()),
            "codec": pa.array(cols["codec"], type=pa.string()),
            "transcript": pa.array(cols["transcript"], type=pa.string()),
        }
    )


def test_single_row(ray_session):
    import ray.data as rd

    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm

    t = _clips_table(
        [
            {
                "clip_id": "only",
                "bytes": encode(make_pcm(1, 500, 8000), 8000, "pcm_s16le"),
                "sr_hz": 8000,
                "dur_ms": 500,
                "codec": "pcm_s16le",
                "transcript": "one lonely clip",
            }
        ]
    )
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(t)).to_pandas()
    assert len(res) == 1
    assert res.iloc[0]["action"] == "keep"
    assert bool(res.iloc[0]["is_canonical"])


def test_all_poison(ray_session):
    import ray.data as rd

    t = _clips_table(
        [
            {
                "clip_id": f"bad_{i}",
                "bytes": b"\xde\xad" * 10,
                "sr_hz": 8000,
                "dur_ms": 100,
                "codec": "pcm_s16le",
                "transcript": "t",
            }
            for i in range(5)
        ]
    )
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(t)).to_pandas()
    assert len(res) == 5
    assert (res["action"] == "quarantine").all()


def test_null_and_empty_transcripts(ray_session):
    import ray.data as rd

    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm

    rows = []
    for i, tr in enumerate([None, "", "   ", "real transcript here with words"]):
        rows.append(
            {
                "clip_id": f"c{i}",
                "bytes": encode(make_pcm(100 + i, 400, 8000), 8000, "pcm_s16le"),
                "sr_hz": 8000,
                "dur_ms": 400,
                "codec": "pcm_s16le",
                "transcript": tr,
            }
        )
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(_clips_table(rows))).to_pandas()
    assert len(res) == 4                      # nothing crashes, all labeled
