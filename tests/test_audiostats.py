"""Exact parity gate for the audio-stats operator (clips_audio_stats is
rows-only at the driver — DuckDB cannot decode RIFF payloads — so this is
its hard verification, same class as the flagship's audio axis).

Reference values are computed per clip with plain scalar numpy from the
public ``decode`` API — independent of the pipeline's chunked/vectorized
path — and must match bit-for-bit, including the ratio doubles (single
int/int divisions are exactly rounded, so == is the right assertion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from deduplidog_ray.audio.codecs import decode, encode
from deduplidog_ray.audio.synth import make_pcm
from deduplidog_ray.pipelines.audiostats import (
    CLIP_AT,
    SILENCE_BELOW,
    audio_stats,
)


def _clips_table() -> pa.Table:
    rows = []
    for uid in range(24):
        sr = [8000, 16000][uid % 2]
        dur = 200 + uid * 37
        pcm = make_pcm(uid, dur, sr)
        if uid % 5 == 0:
            pcm = np.clip(pcm * 4.0, -1.0, 1.0)      # force hard clipping
        if uid % 7 == 0:
            pcm[: len(pcm) // 3] = 0.0               # force silence run
        codec = "ulaw" if uid % 3 == 0 else "pcm_s16le"
        rows.append((f"c{uid:04d}", encode(pcm.astype(np.float32), sr, codec), codec))
    rows.append(("poison", b"", "pcm_s16le"))        # undecodable row
    ids, bufs, codecs = zip(*rows)
    return pa.table(
        {
            "clip_id": pa.array(ids),
            "bytes": pa.array(list(bufs), type=pa.binary()),
            "codec": pa.array(codecs),
        }
    )


def _reference_stats(buf: bytes, codec: str) -> dict:
    pcm, _sr = decode(buf, codec)
    if codec == "pcm_s16le":
        i16 = np.round(np.clip(pcm * 32767.0, -32767, 32767)).astype(np.int64)
    else:
        i16 = np.clip(np.rint(pcm * 32767.0), -32767, 32767).astype(np.int64)
    a = [abs(int(s)) for s in i16]                    # deliberately scalar
    n = len(a)
    return {
        "n_samples": n,
        "peak_abs": max(a) if a else 0,
        "clip_frac": sum(1 for s in a if s >= CLIP_AT) / max(n, 1),
        "silence_frac": sum(1 for s in a if s < SILENCE_BELOW) / max(n, 1),
        "mean_power": sum(s * s for s in a) / max(n, 1),
    }


@pytest.fixture(scope="module")
def stats_df(ray_session) -> pd.DataFrame:
    t = _clips_table()
    ds = ray.data.from_arrow(t).repartition(4)       # multi-block layout
    return (
        audio_stats(ds, batch_size=7)
        .to_pandas()
        .set_index("clip_id")
        .sort_index()
    )


def test_exact_parity_vs_scalar_reference(stats_df):
    t = _clips_table()
    for cid, buf, codec in zip(
        t["clip_id"].to_pylist(), t["bytes"].to_pylist(), t["codec"].to_pylist()
    ):
        if cid == "poison":
            continue
        ref = _reference_stats(buf, codec)
        row = stats_df.loc[cid]
        for k, v in ref.items():
            assert row[k] == v, (cid, k, row[k], v)
        assert row["decode_error"] is None or pd.isna(row["decode_error"])


def test_poison_row_quarantined(stats_df):
    row = stats_df.loc["poison"]
    assert row["decode_error"] == "empty bytes"
    assert row["n_samples"] == 0 and row["peak_abs"] == 0


def test_layout_invariance(ray_session):
    """Same rows, different block/batch layout → identical stats."""
    t = _clips_table()
    a = (
        audio_stats(ray.data.from_arrow(t), batch_size=256)
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    b = (
        audio_stats(ray.data.from_arrow(t).repartition(9), batch_size=3)
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_planted_extremes(ray_session):
    """A full-scale square wave is 100% clipped; all-zero PCM is 100%
    silent with zero power."""
    sr = 8000
    square = (np.sign(np.sin(np.linspace(0, 40, sr))) * 1.0).astype(np.float32)
    square[square == 0] = 1.0
    zeros = np.zeros(sr, dtype=np.float32)
    t = pa.table(
        {
            "clip_id": pa.array(["sq", "z"]),
            "bytes": pa.array(
                [encode(square, sr, "pcm_s16le"), encode(zeros, sr, "pcm_s16le")],
                type=pa.binary(),
            ),
            "codec": pa.array(["pcm_s16le", "pcm_s16le"]),
        }
    )
    df = audio_stats(ray.data.from_arrow(t)).to_pandas().set_index("clip_id")
    assert df.loc["sq", "clip_frac"] == 1.0
    assert df.loc["sq", "peak_abs"] == 32767
    assert df.loc["z", "silence_frac"] == 1.0
    assert df.loc["z", "mean_power"] == 0.0
