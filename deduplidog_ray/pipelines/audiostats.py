"""Per-clip audio statistics — the payload-side analytics operator.

A trillion-clip audio corpus needs the same per-row descriptive stats a
text corpus gets from ``text_quality``: sample counts, peak level, clipping
and near-silence fractions, mean power. These feed the exact filters a
training pipeline applies before dedup (drop all-silence rows, drop hard-
clipped rows) and the per-partition skew metrics the north rule asks for.

Design: one streaming ``map_batches`` actor pool — the :class:`AudioStats`
actor holds the codec dispatch table (state once per actor) and decodes
each clip to its int16 quantization, computing ALL stats in exact integer
arithmetic (int64 sums of |s| ≤ 32767 values; a 10-minute 48 kHz clip sums
to ~3e16 « 2^63). The only doubles emitted are single divisions of those
exact ints, so the pytest parity gate against an independent numpy
reference is bit-exact, and results are invariant to batch layout.

No SQL oracle is possible (DuckDB cannot decode RIFF/µ-law payloads), so
this ships as a rows-only driver query plus the exact pytest gate — the
same verification class as the flagship's audio axis.

≙ reference ST1/ST2 (PIL decode + frame-count probe,
reference deduplidog/helpers.py:43-53, utils.py:96-102) generalized from
"one hash / one count" to the stats block a corpus pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from deduplidog_ray.audio.codecs import CODEC_CLASS, CodecError, decode_full
from deduplidog_ray.stages.decode import _buffer_views

#: |sample| at or above this int16 magnitude counts as clipped (~ -0.01 dBFS)
CLIP_AT = 32737
#: |sample| strictly below this counts as near-silence (~ -40 dBFS)
SILENCE_BELOW = 328



class AudioStats:
    """Actor-pool callable: bytes → exact per-clip stats columns."""

    def __init__(self) -> None:
        self.codec_class = CODEC_CLASS

    def __call__(self, batch: pa.Table) -> pa.Table:
        byts = batch["bytes"]
        codecs = batch["codec"].to_pylist()
        n = len(batch)

        n_samples = np.zeros(n, dtype=np.int64)
        peak_abs = np.zeros(n, dtype=np.int64)
        n_clipped = np.zeros(n, dtype=np.int64)
        n_silent = np.zeros(n, dtype=np.int64)
        sum_sq = np.zeros(n, dtype=np.int64)
        errors: list[str | None] = [None] * n

        buf = byts.combine_chunks() if isinstance(byts, pa.ChunkedArray) else byts
        bufs = _buffer_views(buf)
        # one clip's decoded PCM is alive per iteration (rebound each
        # pass) — that IS the heap bound; no chunk tier needed
        for i in range(n):
            v = bufs[i]
            try:
                if v is None or len(v) == 0:
                    raise CodecError("empty bytes")
                pcm, _sr, i16 = decode_full(v, codecs[i])
                if i16 is None:
                    # lossy float codec: canonical int16 re-quantization
                    i16 = np.clip(
                        np.rint(pcm * 32767.0), -32767, 32767
                    ).astype(np.int64)
                a = np.abs(i16.astype(np.int64))
                n_samples[i] = len(a)
                if len(a):
                    peak_abs[i] = int(a.max())
                    n_clipped[i] = int((a >= CLIP_AT).sum())
                    n_silent[i] = int((a < SILENCE_BELOW).sum())
                    sum_sq[i] = int((a * a).sum())
            except CodecError as e:
                errors[i] = str(e)
        nz = np.maximum(n_samples, 1).astype(np.float64)
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "n_samples": pa.array(n_samples),
                "peak_abs": pa.array(peak_abs),
                "clip_frac": pa.array(n_clipped.astype(np.float64) / nz),
                "silence_frac": pa.array(n_silent.astype(np.float64) / nz),
                "mean_power": pa.array(sum_sq.astype(np.float64) / nz),
                "decode_error": pa.array(errors, type=pa.string()),
            }
        )


def audio_stats(
    ds: ray.data.Dataset, concurrency: int = 8, batch_size: int = 256
) -> ray.data.Dataset:
    """Stats over a clips Dataset (columns: clip_id, bytes, codec)."""
    return ds.map_batches(
        AudioStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )
