"""Decode + fingerprint stage — the actor-pool analog of the reference's
image-hash preloader.

≙ reference ``preload_metadata``: PIL decode + ``average_hash`` computed in a
``ProcessPoolExecutor(max_workers=4)`` with results cached driver-side
(deduplidog/deduplidog.py:327-346, helpers.py:43-77). Here the pool is a Ray
actor pool (``map_batches(DecodeFingerprint, concurrency=N)``) and the
"cache" is materialized columns — computed once, streamed, never held on the
driver.

Memory discipline (SURVEY.md §7 "hard parts"): decoded PCM is up to ~100×
the encoded ``bytes``; it lives only inside ``__call__`` for the duration of
one row's fingerprinting and is never emitted as a column. Keep
``decode_batch_size`` small (ExecutionConfig) so batch × concurrency fits the
worker heap — the analog of the reference's ``img_max_size`` skip +
``FileMetadata.clean()`` (deduplidog.py:152-153, helpers.py:74-77).

Poison rows: undecodable bytes set ``decode_error`` and null signature
columns instead of failing the block — ≙ the reference's per-file retry /
DecompressionBomb skip (deduplidog.py:443-456).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplidog_ray.audio.codecs import CODEC_CLASS, CodecError, decode_full
from deduplidog_ray.audio.fingerprint import FP_BYTES, fingerprint_batch

#: rows whose decoded PCM coexists during one vectorized fingerprint pass
FP_CHUNK = 32
from deduplidog_ray.stages.hashing import (
    hash_binary_u64,
    hash_i16_u64,
    hash_pcm_u64,
)


def _buffer_views(arr: pa.BinaryArray) -> list:
    """Per-row memoryviews into the Arrow data buffer — no bytes copies.

    Falls back to ``to_pylist`` for arrays with nulls or a non-standard
    layout (the hot path — dense non-null binary — stays zero-copy).
    """
    try:
        if arr.null_count or not isinstance(arr, pa.BinaryArray):
            return arr.to_pylist()
        import numpy as np

        bufs = arr.buffers()                      # [validity, offsets, data]
        o = arr.offset
        offs = np.frombuffer(bufs[1], dtype=np.int32)[o: o + len(arr) + 1]
        data = memoryview(bufs[2])
        return [data[offs[i]: offs[i + 1]] for i in range(len(arr))]
    except Exception:  # pragma: no cover — layout surprise → safe copy path
        return arr.to_pylist()


class DecodeFingerprint:
    """Actor-pool map_batches callable: bytes → (pcm_hash, fp, dur, errors).

    State constructed once per actor in ``__init__`` (codec dispatch table),
    work per batch in ``__call__`` — the pattern the task sheet prescribes
    for stateful stages. Real codec libraries (flac/mp3 decoders) would be
    loaded here; in this container only the numpy codecs exist.
    """

    def __init__(self, with_embedding: bool = False,
                 canonical_sr: int = 8000) -> None:
        self.codec_class = CODEC_CLASS
        # fused spectral embedding: a pipeline that needs BOTH the
        # exact-tier hashes and perceptual vectors (pipelines/tiered.py)
        # pays ONE decode instead of two — the embedder's feature math
        # runs on the chunk's already-decoded PCM (same numbers as
        # stages/embed.py:AudioEmbedder at identical params, asserted by
        # tests/test_tiered_clips.py parity with the unfused path)
        self.embedder = None
        if with_embedding:
            from deduplidog_ray.stages.embed import AudioEmbedder

            self.embedder = AudioEmbedder(canonical_sr=canonical_sr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        byts = batch["bytes"]
        codecs = batch["codec"].to_pylist()
        srs = batch["sr_hz"].to_pylist()
        n = len(batch)

        n_bytes = np.empty(n, dtype=np.int64)
        pcm_hash = np.zeros(n, dtype=np.uint64)
        dur_actual = np.zeros(n, dtype=np.int32)
        n_frames = np.zeros(n, dtype=np.int32)
        fps: list[bytes | None] = [None] * n
        errors: list[str | None] = [None] * n
        emb: np.ndarray | None = None

        buf_view = byts.combine_chunks() if isinstance(byts, pa.ChunkedArray) else byts
        bufs = _buffer_views(buf_view)       # zero-copy views into Arrow data
        # decode in sub-chunks: decoded PCM for at most FP_CHUNK rows is
        # alive at once (bounds worker heap at ~chunk × clip_pcm bytes),
        # while the fingerprint math runs batch-vectorized per chunk
        for c0 in range(0, n, FP_CHUNK):
            c1 = min(n, c0 + FP_CHUNK)
            pcms: list[np.ndarray] = []
            pcm_srs: list[int] = []
            pcm_rows: list[int] = []
            for i in range(c0, c1):
                v = bufs[i]
                n_bytes[i] = 0 if v is None else len(v)
                try:
                    if v is None or len(v) == 0:
                        raise CodecError("empty bytes")
                    pcm, sr, i16 = decode_full(v, codecs[i])
                    sr = sr or srs[i]
                    # hash the int16 payload directly when the codec exposes
                    # it (bit-identical to re-quantizing the float PCM,
                    # minus four full-clip passes per row)
                    pcm_hash[i] = (
                        hash_i16_u64(i16) if i16 is not None else hash_pcm_u64(pcm)
                    )
                    dur_actual[i] = int(round(len(pcm) * 1000 / max(1, sr)))
                    pcms.append(pcm)
                    pcm_srs.append(sr)
                    pcm_rows.append(i)
                except CodecError as e:
                    errors[i] = str(e)
                    fps[i] = b"\x00" * FP_BYTES
            if pcm_rows:
                chunk_fps, chunk_nf = fingerprint_batch(pcms, pcm_srs)
                for j, i in enumerate(pcm_rows):
                    fps[i] = chunk_fps[j]
                    n_frames[i] = chunk_nf[j]
                if self.embedder is not None:
                    from deduplidog_ray.pipelines.audiotransform import (
                        fft_resample,
                    )

                    if emb is None:
                        emb = np.zeros((n, self.embedder.dim),
                                       dtype=np.float64)
                    for j, i in enumerate(pcm_rows):
                        x = fft_resample(
                            np.asarray(pcms[j], np.float64),
                            pcm_srs[j], self.embedder.sr,
                        )
                        emb[i] = self.embedder._embed_pcm(x)
            del pcms  # decoded PCM never outlives the chunk

        content_hash = hash_binary_u64(bufs)
        cls = [self.codec_class.get(c, "unknown") for c in codecs]

        # trust the decoded duration over the metadata column (≙ the frame
        # probe recomputing frame counts, reference utils.py:96-102)
        ok = np.array([e is None for e in errors], dtype=bool)
        given = batch["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int32)
        eff_dur = np.where(ok, dur_actual, given)
        batch = batch.drop_columns(["dur_ms"]).append_column(
            "dur_ms", pa.array(eff_dur, type=pa.int32())
        )

        # the raw payload is consumed HERE: everything downstream reads the
        # hash/fingerprint columns. Dropping ``bytes`` in the same task
        # keeps ~40x the signature volume out of the object store between
        # decode and the signature stage (measured 9.3 GB → 0.2 GB at 208k
        # clips) — at 100 TB the difference is the whole object store.
        out = batch.drop_columns(["bytes"])
        for name, arr in [
            ("n_bytes", pa.array(n_bytes)),
            # hash columns are bit-cast to int64: Ray Data's sort/groupby
            # exchange round-trips values through Python and overflows on
            # uint64 > 2^63 (falls back to pickled object columns)
            ("pcm_hash", pa.array(pcm_hash.view(np.int64))),
            ("content_hash", pa.array(content_hash.view(np.int64))),
            ("fp", pa.array(fps, type=pa.binary())),
            ("n_frames", pa.array(n_frames, type=pa.int32())),
            ("dur_ms_actual", pa.array(dur_actual, type=pa.int32())),
            ("decode_error", pa.array(errors, type=pa.string())),
            ("codec_class", pa.array(cls, type=pa.string())),
        ]:
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        if self.embedder is not None:
            if emb is None:
                emb = np.zeros((n, self.embedder.dim), dtype=np.float64)
            vec = pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1).astype(np.float32)),
                self.embedder.dim,
            ).cast(pa.list_(pa.float32()))
            for name, arr in [
                ("embedding", vec),
                ("embed_error", pa.array(errors, type=pa.string())),
            ]:
                if name in out.column_names:
                    out = out.drop_columns([name])
                out = out.append_column(name, arr)
        return out
