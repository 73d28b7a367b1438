"""Multimodal (image / video) actor-pool stages.

The task sheet requires image/audio/video treated as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages. Audio is fully real in this engine (stages/decode.py). Images
are REAL for NETPBM (P5/P6, pure numpy) AND for PNG (from-scratch
decoder, stdlib zlib; all five scanline filters) via
``deduplidog_ray/images/codecs.py`` — pixels actually flow through the
average hash, AND for baseline JPEG (from-scratch T.81 codec,
``images/jpeg.py`` — Huffman entropy decode, any chroma sampling,
restart markers). Video is REAL for uncompressed YUV4MPEG2
(``images/video.py``) AND for compressed MJPEG-in-AVI
(``images/avi.py``). Only WebP / progressive-JPEG images and
inter-frame video codecs (mp4/webm) remain gated behind import-try
(PIL/cv2 are not in this container); for those a clearly-marked
deterministic fake stands in so the Ray-side plumbing (schema, batch
sizing, actor signature, quarantine, output layout) is real and
tested.

≙ reference ST1 image-hash preloader (deduplidog/deduplidog.py:327-346,
helpers.py:43-53) and ST2 cv2 frame-count probe (utils.py:96-102).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

try:  # pragma: no cover
    import cv2  # noqa: F401

    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False


def _fake_image_decode(buf: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE (stub): 8x8 grayscale derived from a content hash.

    Stands in for PIL decode so average-hash plumbing runs; replaced by a
    real decoder when PIL is present.
    """
    d = hashlib.blake2b(buf, digest_size=64).digest()
    return np.frombuffer(d, dtype=np.uint8).reshape(8, 8).astype(np.float32)


class ImageHashStage:
    """Actor-pool stage: image ``bytes`` → 64-bit average hash + dims.

    ≙ ``imagehash.average_hash`` (reference helpers.py:43-53): resize to
    8x8 grayscale, threshold at the mean → 64 bits. With PIL installed the
    real decode runs; without it, the deterministic fake (identical bytes
    ⇒ identical hash, so exact-duplicate detection remains meaningful).
    """

    def __init__(self, img_max_bytes: int | None = None) -> None:
        # ≙ img_max_size skip (deduplidog.py:152-153)
        self.img_max_bytes = img_max_bytes
        self.have_pil = HAVE_PIL

    def _decode_8x8(self, buf: bytes) -> np.ndarray:
        if buf[:2] in (b"P5", b"P6"):
            # REAL pixel path — pure-numpy NETPBM decode + area-mean 8x8
            from deduplidog_ray.images.codecs import (
                block_mean_resize,
                decode_image,
                to_gray,
            )

            return block_mean_resize(to_gray(decode_image(buf)), 8, 8)
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            # REAL compressed path — from-scratch PNG (stdlib zlib only)
            from deduplidog_ray.images.codecs import (
                block_mean_resize,
                decode_png,
                to_gray,
            )

            return block_mean_resize(to_gray(decode_png(buf)), 8, 8)
        if buf[:2] == b"\xFF\xD8":
            # REAL compressed path — from-scratch baseline JPEG (T.81)
            from deduplidog_ray.images.codecs import (
                block_mean_resize,
                to_gray,
            )
            from deduplidog_ray.images.jpeg import decode_jpeg

            return block_mean_resize(to_gray(decode_jpeg(buf)), 8, 8)
        if self.have_pil:  # pragma: no cover
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(buf)).convert("L").resize((8, 8))
            return np.asarray(img, dtype=np.float32)
        return _fake_image_decode(buf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hashes = np.zeros(len(batch), dtype=np.uint64)
        errors: list[str | None] = [None] * len(batch)
        for i in range(len(batch)):
            v = col[i].as_py()
            try:
                if not v:
                    raise ValueError("empty bytes")
                if self.img_max_bytes and len(v) > self.img_max_bytes:
                    raise ValueError("image too large (img_max_bytes)")
                g = self._decode_8x8(bytes(v))
                bits = (g > g.mean()).astype(np.uint8).reshape(-1)
                hashes[i] = np.packbits(bits)[::-1].copy().view(np.uint64)[0]
            except Exception as e:  # quarantine, never fail the block
                errors[i] = str(e)
        out = batch.append_column("img_hash", pa.array(hashes.view(np.int64)))
        return out.append_column("img_error", pa.array(errors, type=pa.string()))


class VideoFrameSampleStage:
    """Actor-pool stage: video ``bytes`` → frame count + sampled-frame
    perceptual hashes.

    ≙ the cv2 frame-count probe (reference utils.py:96-102). For
    uncompressed YUV4MPEG2 payloads the probe and the pixel sampling are
    REAL (pure-numpy container walk + per-frame average hash,
    ``images/video.py``), and for MJPEG-in-AVI the probe is a real
    RIFF ``movi`` walk and sampling Huffman-decodes the selected JPEG
    frames (``images/avi.py``) — a real COMPRESSED video path. Other
    containers (mp4/webm) would need cv2/ffmpeg — absent here, a
    clearly-marked deterministic fake stands in for the count and the
    hash list stays empty.
    """

    def __init__(self, sample_every_n: int = 30) -> None:
        self.sample_every_n = sample_every_n
        self.have_cv2 = HAVE_CV2

    @staticmethod
    def _is_avi(buf: bytes) -> bool:
        return buf[:4] == b"RIFF" and buf[8:12] == b"AVI "

    def frame_count(self, buf: bytes, fps: float, bitrate_bps: int) -> int:
        if buf[:9] == b"YUV4MPEG2":
            from deduplidog_ray.images.video import frame_count

            return frame_count(buf)                    # REAL: exact walk
        if self._is_avi(buf):
            from deduplidog_ray.images.avi import frame_count

            return frame_count(buf)       # REAL: compressed movi walk
        if self.have_cv2:  # pragma: no cover — no cv2 in this container
            # real probe, the reference's frame counter
            # (/root/reference/deduplidog/utils.py:96-102): cv2 opens
            # files, not buffers, so spill to a temp file
            import os
            import tempfile

            import cv2

            fd, path = tempfile.mkstemp(suffix=".video")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(buf)
                cap = cv2.VideoCapture(path)
                try:
                    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                finally:
                    cap.release()
                if n > 0:
                    return n
            finally:
                os.unlink(path)
        # deterministic fake: duration ≈ bytes / (bitrate/8) seconds
        dur_s = len(buf) / max(1.0, bitrate_bps / 8)
        return int(dur_s * fps)

    def sample_frames(self, buf: bytes) -> np.ndarray:
        """Sampled-frame 64-bit average hashes (real for y4m AND
        MJPEG-AVI — the latter Huffman-decodes the sampled JPEGs)."""
        if buf[:9] == b"YUV4MPEG2":
            from deduplidog_ray.images.video import frame_hashes_u64

            return frame_hashes_u64(buf, self.sample_every_n)
        if self._is_avi(buf):
            from deduplidog_ray.images.avi import frame_hashes_u64

            return frame_hashes_u64(buf, self.sample_every_n)
        raise NotImplementedError(
            "pixel decode requires cv2/ffmpeg (not in this container)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fps = (
            batch["fps"].to_numpy(zero_copy_only=False)
            if "fps" in batch.column_names
            else np.full(len(batch), 30.0)
        )
        counts = np.zeros(len(batch), dtype=np.int32)
        sampled = np.zeros(len(batch), dtype=np.int32)
        hashes: list[list[int]] = [[] for _ in range(len(batch))]
        errors: list[str | None] = [None] * len(batch)
        for i in range(len(batch)):
            v = bytes(col[i].as_py() or b"")
            try:
                counts[i] = self.frame_count(v, float(fps[i]), 1_000_000)
                if v[:9] == b"YUV4MPEG2" or self._is_avi(v):
                    fh = self.sample_frames(v)
                    hashes[i] = fh.view(np.int64).tolist()
                    sampled[i] = len(fh)
                else:
                    sampled[i] = counts[i] // self.sample_every_n
            except Exception as e:  # quarantine, never fail the block
                errors[i] = str(e)
        out = batch.append_column("n_frames_video", pa.array(counts))
        out = out.append_column("n_sampled_frames", pa.array(sampled))
        out = out.append_column(
            "frame_hashes", pa.array(hashes, type=pa.list_(pa.int64()))
        )
        return out.append_column(
            "video_error", pa.array(errors, type=pa.string())
        )
