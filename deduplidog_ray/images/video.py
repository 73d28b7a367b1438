"""Pure-numpy YUV4MPEG2 (.y4m) video handling.

y4m is the uncompressed video sibling of NETPBM: one ASCII stream
header (``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``), then per frame a
``FRAME...\\n`` marker followed by raw planar YUV. No ffmpeg/cv2
needed — which makes the reference's ST2 probe (cv2 frame count,
utils.py:96-102) and frame sampling REAL in this container for
uncompressed payloads; compressed containers (mp4/webm) stay behind
the import-gated stand-in in stages/multimodal.py.

Supported chroma: C420 (default, 1.5 bytes/px) and C444 (3 bytes/px).
Only the luma (Y) plane is returned — it is what perceptual frame
hashing consumes.
"""

from __future__ import annotations

import numpy as np


class VideoCodecError(ValueError):
    pass


_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 30) -> bytes:
    """(T, H, W) uint8 luma frames → y4m (C420 with flat chroma)."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3:
        raise VideoCodecError(f"expected (T, H, W), got {a.shape}")
    t, h, w = a.shape
    if h % 2 or w % 2:
        raise VideoCodecError("C420 needs even dimensions")
    head = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [head]
    for i in range(t):
        parts.append(b"FRAME\n")
        parts.append(a[i].tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)


def parse_y4m_header(buf) -> tuple[int, int, float, int, int]:
    """→ (width, height, fps, bytes_per_frame_payload, header_end)."""
    mv = memoryview(buf)
    head = bytes(mv[:256])
    if not head.startswith(_MAGIC):
        raise VideoCodecError("not a YUV4MPEG2 payload")
    nl = head.find(b"\n")
    if nl < 0:
        raise VideoCodecError("truncated y4m header")
    w = h = None
    fps = 30.0
    chroma = "420"
    for tok in head[len(_MAGIC):nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = int(num) / int(den)
        elif tag == b"C":
            chroma = val.decode()
    if not w or not h:
        raise VideoCodecError("y4m header missing W/H")
    if chroma.startswith("420"):
        per = w * h + 2 * (w // 2) * (h // 2)
    elif chroma.startswith("444"):
        per = 3 * w * h
    else:
        raise VideoCodecError(f"unsupported chroma C{chroma}")
    return w, h, fps, per, nl + 1


def frame_count(buf) -> int:
    """Exact frame count from the container structure (no pixel work)."""
    mv = memoryview(buf)
    w, h, _fps, per, off = parse_y4m_header(mv)
    n = 0
    total = len(mv)
    while off < total:
        marker_end = bytes(mv[off: off + 80]).find(b"\n")
        if not bytes(mv[off: off + 5]) == b"FRAME" or marker_end < 0:
            raise VideoCodecError(f"bad FRAME marker at offset {off}")
        off += marker_end + 1
        if off + per > total:
            raise VideoCodecError("truncated frame payload")
        off += per
        n += 1
    return n


def read_luma_frames(buf, every_n: int = 1) -> np.ndarray:
    """(T', H, W) uint8 — every ``every_n``-th frame's Y plane, zero-copy
    views into the payload buffer stacked at the end."""
    mv = memoryview(buf)
    w, h, _fps, per, off = parse_y4m_header(mv)
    total = len(mv)
    outs = []
    i = 0
    while off < total:
        marker_end = bytes(mv[off: off + 80]).find(b"\n")
        if not bytes(mv[off: off + 5]) == b"FRAME" or marker_end < 0:
            raise VideoCodecError(f"bad FRAME marker at offset {off}")
        off += marker_end + 1
        if off + per > total:
            raise VideoCodecError("truncated frame payload")
        if i % every_n == 0:
            y = np.frombuffer(mv, dtype=np.uint8, count=w * h, offset=off)
            outs.append(y.reshape(h, w))
        off += per
        i += 1
    if not outs:
        return np.empty((0, h, w), dtype=np.uint8)
    return np.stack(outs)


def frame_hashes_u64(buf, every_n: int = 1) -> np.ndarray:
    """64-bit average hash per sampled luma frame — the video
    fingerprint a near-dup pass compares (same hash family as the image
    axis, images/codecs.py:average_hash_u64)."""
    from deduplidog_ray.images.codecs import block_mean_resize

    frames = read_luma_frames(buf, every_n)
    out = np.empty(len(frames), dtype=np.uint64)
    for i, f in enumerate(frames):
        g = block_mean_resize(f.astype(np.float32), 8, 8)
        bits = (g > g.mean()).astype(np.uint8).reshape(-1)
        out[i] = np.packbits(bits)[::-1].copy().view(np.uint64)[0]
    return out
