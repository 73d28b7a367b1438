"""MJPEG-in-AVI: a REAL compressed-video path from scratch.

AVI is a RIFF container (the same chunk grammar as the WAV files the
audio axis already parses) and an MJPEG stream is one baseline JPEG per
frame — both decodable with code this repo already owns
(``images/jpeg.py``). So compressed video no longer needs cv2/ffmpeg:
the frame-count probe is an exact ``movi``-list walk (structure only,
no pixel work), and frame sampling Huffman-decodes the selected
``00dc`` chunks into real pixels.

Scope: single video stream, 'MJPG'/'mjpg'/'dmb1' handlers, ``00dc`` /
``00db`` frame chunks, optional ``idx1`` (ignored — the walk is
authoritative), nested ``rec `` lists handled. Anything else (e.g. an
'avc1'/H.264 handler) raises ``VideoCodecError`` → the quarantine path.

≙ reference ST2's cv2 frame-count probe (utils.py:96-102) for
compressed containers.
"""

from __future__ import annotations

import struct

import numpy as np

from deduplidog_ray.images.video import VideoCodecError

_MJPEG_HANDLERS = (b"MJPG", b"mjpg", b"dmb1", b"\x00\x00\x00\x00")


# ---------------------------------------------------------------------------
# encoder (fixture/test side)
# ---------------------------------------------------------------------------


def _chunk(fcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fcc + struct.pack("<I", len(body)) + body + pad


def _list(four: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", four + body)


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 30, quality: int = 90
) -> bytes:
    """(T, H, W) luma or (T, H, W, 3) RGB uint8 → AVI with one MJPEG
    video stream (one baseline JPEG per ``00dc`` chunk, idx1 index)."""
    from deduplidog_ray.images.jpeg import encode_jpeg

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim not in (3, 4) or (a.ndim == 4 and a.shape[3] != 3):
        raise VideoCodecError(f"expected (T,H,W[,3]), got {a.shape}")
    t, h, w = a.shape[:3]
    if t == 0:
        raise VideoCodecError("empty video")

    jpegs = [encode_jpeg(a[i], quality=quality) for i in range(t)]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        max_sz * fps,              # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        t,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_sz,                    # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,          # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG",
        0, 0, 0, 0,                # flags, prio, lang, initial
        1, fps,                    # dwScale, dwRate → fps = rate/scale
        0, t,                      # dwStart, dwLength (frames)
        max_sz, 0, 0,              # sugbuf, quality(default), samplesize
        0, 0, w, h,                # rcFrame
    )
    strf = struct.pack(
        "<I2i2H4s5I",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += struct.pack("<4sII I", b"00dc", 0x10, len(movi_body), len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", bytes(movi_body))
    idx1 = _chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _subchunks(mv: memoryview, start: int, end: int):
    """Yield (fcc, body_start, body_len) over a chunk run, honoring the
    RIFF even-byte padding rule."""
    off = start
    while off + 8 <= end:
        fcc = bytes(mv[off : off + 4])
        (ln,) = struct.unpack("<I", mv[off + 4 : off + 8])
        body = off + 8
        if body + ln > end:
            raise VideoCodecError(f"truncated chunk {fcc!r} at {off}")
        yield fcc, body, ln
        off = body + ln + (ln & 1)


def _find_list(mv: memoryview, start: int, end: int, four: bytes):
    for fcc, body, ln in _subchunks(mv, start, end):
        if fcc == b"LIST" and bytes(mv[body : body + 4]) == four:
            return body + 4, body + ln
    return None


def parse_avi_header(buf) -> tuple[int, int, float, int]:
    """→ (width, height, fps, header_frame_count). Raises
    VideoCodecError on non-AVI or non-MJPEG payloads."""
    mv = memoryview(buf)
    if bytes(mv[:4]) != b"RIFF" or bytes(mv[8:12]) != b"AVI ":
        raise VideoCodecError("not an AVI payload")
    top_end = min(len(mv), 8 + struct.unpack("<I", mv[4:8])[0])
    span = _find_list(mv, 12, top_end, b"hdrl")
    if span is None:
        raise VideoCodecError("missing hdrl list")
    s, e = span
    w = h = n = None
    fps = 30.0
    handler = None
    for fcc, body, ln in _subchunks(mv, s, e):
        if fcc == b"avih" and ln >= 40:
            vals = struct.unpack("<10I", mv[body : body + 40])
            us_per_frame, n, w, h = vals[0], vals[4], vals[8], vals[9]
            if us_per_frame:
                fps = 1_000_000 / us_per_frame
        elif fcc == b"LIST" and bytes(mv[body : body + 4]) == b"strl":
            for f2, b2, l2 in _subchunks(mv, body + 4, body + ln):
                if f2 == b"strh" and l2 >= 8:
                    typ = bytes(mv[b2 : b2 + 4])
                    if typ == b"vids":
                        handler = bytes(mv[b2 + 4 : b2 + 8])
    if w is None or not w or not h:
        raise VideoCodecError("missing avih header")
    if handler is not None and handler not in _MJPEG_HANDLERS:
        raise VideoCodecError(
            f"non-MJPEG video handler {handler!r} needs ffmpeg/cv2"
        )
    return int(w), int(h), fps, int(n or 0)


def _frame_chunks(buf) -> tuple[memoryview, list[tuple[int, int]]]:
    """(memoryview, [(body_offset, body_len)]) for every video frame
    chunk in the movi list, in stream order. Structure walk only."""
    mv = memoryview(buf)
    parse_avi_header(mv)  # validates container + handler
    top_end = min(len(mv), 8 + struct.unpack("<I", mv[4:8])[0])
    span = _find_list(mv, 12, top_end, b"movi")
    if span is None:
        raise VideoCodecError("missing movi list")
    out: list[tuple[int, int]] = []

    def walk(s: int, e: int) -> None:
        for fcc, body, ln in _subchunks(mv, s, e):
            if fcc == b"LIST" and bytes(mv[body : body + 4]) == b"rec ":
                walk(body + 4, body + ln)
            elif fcc[2:4] in (b"dc", b"db"):
                out.append((body, ln))

    walk(*span)
    return mv, out


def frame_count(buf) -> int:
    """Exact frame count from the movi walk — no pixel work, the
    compressed-container analog of video.frame_count."""
    return len(_frame_chunks(buf)[1])


def read_luma_frames(buf, every_n: int = 1) -> np.ndarray:
    """(T', H, W) uint8 — every ``every_n``-th frame JPEG-decoded to
    luma (ITU-R 601, same weights as the image axis)."""
    from deduplidog_ray.images.codecs import to_gray
    from deduplidog_ray.images.jpeg import decode_jpeg

    mv, chunks = _frame_chunks(buf)
    w, h, _fps, _n = parse_avi_header(mv)
    outs = []
    for i, (off, ln) in enumerate(chunks):
        if i % every_n:
            continue
        rgb = decode_jpeg(bytes(mv[off : off + ln]))
        if rgb.shape[:2] != (h, w):
            raise VideoCodecError(
                f"frame {i} is {rgb.shape[:2]}, header says {(h, w)}"
            )
        outs.append(np.clip(np.round(to_gray(rgb)), 0, 255).astype(np.uint8))
    if not outs:
        return np.empty((0, h, w), dtype=np.uint8)
    return np.stack(outs)


def frame_hashes_u64(buf, every_n: int = 1) -> np.ndarray:
    """64-bit average hash per sampled decoded frame — same hash family
    as images/video.py:frame_hashes_u64, so y4m and MJPEG copies of the
    same footage land in the same near-dup hash space."""
    from deduplidog_ray.images.codecs import block_mean_resize

    frames = read_luma_frames(buf, every_n)
    out = np.empty(len(frames), dtype=np.uint64)
    for i, f in enumerate(frames):
        g = block_mean_resize(f.astype(np.float32), 8, 8)
        bits = (g > g.mean()).astype(np.uint8).reshape(-1)
        out[i] = np.packbits(bits)[::-1].copy().view(np.uint64)[0]
    return out
