"""MJPEG-in-AVI (images/avi.py): RIFF round trip, exact movi-walk frame
counts, JPEG frame decode fidelity, handler rejection, and the
VideoFrameSampleStage dispatch across both containers."""

from __future__ import annotations

import numpy as np
import pytest

from deduplidog_ray.images.avi import (
    encode_avi_mjpeg,
    frame_count,
    frame_hashes_u64,
    parse_avi_header,
    read_luma_frames,
)
from deduplidog_ray.images.video import (
    VideoCodecError,
    encode_y4m,
)
from deduplidog_ray.images.video import frame_hashes_u64 as y4m_hashes


def _footage(n=14, h=16, w=24, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(
        128
        + 40 * np.sin(np.arange(n)[:, None, None] / 3)
        + rng.normal(0, 6, (n, h, w)),
        0,
        255,
    ).astype(np.uint8)


def _blocky(n=10, seed=1):
    """High-contrast 2x3-pixel block frames (the bit-flip-proof family
    from the videos_near_dup synthesizer)."""
    r = np.random.default_rng(seed)
    return np.stack(
        [
            np.repeat(
                np.repeat(
                    r.choice(np.array([35, 220], dtype=np.uint8), size=(8, 8)),
                    2,
                    axis=0,
                ),
                3,
                axis=1,
            )
            for _ in range(n)
        ]
    )


def test_roundtrip_count_header_pixels():
    frames = _footage()
    buf = encode_avi_mjpeg(frames, fps=24, quality=90)
    w, h, fps, n_hdr = parse_avi_header(buf)
    assert (w, h, n_hdr) == (24, 16, 14) and abs(fps - 24) < 0.1
    assert frame_count(buf) == 14  # exact walk, not the header field
    dec = read_luma_frames(buf)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    mse = np.mean((dec.astype(np.float64) - frames) ** 2)
    assert 10 * np.log10(255**2 / mse) >= 30.0
    # every_n sampling: ceil(n / k) frames
    assert read_luma_frames(buf, 8).shape[0] == 2
    assert len(frame_hashes_u64(buf, 4)) == 4


def test_rgb_frames_and_determinism():
    rgb = np.clip(
        np.random.default_rng(2).normal(128, 40, (5, 16, 24, 3)), 0, 255
    ).astype(np.uint8)
    buf = encode_avi_mjpeg(rgb, fps=10)
    assert buf == encode_avi_mjpeg(rgb, fps=10)
    assert frame_count(buf) == 5
    assert read_luma_frames(buf).shape == (5, 16, 24)


def test_hash_space_matches_y4m_on_blocky_footage():
    """The same high-contrast footage hashes IDENTICALLY through the
    uncompressed y4m path and the lossy MJPEG path — JPEG error (±10)
    cannot flip a hash cell with a ≥45 margin, so cross-container video
    near-dup works on this family."""
    frames = _blocky()
    ha = frame_hashes_u64(encode_avi_mjpeg(frames, fps=24, quality=88))
    hy = y4m_hashes(encode_y4m(frames, fps=24))
    assert np.array_equal(ha, hy)


def test_rejects_foreign_and_malformed():
    frames = _footage(n=3)
    buf = bytearray(encode_avi_mjpeg(frames, fps=24))
    with pytest.raises(VideoCodecError, match="not an AVI"):
        frame_count(b"RIFFxxxxWAVE")
    # swap the vids handler to H.264 → refuse, don't mis-decode
    i = buf.find(b"vids") + 4
    assert buf[i : i + 4] == b"MJPG"
    foreign = bytes(buf[:i]) + b"avc1" + bytes(buf[i + 4 :])
    with pytest.raises(VideoCodecError, match="non-MJPEG"):
        frame_count(foreign)
    with pytest.raises(VideoCodecError):
        frame_count(bytes(buf[: len(buf) // 2]))  # truncated movi


def test_stage_dispatches_both_containers(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deduplidog_ray.stages.multimodal import VideoFrameSampleStage

    frames = _footage(n=17)
    rows = [
        {"video_id": "y4m", "bytes": encode_y4m(frames, fps=24)},
        {"video_id": "avi", "bytes": encode_avi_mjpeg(frames, fps=24)},
        {"video_id": "junk", "bytes": b"RIFF\x08\x00\x00\x00AVI LIST"},
    ]
    out = (
        rd.from_arrow(pa.Table.from_pylist(rows))
        .map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"sample_every_n": 8},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .set_index("video_id")
    )
    assert out.loc["y4m", "n_frames_video"] == 17
    assert out.loc["avi", "n_frames_video"] == 17  # real movi walk
    assert out.loc["avi", "n_sampled_frames"] == 3  # ceil(17/8)
    assert len(out.loc["avi", "frame_hashes"]) == 3  # real decoded hashes
    assert out.loc["junk", "video_error"]
