"""Multimodal stub-stage plumbing tests (schema, quarantine, determinism)."""

import numpy as np
import pytest
import pyarrow as pa

from deduplidog_ray.stages.multimodal import (
    HAVE_CV2,
    HAVE_PIL,
    ImageHashStage,
    VideoFrameSampleStage,
)


def _img_batch():
    return pa.table(
        {
            "img_id": pa.array(["a", "b", "c", "d"]),
            "bytes": pa.array(
                [b"fake-image-1", b"fake-image-1", b"fake-image-2", None],
                type=pa.binary(),
            ),
        }
    )


def test_image_hash_stage_plumbing():
    stage = ImageHashStage()
    out = stage(_img_batch())
    assert out.column_names[-2:] == ["img_hash", "img_error"]
    h = out["img_hash"].to_pylist()
    # identical bytes ⇒ identical hash (exact-dup detection works even with
    # the stubbed decoder); None bytes quarantined
    assert h[0] == h[1]
    assert h[0] != h[2]
    errs = out["img_error"].to_pylist()
    assert errs[3] is not None and errs[0] is None


def test_image_max_bytes_guard():
    stage = ImageHashStage(img_max_bytes=4)
    out = stage(_img_batch())
    assert all(e is not None for e in out["img_error"].to_pylist()[:3])


def test_video_frame_sample_plumbing():
    stage = VideoFrameSampleStage(sample_every_n=10)
    batch = pa.table(
        {
            "vid_id": pa.array(["v1"]),
            "bytes": pa.array([b"x" * 1_000_000], type=pa.binary()),
            "fps": pa.array([30.0]),
        }
    )
    out = stage(batch)
    assert out["n_frames_video"].to_pylist() == [240]     # 8s * 30fps fake
    assert out["n_sampled_frames"].to_pylist() == [24]


@pytest.mark.skipif(HAVE_PIL or HAVE_CV2, reason="real libs present")
def test_pixel_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage().sample_frames(b"anything")
