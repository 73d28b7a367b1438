"""From-scratch baseline JPEG codec (images/jpeg.py): round-trip fidelity
across sampling modes / qualities / restart markers, decode of
variable-length (Annex K typical) Huffman tables, rejection of
non-baseline streams, and the ImageHashStage dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from deduplidog_ray.images import jpeg as J
from deduplidog_ray.images.codecs import ImageCodecError, average_hash_u64
from deduplidog_ray.images.jpeg import decode_jpeg, encode_jpeg
from deduplidog_ray.images.synth import make_image

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _ham(a: np.uint64, b: np.uint64) -> int:
    x = np.uint64(a) ^ np.uint64(b)
    return int(_POP[np.array([x], dtype=np.uint64).view(np.uint8)].sum())


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else 99.0


def _rgb3(g: np.ndarray) -> np.ndarray:
    return np.repeat(g[:, :, None], 3, axis=2)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kw,floor",
    [
        (dict(quality=90), 32.0),
        (dict(quality=90, subsample=True), 27.0),
        (dict(quality=50), 27.0),
        (dict(quality=90, restart_interval=3), 32.0),
        (dict(quality=85, subsample=True, restart_interval=2), 26.0),
    ],
)
def test_roundtrip_psnr(kw, floor):
    img = make_image(seed=7, h=48, w=64)
    dec = decode_jpeg(encode_jpeg(img, **kw))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) >= floor


def test_roundtrip_gray_and_odd_dims():
    g = make_image(seed=3, h=41, w=53)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=85))
    assert dec.shape == (41, 53, 3)  # gray promoted
    assert _psnr(_rgb3(g), dec) >= 32.0
    # all three channels identical for a grayscale source
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    # odd dims with 4:2:0 (MCU padding + chroma crop both in play)
    img = make_image(seed=11, h=37, w=51)
    dec = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    assert dec.shape == (37, 51, 3)
    assert _psnr(img, dec) >= 25.0


def test_encode_deterministic_and_quality_monotone():
    img = make_image(seed=5)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=90))) > _psnr(
        img, decode_jpeg(encode_jpeg(img, quality=30))
    )


def test_restart_markers_change_stream_not_pixels():
    img = make_image(seed=9, h=32, w=48)
    plain = encode_jpeg(img, quality=85)
    rst = encode_jpeg(img, quality=85, restart_interval=1)
    assert rst != plain and b"\xFF\xD0" in rst
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_single_pixel_and_tiny_images():
    one = np.full((1, 1, 3), 200, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(one, quality=95))
    assert dec.shape == (1, 1, 3)
    assert abs(int(dec[0, 0, 0]) - 200) <= 12  # one quantized DC block
    tiny = make_image(seed=1, h=5, w=3)
    assert decode_jpeg(encode_jpeg(tiny, quality=90, subsample=True)).shape == (
        5,
        3,
        3,
    )


# ---------------------------------------------------------------------------
# variable-length Huffman tables (Annex K.3 typical tables) — proves the
# decoder's canonical-code LUT handles libjpeg-style tables, not just the
# encoder's fixed-length ones.
# ---------------------------------------------------------------------------

_STD_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
_STD_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def test_decode_standard_annex_k_huffman_tables(monkeypatch):
    """Re-encode with the T.81 Annex K typical tables (variable-length,
    1-16 bit codes) swapped in; pixels must match the fixed-table encode
    bit for bit — the entropy coding is lossless, only the quantization
    loses."""
    assert sum(_STD_AC_BITS) == len(_STD_AC_VALS) == 162
    img = make_image(seed=13, h=40, w=56)
    fixed = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    monkeypatch.setattr(J, "_DC_BITS", _STD_DC_BITS)
    monkeypatch.setattr(J, "_DC_VALS", _STD_DC_VALS)
    monkeypatch.setattr(J, "_AC_BITS", _STD_AC_BITS)
    monkeypatch.setattr(J, "_AC_VALS", _STD_AC_VALS)
    std = encode_jpeg(img, quality=80, subsample=True)
    assert np.array_equal(decode_jpeg(std), fixed)
    # the standard tables actually compress better than the fixed ones
    monkeypatch.undo()
    assert len(std) < len(encode_jpeg(img, quality=80, subsample=True))


# ---------------------------------------------------------------------------
# rejection / quarantine paths
# ---------------------------------------------------------------------------


def test_rejects_non_baseline_and_malformed():
    img = make_image(seed=2, h=16, w=16)
    buf = bytearray(encode_jpeg(img, quality=80))
    with pytest.raises(ImageCodecError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    # flip SOF0 → SOF2 (progressive): must refuse, not mis-decode
    i = buf.find(b"\xFF\xC0")
    prog = bytes(buf[:i]) + b"\xFF\xC2" + bytes(buf[i + 2 :])
    with pytest.raises(ImageCodecError, match="non-baseline"):
        decode_jpeg(prog)
    with pytest.raises(ImageCodecError, match="missing SOF"):
        decode_jpeg(b"\xFF\xD8\xFF\xD9")
    # 16-bit quant table flagged, not silently misread
    j = buf.find(b"\xFF\xDB")
    q16 = bytearray(buf)
    q16[j + 4] = 0x10  # Pq=1
    with pytest.raises(ImageCodecError, match="16-bit DQT"):
        decode_jpeg(bytes(q16))


def test_truncated_scan_does_not_crash():
    """A truncated entropy stream decodes zeros (reader pads), never
    raises an uncontrolled exception or loops."""
    img = make_image(seed=4, h=24, w=24)
    buf = encode_jpeg(img, quality=80)
    cut = buf[: len(buf) * 2 // 3]
    try:
        dec = decode_jpeg(cut)
        assert dec.shape == (24, 24, 3)
    except ImageCodecError:
        pass  # also acceptable: detected and quarantined


# ---------------------------------------------------------------------------
# stage integration: JPEG bytes flow through the real pixel path
# ---------------------------------------------------------------------------


def test_image_hash_stage_dispatches_jpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deduplidog_ray.pipelines.imagededup import image_hashes

    img = make_image(seed=21, h=32, w=40)
    buf = encode_jpeg(img, quality=92)
    t = pa.Table.from_pylist(
        [
            {"image_id": "jpg", "bytes": buf},
            {"image_id": "bad_jpg", "bytes": b"\xFF\xD8\xFF\xC2trunc"},
        ]
    )
    out = image_hashes(rd.from_arrow(t)).to_pandas().set_index("image_id")
    # hash equals the direct hash of the DECODED pixels (real path, no fake)
    want = int(average_hash_u64(decode_jpeg(buf)))
    got = int(
        np.array([out.loc["jpg", "img_hash"]], dtype=np.int64).view(
            np.uint64
        )[0]
    )
    assert got == want
    # and stays within the near-dup ball of the original pixels
    assert _ham(np.uint64(got), average_hash_u64(img)) <= 3
    # malformed JPEG is quarantined by the stage, not fataled
    assert out.loc["bad_jpg", "img_error"]
