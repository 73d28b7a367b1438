"""Real-pixel image near-dup: NETPBM decode, average hash, Hamming LSH —
exact pair parity vs a brute-force scan over planted variants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.images.codecs import (
    average_hash_u64,
    decode_image,
    encode_pgm,
    encode_ppm,
)
from deduplidog_ray.images.jpeg import decode_jpeg, encode_jpeg
from deduplidog_ray.images.synth import make_image
from deduplidog_ray.pipelines.imagededup import (
    image_hashes,
    image_near_dup_pairs,
)

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _ham(a: np.uint64, b: np.uint64) -> int:
    x = np.uint64(a) ^ np.uint64(b)
    return int(_POP[np.array([x], dtype=np.uint64).view(np.uint8)].sum())


def _corpus():
    rng = np.random.default_rng(3)
    rows = []
    imgs = {}
    for i in range(40):
        img = make_image(seed=i)
        imgs[f"img{i:03d}"] = img
        rows.append({"image_id": f"img{i:03d}", "bytes": encode_ppm(img)})
    # planted variants of img000..img009
    for i in range(10):
        base = imgs[f"img{i:03d}"].astype(np.float32)
        noisy = np.clip(base + rng.normal(0, 4, base.shape), 0, 255)
        rows.append({"image_id": f"img{i:03d}_noise",
                     "bytes": encode_ppm(noisy.astype(np.uint8))})
        imgs[f"img{i:03d}_noise"] = noisy.astype(np.uint8)
        bright = np.clip(base + 25, 0, 255).astype(np.uint8)
        rows.append({"image_id": f"img{i:03d}_bright",
                     "bytes": encode_ppm(bright)})
        imgs[f"img{i:03d}_bright"] = bright
    # lossy JPEG re-encodes of img010..img014 — the stage must decode
    # them with the from-scratch T.81 path; the brute-force oracle hashes
    # the DECODED pixels, so any decode drift would break pair parity
    for i in range(10, 15):
        buf = encode_jpeg(imgs[f"img{i:03d}"], quality=92)
        rows.append({"image_id": f"img{i:03d}_jpg", "bytes": buf})
        imgs[f"img{i:03d}_jpg"] = decode_jpeg(buf)
    # truncated NETPBM payload → exercises the REAL decoder's error path
    # (non-NETPBM bytes intentionally fall through to the compressed-format
    # stand-in, see stages/multimodal.py)
    rows.append({"image_id": "poison", "bytes": b"P6\n999 999\n255\nxx"})
    return rows, imgs


def test_image_hash_real_pixels(ray_session):
    rows, imgs = _corpus()
    t = pa.Table.from_pylist(rows)
    out = image_hashes(rd.from_arrow(t)).to_pandas().set_index("image_id")
    # stage hash == direct pixel hash (real decode, not a bytes-hash fake)
    for iid in ["img000", "img007", "img003_noise", "img012_jpg"]:
        want = int(average_hash_u64(imgs[iid]))
        got = int(np.array([out.loc[iid, "img_hash"]],
                           dtype=np.int64).view(np.uint64)[0])
        assert got == want, iid
    # a brightness shift barely moves the mean-thresholded hash
    h0 = np.array([out.loc["img000", "img_hash"]], np.int64).view(np.uint64)[0]
    hb = np.array([out.loc["img000_bright", "img_hash"]],
                  np.int64).view(np.uint64)[0]
    assert _ham(h0, hb) <= 2
    # gray PGM path decodes too
    g = make_image(seed=99)[:, :, 1]
    tg = pa.Table.from_pylist(
        [{"image_id": "gray", "bytes": encode_pgm(g)}]
    )
    og = image_hashes(rd.from_arrow(tg)).to_pandas()
    assert og["img_error"].isna().all()
    rgb = decode_image(encode_pgm(g))
    assert int(np.array(og["img_hash"], np.int64).view(np.uint64)[0]) == int(
        average_hash_u64(rgb)
    )
    # poison row quarantined
    assert out.loc["poison", "img_error"]


def test_image_near_dup_pairs_exact_vs_bruteforce(ray_session):
    rows, imgs = _corpus()
    t = pa.Table.from_pylist(rows)
    k = 4
    got = image_near_dup_pairs(rd.from_arrow(t), max_hamming=k)
    pairs = set(zip(got["a"], got["b"]))
    hs = {iid: average_hash_u64(img) for iid, img in imgs.items()}
    ids = sorted(hs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if _ham(hs[ids[i]], hs[ids[j]]) <= k:
                want.add((ids[i], ids[j]))
    assert pairs == want
    # the planted families are actually found (non-vacuous)
    found_noise = sum(1 for i in range(10)
                      if (f"img{i:03d}", f"img{i:03d}_noise") in pairs)
    found_bright = sum(1 for i in range(10)
                       if (f"img{i:03d}", f"img{i:03d}_bright") in pairs)
    assert found_noise >= 8 and found_bright >= 8
    found_jpg = sum(1 for i in range(10, 15)
                    if (f"img{i:03d}", f"img{i:03d}_jpg") in pairs)
    assert found_jpg >= 4
    # hamming column carries the true distance
    for _, r in got.iterrows():
        assert r["hamming"] == _ham(hs[r["a"]], hs[r["b"]])


def test_y4m_real_frame_probe_and_hashes(ray_session):
    """Uncompressed video: exact frame count from the container walk and
    real per-frame average hashes, through the actor stage."""
    import ray.data as rd

    from deduplidog_ray.images.codecs import block_mean_resize
    from deduplidog_ray.images.video import (
        encode_y4m,
        frame_count,
        frame_hashes_u64,
        read_luma_frames,
    )
    from deduplidog_ray.stages.multimodal import VideoFrameSampleStage

    rng = np.random.default_rng(7)
    frames = np.stack([
        np.clip(
            128 + 50 * np.sin(i / 3) + rng.normal(0, 8, (32, 48)), 0, 255
        ).astype(np.uint8)
        for i in range(75)
    ])
    buf = encode_y4m(frames, fps=25)
    assert frame_count(buf) == 75
    back = read_luma_frames(buf)
    assert (back == frames).all()                  # lossless luma round-trip
    # direct hash parity for sampled frames
    fh = frame_hashes_u64(buf, every_n=30)
    assert len(fh) == 3                            # frames 0, 30, 60
    for k, fi in enumerate([0, 30, 60]):
        g = block_mean_resize(frames[fi].astype(np.float32), 8, 8)
        bits = (g > g.mean()).astype(np.uint8).reshape(-1)
        want = np.packbits(bits)[::-1].copy().view(np.uint64)[0]
        assert fh[k] == want
    # through the Ray stage: real path + quarantine for truncated payload
    t = pa.Table.from_pylist([
        {"video_id": "v0", "bytes": buf},
        {"video_id": "trunc", "bytes": buf[: len(buf) // 2]},
        {"video_id": "fake", "bytes": b"\x00mp4-ish" * 4000},
    ])
    out = (
        rd.from_arrow(t)
        .map_batches(VideoFrameSampleStage, batch_format="pyarrow",
                     concurrency=(1, 2), batch_size=8)
        .to_pandas().set_index("video_id")
    )
    assert out.loc["v0", "n_frames_video"] == 75
    assert out.loc["v0", "n_sampled_frames"] == 3
    assert list(out.loc["v0", "frame_hashes"]) == fh.view(np.int64).tolist()
    assert out.loc["trunc", "video_error"]        # truncated → quarantined
    assert out.loc["fake", "video_error"] is None  # stand-in path, no error
    assert len(out.loc["fake", "frame_hashes"]) == 0


def test_video_near_dup_pairs_vs_bruteforce(ray_session):
    """Shared-frame-hash video dedup: noisy re-encode and trimmed-prefix
    copies found; parity vs a brute-force set-overlap scan."""
    import ray.data as rd

    from deduplidog_ray.images.video import encode_y4m, frame_hashes_u64
    from deduplidog_ray.pipelines.imagededup import video_near_dup_pairs

    rng = np.random.default_rng(13)

    def vid(seed, n):
        # high-contrast 8x8 block structure per frame (like real imagery,
        # hash bits sit far from the mean threshold → robust to noise)
        r = np.random.default_rng(seed)
        return np.stack([
            np.repeat(np.repeat(
                r.choice(np.array([35, 220], dtype=np.uint8), size=(8, 8)),
                2, axis=0), 3, axis=1)
            for _ in range(n)
        ])

    rows, raw = [], {}
    for i in range(15):
        f = vid(seed=i, n=40)
        raw[f"v{i:02d}"] = f
        rows.append({"video_id": f"v{i:02d}", "bytes": encode_y4m(f)})
    # noisy re-encode of v00 (tiny noise: frame hashes mostly unchanged)
    noisy = np.clip(
        raw["v00"].astype(np.float32) + rng.normal(0, 1.5, raw["v00"].shape),
        0, 255,
    ).astype(np.uint8)
    raw["v00_noise"] = noisy
    rows.append({"video_id": "v00_noise", "bytes": encode_y4m(noisy)})
    # trimmed copy of v01 (first 24 of 40 frames)
    raw["v01_trim"] = raw["v01"][:24]
    rows.append({"video_id": "v01_trim", "bytes": encode_y4m(raw["v01_trim"])})

    got = video_near_dup_pairs(
        rd.from_arrow(pa.Table.from_pylist(rows)),
        sample_every_n=4, min_overlap=0.5,
    )
    pairs = set(zip(got["a"], got["b"]))

    # brute force on the same sampled hashes
    hs = {k: set(frame_hashes_u64(encode_y4m(v), every_n=4).tolist())
          for k, v in raw.items()}
    want = set()
    ids = sorted(hs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(hs[ids[i]] & hs[ids[j]])
            if inter / max(1, min(len(hs[ids[i]]), len(hs[ids[j]]))) >= 0.5:
                want.add((ids[i], ids[j]))
    assert pairs == want
    assert ("v00", "v00_noise") in pairs        # noisy re-encode caught
    assert ("v01", "v01_trim") in pairs         # prefix copy caught
    # overlap column carries the true ratio
    for _, r in got.iterrows():
        inter = len(hs[r["a"]] & hs[r["b"]])
        m = min(len(hs[r["a"]]), len(hs[r["b"]]))
        assert abs(r["overlap"] - inter / m) < 1e-12


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanline y uses filters[y % len] — a
    reference FORWARD filter implementation, so the decoder's inverse
    paths (Sub/Up/Average/Paeth) are all exercised against truth."""
    import struct
    import zlib

    h, w, ch = img.shape
    assert ch == 3
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            left = np.r_[np.zeros(ch, np.int64), cur[:-ch]]
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.r_[np.zeros(ch, np.int64), cur[:-ch]]
            enc = cur - (left + prev) // 2
        elif f == 4:
            enc = np.empty_like(cur)
            for i in range(len(cur)):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c)
                enc[i] = cur[i] - pred
        raw.append(f)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decoder_all_filters_and_stage(ray_session):
    import ray.data as rd

    from deduplidog_ray.images.codecs import decode_png, encode_png

    img = make_image(seed=21, h=33, w=47)        # odd dims on purpose
    # every filter type, mixed per scanline
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        buf = _png_with_filters(img, filters)
        assert (decode_png(buf) == img).all(), filters
    # gray and RGBA color types via the round trip + PIL-free truncation
    assert (decode_png(encode_png(img)) == img).all()
    # the hash stage dispatches PNG to the real decoder
    from deduplidog_ray.pipelines.imagededup import image_hashes

    t = pa.Table.from_pylist([
        {"image_id": "png", "bytes": encode_png(img)},
        {"image_id": "ppm", "bytes": encode_ppm(img)},
        {"image_id": "bad", "bytes": b"\x89PNG\r\n\x1a\nnot-chunks"},
    ])
    out = image_hashes(rd.from_arrow(t)).to_pandas().set_index("image_id")
    # identical pixels → identical hash regardless of container
    assert out.loc["png", "img_hash"] == out.loc["ppm", "img_hash"]
    assert int(np.array([out.loc["png", "img_hash"]],
                        np.int64).view(np.uint64)[0]) == int(
        average_hash_u64(img))
    assert out.loc["bad", "img_error"]           # malformed → quarantined
