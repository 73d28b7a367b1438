"""Baseline JPEG codec from scratch (ITU-T T.81, a public spec) —
stdlib + numpy only.

With this, JPEG joins PNG/NETPBM/y4m as a REAL pixel path: compressed
photographic payloads decode to actual pixels that flow through the
average-hash and the near-dup pipeline, and the PIL import-try in
``stages/multimodal.py`` gates only WebP + compressed video.

Scope (documented, asserted):

- **Decoder**: baseline sequential DCT (SOF0), 8-bit, Huffman entropy
  coding, the integer-ratio chroma samplings (4:4:4, 4:2:0, 4:2:2, grayscale —
  the generic interleaved-MCU walk + replication upsample), arbitrary
  DHT/DQT (so libjpeg-produced baseline files decode too), restart
  markers (DRI/RSTn). Progressive (SOF2) and arithmetic coding raise
  ``ImageCodecError`` → the quarantine path.
- **Encoder** (fixture/test side): grayscale, 4:4:4 and 4:2:0 YCbCr,
  Annex-K quantization tables with the libjpeg quality scaling, optional
  restart intervals. Its Huffman tables are spec-valid *fixed-length*
  canonical codes (every DC symbol at 4 bits, every AC symbol at 8) —
  legal baseline JPEG because tables always ship in the DHT segment;
  compression ratio is sacrificed, decode compatibility is not.

Execution-shape note: the DCT/IDCT, quantization, zigzag and color
transforms are vectorized over all blocks (one einsum per plane); only
the entropy loop is per-symbol Python, so throughput is correctness-
grade (~MB/s), not libjpeg-grade — the honest trade for a container
with no image libraries. The actor-pool stage around it
(``ImageHashStage``) is format-agnostic and unchanged.

≙ reference ST1's PIL decode of compressed images (helpers.py:43-53).
"""

from __future__ import annotations

import struct

import numpy as np

from deduplidog_ray.images.codecs import ImageCodecError

# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The T.81 zigzag scan as indices into the row-major 8×8 block."""
    order = []
    for d in range(15):
        rows = range(d, -1, -1) if d % 2 == 0 else range(d + 1)
        for r in rows:
            c = d - r
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance / chrominance)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality→scale mapping (public formula)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: F = D f Dᵀ equals the T.81
    FDCT (c(0)=√⅛ and c(u)=√¼ fold the spec's ¼·C(u)C(v) factor)."""
    x = np.arange(8)
    u = x[:, None]
    d = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    d[0] *= np.sqrt(1 / 2)
    return d * np.sqrt(2 / 8)


_D = _dct_matrix()

# fixed-length canonical Huffman specs (see module docstring)
_DC_BITS = [0] * 17
_DC_BITS[4] = 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 17
_AC_BITS[8] = 162
_AC_VALS = (
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _enc_coeff_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    f = a.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    return np.pad(
        p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
    )


def _plane_blocks_quantized(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(bh, bw, 64) int32 zigzagged quantized coefficients for one padded
    plane — DCT, quantize, zigzag all vectorized over every block."""
    h, w = p.shape
    bh, bw = h // 8, w // 8
    blocks = (
        p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ux,ijxy,vy->ijuv", _D, blocks, _D)
    # quantize in natural order, then reorder to zigzag
    qn = np.round(coef.reshape(bh, bw, 64) / q.reshape(64)).astype(np.int32)
    return qn[:, :, ZIGZAG]


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _size_cat(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(_enc_coeff_bits(diff, s), s)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(_enc_coeff_bits(v, s), s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        w.write(code, ln)
    return dc


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 → baseline JFIF bytes.
    ``subsample=True`` → 4:2:0 chroma (2×2 area mean), else 4:4:4."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ImageCodecError(f"expected HxW or HxWx3, got {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ImageCodecError("empty image")

    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    if gray:
        comps = [(1, 1, 1, 0)]  # (id, hs, vs, tq)
        planes = [a.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(a)
        if subsample:
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            eh, ew = h + (h % 2), w + (w % 2)
            full = np.stack(
                [_pad_edge(ycc[:, :, i], eh, ew) for i in range(3)], axis=2
            )
            cb = full[:, :, 1].reshape(eh // 2, 2, ew // 2, 2).mean((1, 3))
            cr = full[:, :, 2].reshape(eh // 2, 2, ew // 2, 2).mean((1, 3))
            planes = [ycc[:, :, 0], cb, cr]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    blocks = []
    for (cid, hs, vs, tq), p in zip(comps, planes):
        ph, pw = mcy * vs * 8, mcx * hs * 8
        q = ql if tq == 0 else qc
        blocks.append(_plane_blocks_quantized(_pad_edge(p, ph, pw), q))

    # headers
    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].tolist()))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(0xC0, bytes(sof))
    for tc_th, bits, vals in (
        (0x00, _DC_BITS, _DC_VALS),
        (0x10, _AC_BITS, _AC_VALS),
        (0x01, _DC_BITS, _DC_VALS),
        (0x11, _AC_BITS, _AC_VALS),
    )[: 2 if gray else 4]:
        out += _seg(
            0xC4, bytes([tc_th]) + bytes(bits[1:]) + bytes(vals)
        )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for i, (cid, _, _, _) in enumerate(comps):
        td_ta = 0x00 if (gray or i == 0) else 0x11
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3F\x00"
    out += _seg(0xDA, bytes(sos))

    # interleaved entropy-coded scan
    wtr = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    done_mcus = 0
    for my in range(mcy):
        for mx in range(mcx):
            if (
                restart_interval
                and done_mcus
                and done_mcus % restart_interval == 0
            ):
                wtr.pad_to_byte()
                out += wtr.buf
                wtr = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        zz = blocks[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_block(
                            wtr, zz, preds[ci], dc_codes, ac_codes
                        )
            done_mcus += 1
    wtr.pad_to_byte()
    out += wtr.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Reads the de-stuffed entropy bytes of one restart segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v


def _huff_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """(65536, 2) int16 table: 16-bit peek → (symbol, code length)."""
    lut = np.full((1 << 16, 2), -1, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi, 0] = vals[k]
            lut[lo:hi, 1] = length
            code += 1
            k += 1
        code <<= 1
    return lut


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits back to the signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    rd: _BitReader, dc_lut: np.ndarray, ac_lut: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    sym, ln = dc_lut[rd.peek16()]
    if ln < 0:
        raise ImageCodecError("invalid DC Huffman code")
    rd.take(int(ln))
    s = int(sym)
    diff = _extend(rd.take(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym, ln = ac_lut[rd.peek16()]
        if ln < 0:
            raise ImageCodecError("invalid AC Huffman code")
        rd.take(int(ln))
        sym = int(sym)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, s = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ImageCodecError("AC run past block end")
        zz[k] = _extend(rd.take(s), s)
        k += 1
    return zz, dc


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def decode_jpeg(buf) -> np.ndarray:
    """Baseline JFIF bytes → HxWx3 uint8 (gray promoted). Raises
    ``ImageCodecError`` on non-baseline or malformed input."""
    data = bytes(buf)
    if data[:2] != b"\xFF\xD8":
        raise ImageCodecError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], np.ndarray] = {}
    comps: list[tuple[int, int, int, int]] = []  # id, hs, vs, tq
    h = w = None
    ri = 0
    scan_sel: list[tuple[int, int]] = []
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ImageCodecError("marker desync")
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos + 2: pos + 4])[0]
        body = data[pos + 4: pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq_id = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ImageCodecError("16-bit DQT unsupported")
                zzq = np.frombuffer(
                    body[i + 1: i + 65], dtype=np.uint8
                ).astype(np.int64)
                q = np.empty(64, dtype=np.int64)
                q[ZIGZAG] = zzq
                qt[tq_id] = q
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = [0] + list(body[i + 1: i + 17])
                nval = sum(bits)
                vals = list(body[i + 17: i + 17 + nval])
                huff[(tc, th)] = _huff_lut(bits, vals)
                i += 17 + nval
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (both baseline-huffman OK)
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, sv, tq_id = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append((cid, sv >> 4, sv & 0x0F, tq_id))
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ImageCodecError(f"non-baseline SOF 0x{m:02X} unsupported")
        elif m == 0xDD:  # DRI
            ri = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:  # SOS
            nc = body[0]
            scan_sel = []
            for ci in range(nc):
                cid = body[1 + 2 * ci]
                tdta = body[2 + 2 * ci]
                if cid != comps[ci][0]:
                    raise ImageCodecError("scan order != frame order")
                scan_sel.append((tdta >> 4, tdta & 0x0F))
            scan_start = pos
            break
        # APPn / COM / others: skipped
    if h is None or scan_start is None:
        raise ImageCodecError("missing SOF/SOS")

    # split the entropy stream on RST markers, de-stuffing each segment
    segments: list[bytes] = []
    seg = bytearray()
    i = scan_start
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                seg.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(seg))
                seg = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        seg.append(b)
        i += 1
    segments.append(bytes(seg))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    planes_zz = [
        np.zeros((mcy * vs, mcx * hs, 64), dtype=np.int32)
        for (_, hs, vs, _) in comps
    ]

    seg_i = 0
    rd = _BitReader(segments[0])
    preds = [0] * len(comps)
    done = 0
    for my in range(mcy):
        for mx in range(mcx):
            if ri and done and done % ri == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ImageCodecError("missing restart segment")
                rd = _BitReader(segments[seg_i])
                preds = [0] * len(comps)
            for ci, (_, hs, vs, _) in enumerate(comps):
                td, ta = scan_sel[ci]
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ImageCodecError("missing Huffman table")
                for by in range(vs):
                    for bx in range(hs):
                        zz, preds[ci] = _decode_block(
                            rd, huff[(0, td)], huff[(1, ta)], preds[ci]
                        )
                        planes_zz[ci][my * vs + by, mx * hs + bx] = zz
            done += 1

    # dequantize + unzigzag + IDCT, vectorized per plane
    planes: list[np.ndarray] = []
    for (cid, hs, vs, tq_id), zzp in zip(comps, planes_zz):
        if tq_id not in qt:
            raise ImageCodecError("missing quant table")
        coef = (zzp[:, :, UNZIGZAG] * qt[tq_id][None, None, :]).astype(
            np.float64
        )
        bh, bw = coef.shape[:2]
        cblk = coef.reshape(bh, bw, 8, 8)
        pix = np.einsum("xu,ijuv,yv->ijxy", _D.T, cblk, _D.T) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # crop to the component's true size, then replicate-upsample.
        # Integer replication requires the max factors to be MULTIPLES
        # of this component's (4:4:4 / 4:2:2 / 4:2:0 and kin) — legal
        # but exotic ratios like 3:2 would need fractional interpolation;
        # quarantine them as a typed error, never a broadcast crash
        if vmax % vs or hmax % hs:
            raise ImageCodecError(
                f"unsupported sampling ratio {hs}x{vs} vs max "
                f"{hmax}x{vmax} (non-integer upsample)"
            )
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ImageCodecError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
