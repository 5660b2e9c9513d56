"""Baseline JPEG codec in pure python/numpy — the fourth real image
format of the codec tier (round-4 VERDICT #6).

Scope (what a 100-TB web corpus actually contains): baseline sequential
DCT, Huffman entropy coding (SOF0/SOF1), 8-bit samples, greyscale or
YCbCr with any sampling factors on decode (4:2:0 / 4:2:2 / 4:4:4), JFIF
colour math (BT.601), restart markers (DRI/RSTn). The encoder emits
standard Annex-K quantization + Huffman tables at a libjpeg-style
quality scaling with 4:2:0 or 4:4:4 subsampling and optional restart
intervals. Progressive (SOF2), arithmetic coding, 12-bit and
hierarchical JPEG raise ``ValueError`` — the honest strict tier.

Like the PNG codec (multimodal.py), the contract is correctness on
planted corpora, not libjpeg-rate throughput: the per-block transforms
(DCT, quantize, zigzag) are vectorized numpy over all blocks at once;
only the entropy coder walks symbols in Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# zigzag scan order: scan position -> row-major index in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
    0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: F = C @ B @ C.T, B = C.T @ F @ C
_k = np.arange(8)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT_C[0] *= 1 / np.sqrt(2)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex-K base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits, vals) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    dec, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            dec[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return dec


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _mag_code(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value -> (size, additional bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane with H, W % 8 == 0 -> (H//8, W//8, 8, 8) blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
                 .transpose(0, 2, 1, 3))


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, ...]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _encode_component_blocks(plane: np.ndarray, qtab: np.ndarray
                             ) -> np.ndarray:
    """All 8x8 blocks of one plane -> quantized zigzag coefficients
    (n_blocks_y, n_blocks_x, 64), vectorized (one einsum per plane)."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,abjk,lk->abil", _DCT_C, blocks, _DCT_C)
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(*q.shape[:2], 64)[..., ZIGZAG]


def _huff_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzagged block; returns the new DC pred."""
    dc = int(zz[0])
    s, extra = _mag_code(dc - pred)
    c, ln = dc_codes[s]
    bw.write(c, ln)
    bw.write(extra, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]          # ZRL
            bw.write(c, ln)
            run -= 16
        s, extra = _mag_code(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(extra, s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]              # EOB
        bw.write(c, ln)
    return dc


def jpeg_encode(img: np.ndarray, quality: int = 90,
                subsample: bool = True, restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG.

    ``subsample=True`` -> 4:2:0 (2x2 box-averaged chroma), else 4:4:4.
    ``restart_interval`` (in MCUs) > 0 emits DRI + RSTn markers.
    Standard Annex-K tables scaled libjpeg-style by ``quality``.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("jpeg_encode expects an (h, w, 3) RGB array")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"unencodable dimensions {h}x{w}")
    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)
    y, cb, cr = _rgb_to_ycbcr(img)
    if subsample:
        mcu_h = mcu_w = 16
        y = _pad_edge(y, 16, 16)
        cb = _pad_edge(cb, 16, 16)
        cr = _pad_edge(cr, 16, 16)
        # 2x2 box average
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
               .mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
               .mean(axis=(1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        mcu_h = mcu_w = 8
        y = _pad_edge(y, 8, 8)
        cb = _pad_edge(cb, 8, 8)
        cr = _pad_edge(cr, 8, 8)
        samp = [(1, 1), (1, 1), (1, 1)]

    zz = [_encode_component_blocks(p, q)
          for p, q in ((y, ql), (cb, qc), (cr, qc))]

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    out = bytearray()
    out += b"\xff\xd8"                                        # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tq, tab in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in tab[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF0
    for cid, (hs, vs), tq in zip((1, 2, 3), samp, (0, 1, 1)):
        out += bytes([cid, (hs << 4) | vs, tq])
    for tc, th, bits, vals in (
            (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
            (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)            # SOS
    for cid, (td, ta) in zip((1, 2, 3), ((0, 0), (1, 1), (1, 1))):
        out += bytes([cid, (td << 4) | ta])
    out += bytes([0, 63, 0])

    mcux = y.shape[1] // mcu_w
    mcuy = y.shape[0] // mcu_h
    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + ((n_mcu // restart_interval - 1)
                                            % 8)])
                preds = [0, 0, 0]
            for ci, (hs, vs) in enumerate(samp):
                dct, act = tabs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = zz[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _huff_block(bw, blk, preds[ci],
                                                dct, act)
            n_mcu += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over a destuffed entropy chunk."""

    __slots__ = ("d", "p", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.p >= len(self.d):
            raise ValueError("truncated JPEG entropy stream")
        self.acc = (self.acc << 8) | self.d[self.p]
        self.p += 1
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, dec: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = dec.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: additional-bits value -> signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Slice the scan's entropy data into destuffed restart chunks.
    Returns (chunks, position of the terminating marker)."""
    chunks, cur = [], bytearray()
    n = len(buf)
    while pos < n:
        b = buf[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = buf[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:                  # RSTn
            chunks.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif m == 0xFF:                          # fill byte
            pos += 1
        else:                                    # next real marker
            break
    chunks.append(bytes(cur))
    return chunks, pos


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG (SOF0/SOF1, Huffman, 8-bit, grey or
    YCbCr, any sampling factors, restart markers) to an (h, w, 3)
    uint8 RGB array. Raises ValueError on progressive / arithmetic /
    12-bit / corrupt streams."""
    buf = bytes(buf)
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict] = {}
    frame = None
    ri = 0
    pos = 2
    scan = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        m = buf[pos + 1]
        if m == 0xFF:                            # fill byte
            pos += 1
            continue
        if m == 0xD9:                            # EOI
            break
        size, = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4:pos + 2 + size]
        if len(seg) != size - 2:
            raise ValueError("truncated segment")
        if m == 0xDB:                            # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tab = np.frombuffer(seg[p:p + 64], np.uint8) \
                            .astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(seg[p:p + 128], ">u2") \
                            .astype(np.int64)
                    p += 128
                full = np.zeros(64, np.int64)
                full[ZIGZAG] = tab
                qt[tq] = full
        elif m in (0xC0, 0xC1):                  # SOF0 / SOF1
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0x{m:02x}")
        elif m == 0xC4:                          # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                hufftabs[(tc, th)] = _build_decoder(bits, vals)
                p += 17 + nv
        elif m == 0xDD:                          # DRI
            ri, = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:                          # SOS
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 15))
            scan = (sel, pos + 2 + size)
            break
        pos += 2 + size
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    fh, fw, comps = frame
    sel, data_pos = scan
    if fh == 0 or fw == 0:
        raise ValueError("zero-sized frame")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    order = []                                   # per-scan component info
    for cs, td, ta in sel:
        match = [c for c in comps if c[0] == cs]
        if not match:
            raise ValueError(f"scan references unknown component {cs}")
        cid, hs, vs, tq = match[0]
        if tq not in qt or (0, td) not in hufftabs or \
                (1, ta) not in hufftabs:
            raise ValueError("missing quant/Huffman table")
        order.append((hs, vs, qt[tq], hufftabs[(0, td)],
                      hufftabs[(1, ta)]))

    # quantized coefficient store per component (vectorized iDCT after)
    coefs = [np.zeros((mcuy * vs, mcux * hs, 64), np.int64)
             for hs, vs, *_ in order]
    chunks, _ = _split_entropy(buf, data_pos)
    br = _BitReader(chunks[0])
    chunk_i = 0
    preds = [0] * len(order)
    for imcu in range(mcux * mcuy):
        if ri and imcu and imcu % ri == 0:
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise ValueError("missing restart chunk")
            br = _BitReader(chunks[chunk_i])
            preds = [0] * len(order)
        my, mx = divmod(imcu, mcux)
        for ci, (hs, vs, _, dc_dec, ac_dec) in enumerate(order):
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, np.int64)
                    s = br.huff(dc_dec)
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.huff(ac_dec)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:          # ZRL
                                k += 16
                                continue
                            break                # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    coefs[ci][my * vs + by, mx * hs + bx] = zz
    planes = []
    for (hs, vs, qtab, *_), cz in zip(order, coefs):
        dez = np.zeros_like(cz)
        dez[..., ZIGZAG] = cz                    # de-zigzag
        f = (dez * qtab).reshape(*cz.shape[:2], 8, 8).astype(np.float64)
        blocks = np.einsum("ji,abjk,kl->abil", _DCT_C, f, _DCT_C)
        by, bx = blocks.shape[:2]
        plane = blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)[:fh, :fw] + 128.0
        planes.append(plane)
    if len(planes) == 1:
        # round like the 3-component path below (truncation would bias
        # reconstructed samples a half-LSB dark)
        y = np.clip(planes[0].round(), 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0,
                   255).astype(np.uint8)
