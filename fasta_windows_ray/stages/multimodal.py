"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Decode support is format-tiered: 24-bit uncompressed BMP, binary PPM,
8-bit truecolor PNG (here) and baseline JPEG (``stages/jpeg.py``) have
REAL pure-python/numpy codecs driving real nearest-neighbor resampling
end-to-end; formats that genuinely need external codec libraries
(progressive JPEG, WebP, video — not in this container) stay behind the
clearly-marked deterministic stubs, while all the Ray-side plumbing —
schema, actor-pool signature, batch sizing for large binary rows, output
layout — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),    # "image" | "audio"
    ("meta", pa.string()),          # JSON metadata
])


def docs_as_media(ds):
    """Project documents to the media schema (text bytes as the opaque
    payload) — the plumbing-level stand-in for real image/audio columns."""
    def proj(t: pa.Table) -> pa.Table:
        payload = pa.array([s.encode() for s in t["text"].to_pylist()],
                           pa.binary())
        n = len(t)
        return pa.table({
            "media_id": t["doc_id"].cast(pa.int64()),
            "payload": payload,
            "media_type": pa.array(["image"] * n),
            "meta": pa.array(["{}"] * n),
        })
    return ds.map_batches(proj, batch_format="pyarrow")


class MediaMeta:
    """Metadata extraction over binary payloads (real, no decode needed):
    byte length + content digest. Vectorizable parts vectorized."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "n_bytes": np.asarray([len(p) for p in batch["payload"]],
                                  dtype=np.int64),
            "sha256": [hashlib.sha256(p).hexdigest()
                       for p in batch["payload"]],
        })


class ImageDecodeStub:
    """Actor-pool decode/feature stage with the real signature.

    STUB: the container has no image libs; ``strict=True`` raises
    NotImplementedError (the honest production behaviour), else a
    deterministic fake "decode" derives a pseudo (h, w, mean_luma) from
    the payload digest so downstream plumbing is testable end-to-end.
    Small batch_size is the correct setting for large binary rows.
    """

    def __init__(self, strict: bool = False, feature_dim: int = 8):
        self.strict = strict
        self.feature_dim = feature_dim

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/cv2 — not available in this "
                "environment; run with strict=False for the deterministic "
                "fake decode")
        rows = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            d = hashlib.sha256(payload).digest()
            h, w = 1 + d[0] % 64, 1 + d[1] % 64
            feat = np.frombuffer(d[:self.feature_dim * 4][:32], dtype=np.uint8)
            feat = (feat[:self.feature_dim] / 255.0).astype(np.float32)
            rows.append((int(mid), int(h), int(w), feat))
        return pd.DataFrame({
            "media_id": [r[0] for r in rows],
            "height": np.asarray([r[1] for r in rows], dtype=np.int64),
            "width": np.asarray([r[2] for r in rows], dtype=np.int64),
            "features": [r[3] for r in rows],
        })


def frame_sample(media_ds, frame_bytes: int = 64, every: int = 4,
                 batch_size: int = 256):
    """Video-style frame sampling over opaque payloads — one input row
    fans out to one row per SAMPLED frame (every ``every``-th fixed-size
    byte chunk), the flat-map shape a real video pipeline has. The
    chunking itself needs no codec, so this stage is REAL (not a stub):
    payload[i*frame_bytes:(i+1)*frame_bytes] stands in for frame i, and
    a decoded-frame consumer slots in downstream. Output:
    (media_id, frame_idx, n_bytes, frame_md5)."""

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        mids, idxs, sizes, digs = [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            nf = (len(payload) + frame_bytes - 1) // frame_bytes
            for fi in range(0, nf, every):
                chunk = payload[fi * frame_bytes:(fi + 1) * frame_bytes]
                mids.append(int(mid))
                idxs.append(fi)
                sizes.append(len(chunk))
                digs.append(hashlib.md5(chunk).hexdigest())
        return pd.DataFrame({
            "media_id": np.asarray(mids, dtype=np.int64),
            "frame_idx": np.asarray(idxs, dtype=np.int64),
            "n_bytes": np.asarray(sizes, dtype=np.int64),
            "frame_md5": digs,
        })

    return media_ds.map_batches(sample, batch_format="pandas",
                                batch_size=batch_size)


# ---------------------------------------------------------------------------
# Real 24-bit BMP codec (pure python/numpy — no external image libs).
# Windows BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), BI_RGB
# (uncompressed), bottom-up row order, BGR byte order, rows padded to 4 B.
# ---------------------------------------------------------------------------

_BMP_HDR = 54  # file header 14 + info header 40


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("bmp_encode expects an (h, w, 3) RGB array")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # vertical flip (bottom-up storage) + RGB -> BGR
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    head = (struct.pack("<2sIHHI", b"BM", _BMP_HDR + len(body), 0, 0,
                        _BMP_HDR)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0))
    return head + body


def bmp_decode(buf: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.

    Real parsing (magic, header sizes, bpp, compression, stride padding,
    bottom-up flip, BGR->RGB) — raises ValueError on anything that is not
    a 24-bit BI_RGB BMP."""
    if len(buf) < _BMP_HDR or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off, = struct.unpack_from("<I", buf, 10)
    isz, w, h, _pl, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if isz < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * 3 + 3) & ~3
    if len(buf) < off + stride * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


def ppm_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary PPM (P6,
    maxval 255) — the Netpbm format: ASCII header, raw RGB triplets."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("ppm_encode expects an (h, w, 3) RGB array")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def ppm_decode(buf: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) to an (h, w, 3) uint8 RGB array.

    Real parsing: magic, ``#`` comments, arbitrary whitespace between
    header tokens, the single whitespace byte after maxval, 8-bit
    samples only — raises ValueError on anything else."""
    if len(buf) < 2 or buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[pos:pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":                       # comment to end of line
            pos = buf.find(b"\n", pos)
            if pos < 0:
                raise ValueError("truncated PPM comment")
        elif c.isdigit():
            end = pos
            while end < len(buf) and buf[end:end + 1].isdigit():
                end += 1
            tokens.append(int(buf[pos:end]))
            pos = end
        else:
            raise ValueError("bad PPM header byte")
    w, h, maxval = tokens
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval={maxval})")
    pos += 1                                  # single whitespace byte
    if len(buf) < pos + w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(buf, np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real PNG (8-bit
    truecolor, zlib-compressed, filter 0 per scanline, CRC'd chunks) —
    stdlib ``zlib`` only, no external codec."""
    import zlib
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("png_encode expects an (h, w, 3) RGB array")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), np.uint8)            # filter byte 0
    raw[:, 1:] = img.reshape(h, w * 3)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(buf: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (RGB or RGBA) non-interlaced PNG to an
    (h, w, channels) uint8 array: chunk walk with CRC verification, IDAT
    concatenation, zlib inflate, full scanline UNFILTERING (all five
    filter types 0=None 1=Sub 2=Up 3=Average 4=Paeth). Raises ValueError
    on palette/interlaced/16-bit images and corrupt streams. Sub/Up are
    vectorized; Average/Paeth reconstruct left-to-right (inherently
    sequential) — planted test corpora stay small, and the real-decode
    contract is correctness, not JPEG-rate throughput."""
    import zlib
    if len(buf) < 8 or buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        size, = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + size]
        if len(data) < size or pos + 12 + size > len(buf):
            raise ValueError(f"truncated {ctype!r} chunk")
        crc, = struct.unpack_from(">I", buf, pos + 8 + size)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype_ not in (2, 6) or comp or filt or interlace:
        raise ValueError(f"unsupported PNG (depth={depth}, color={ctype_},"
                         f" interlace={interlace})")
    ch = 3 if ctype_ == 2 else 4
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (1 + stride):
        raise ValueError("inflated size mismatch")
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.uint16)
        if ft == 0:
            rec = row
        elif ft == 2:                           # Up
            rec = (row + prev) & 0xFF
        elif ft == 1:                           # Sub: per-lane cumsum
            rec = row.reshape(w, ch).cumsum(axis=0).astype(np.uint16) & 0xFF
            rec = rec.reshape(stride)
        elif ft in (3, 4):                      # Average / Paeth: seq left
            rec = np.zeros(stride, np.uint16)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ft == 3:
                    rec[i] = (int(row[i]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    rec[i] = (int(row[i]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, ch)


# codec registry for the real decode path: sniff -> (decode, encode).
# JPEG lives in its own module (stages/jpeg.py — baseline huffman+iDCT,
# pure numpy).
from .jpeg import jpeg_decode, jpeg_encode  # noqa: E402

_CODECS = {b"BM": (bmp_decode, bmp_encode), b"P6": (ppm_decode, ppm_encode),
           b"\x89P": (png_decode, png_encode),
           b"\xff\xd8": (jpeg_decode, jpeg_encode)}


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample: out[i, j] = img[i*h//out_h, j*w//out_w]
    (floor mapping — exactly reproducible in SQL for the oracle)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[yi[:, None], xi[None, :]]


def synth_bmp_media(ds, id_col: str = "doc_id", mixed: bool = False):
    """Deterministic planted image corpus: one real image per id with
    SQL-expressible pixels — R = (id*31 + x*7 + y*13) % 256,
    G = (R+85) % 256, B = (R+170) % 256, dims w = 8 + id%9, h = 8 + id%7.
    The downstream decode stage sees only the encoded BYTES.
    ``mixed=True`` cycles the LOSSLESS codecs (BMP / PPM / PNG by
    id % 3), so the decode oracle doubles as a cross-format parity
    gate — pixel semantics must be independent of container format.
    (JPEG is lossy, hence pytest-gated in tests/test_jpeg.py, not
    planted here.)"""

    def gen(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            w, h = 8 + int(i) % 9, 8 + int(i) % 7
            y, x = np.mgrid[0:h, 0:w]
            r = (i * 31 + x * 7 + y * 13) % 256
            img = np.stack([r, (r + 85) % 256, (r + 170) % 256],
                           axis=-1).astype(np.uint8)
            enc = ((bmp_encode, ppm_encode, png_encode)[int(i) % 3]
                   if mixed else bmp_encode)
            payloads.append(enc(img))
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n),
            "meta": pa.array(["{}"] * n),
        })

    return ds.map_batches(gen, batch_format="pyarrow")


class ResizeStub:
    """Resize stage with the real signature (payload + target dims in,
    payload + dims out).

    Format-tiered: BMP (``BM``), binary PPM (``P6``), truecolor PNG
    and baseline JPEG (``\\xff\\xd8``) payloads take the REAL path —
    decode → ``resize_nearest`` → re-encode in the same format — and
    emit the md5 of the genuinely resampled file plus a weighted pixel
    checksum (``sum(3R+5G+7B)``, order/channel-swap sensitive). Other
    payloads: ``strict=True`` raises (no WebP/video codec here); else the
    deterministic fake tags the payload with the target and
    re-digests, so downstream exactly-once / lineage plumbing sees a
    genuinely transformed payload column either way."""

    def __init__(self, width: int = 32, height: int = 32,
                 strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tag = f"|{self.w}x{self.h}".encode()
        src_h = np.zeros(len(batch), dtype=np.int64)
        src_w = np.zeros(len(batch), dtype=np.int64)
        checksum = np.full(len(batch), -1, dtype=np.int64)
        md5s = []
        for i, p in enumerate(batch["payload"]):
            codec = _CODECS.get(bytes(p[:2]))
            if codec is not None:
                decode, encode = codec
                try:
                    img = decode(p)
                except ValueError:
                    # sniffed like an image but isn't one (e.g. text
                    # bytes starting "BM") — treat as a non-image
                    if self.strict:
                        raise
                    md5s.append(hashlib.md5(p + tag).hexdigest())
                    continue
                src_h[i], src_w[i] = img.shape[:2]
                if img.ndim == 3 and img.shape[2] == 4:
                    img = img[:, :, :3]          # drop alpha (RGBA PNG)
                out = resize_nearest(img, self.h, self.w)
                px = out.astype(np.int64)
                checksum[i] = int((px * np.array([3, 5, 7])).sum())
                md5s.append(hashlib.md5(encode(out)).hexdigest())
            elif self.strict:
                raise NotImplementedError(
                    "image resize outside BMP/PPM/PNG/baseline-JPEG "
                    "requires PIL/cv2 — not available in this "
                    "environment; run with strict=False for the "
                    "deterministic fake resize")
            else:
                md5s.append(hashlib.md5(p + tag).hexdigest())
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "src_height": src_h, "src_width": src_w,
            "out_width": np.full(len(batch), self.w, dtype=np.int64),
            "out_height": np.full(len(batch), self.h, dtype=np.int64),
            "pixel_checksum": checksum,
            "resized_md5": md5s,
        })


def media_pipeline(ds, strict: bool = False, batch_size: int = 256,
                   concurrency=(1, 4)):
    """media → metadata + (stub-)decoded features, actor pools sized for
    binary payloads (small batches so batch × concurrency fits the heap)."""
    media = docs_as_media(ds)
    meta = media.map_batches(MediaMeta, batch_format="pandas",
                             batch_size=batch_size, concurrency=concurrency)
    feats_cls = ImageDecodeStub if not strict else None
    if strict:
        class StrictDecode(ImageDecodeStub):
            def __init__(self):
                super().__init__(strict=True)
        feats_cls = StrictDecode
    feats = media.map_batches(feats_cls, batch_format="pandas",
                              batch_size=batch_size, concurrency=concurrency)
    return meta, feats
