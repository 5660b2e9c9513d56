"""PNG codec gates: roundtrip, all five scanline filters reconstruct
against a naive reference filterer, CRC/garbage rejection, RGBA decode,
and format-independent pixel semantics through the real resize path."""

import struct
import zlib

import numpy as np
import pytest

from fasta_windows_ray.stages.multimodal import (
    ResizeStub, _png_chunk, _PNG_SIG, bmp_encode, png_decode, png_encode,
    ppm_encode)


def rand_img(h, w, ch=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, ch)).astype(np.uint8)


def test_roundtrip():
    img = rand_img(13, 17)
    out = png_decode(png_encode(img))
    np.testing.assert_array_equal(out, img)
    assert png_encode(img)[:8] == _PNG_SIG


def _naive_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference PNG filterer straight from the spec (RFC 2083 §6):
    produce the filtered byte stream for the given per-row filter
    types."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for i in range(stride):
            x = flat[y, i]
            a = flat[y, i - ch] if i >= ch else 0
            b = flat[y - 1, i] if y > 0 else 0
            c = flat[y - 1, i - ch] if (y > 0 and i >= ch) else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                v = x - pred
            out.append(v & 0xFF)
    return bytes(out)


def _assemble(img: np.ndarray, filtered: bytes, ctype: int = 2) -> bytes:
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(filtered))
            + _png_chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filters_unfilter_exactly(ftypes):
    img = rand_img(10, 7, seed=sum(ftypes) + 1)
    buf = _assemble(img, _naive_filter(img, ftypes))
    np.testing.assert_array_equal(png_decode(buf), img)


def test_rgba_decode_and_alpha_drop():
    img = rand_img(6, 5, ch=4, seed=3)
    buf = _assemble(img, _naive_filter(img, [0, 4]), ctype=6)
    out = png_decode(buf)
    np.testing.assert_array_equal(out, img)
    # the resize stage drops alpha and still runs the real path
    import pandas as pd
    row = ResizeStub(width=4, height=4)(
        pd.DataFrame({"media_id": [1], "payload": [buf]}))
    assert row["src_height"].iloc[0] == 6 and row["pixel_checksum"].iloc[0] >= 0


def test_crc_and_garbage_rejection():
    img = rand_img(4, 4)
    buf = bytearray(png_encode(img))
    with pytest.raises(ValueError):
        png_decode(b"\x89PNGnope")
    flip = len(buf) - 20                 # somewhere inside IDAT
    buf[flip] ^= 0xFF
    with pytest.raises(ValueError):      # CRC catches the corruption
        png_decode(bytes(buf))
    with pytest.raises(ValueError):      # truncation
        png_decode(png_encode(img)[:30])


def test_unsupported_variants_rejected():
    img = rand_img(4, 4)
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr16)
           + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
           + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        png_decode(bad)                  # 16-bit
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    bad2 = (_PNG_SIG + _png_chunk(b"IHDR", ihdr_i)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        png_decode(bad2)                 # interlaced


def test_format_independent_resize_semantics():
    """The same image as PNG, BMP and PPM produces the same pixel
    checksum through the real resample path (format-independence gate,
    extended to the third codec)."""
    import pandas as pd
    img = rand_img(9, 11, seed=8)
    stage = ResizeStub(width=5, height=6)
    sums = []
    for enc in (png_encode, bmp_encode, ppm_encode):
        row = stage(pd.DataFrame({"media_id": [1], "payload": [enc(img)]}))
        sums.append(int(row["pixel_checksum"].iloc[0]))
    assert sums[0] == sums[1] == sums[2] and sums[0] > 0
