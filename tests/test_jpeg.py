"""Baseline JPEG codec gates (stages/jpeg.py): round-trip error bounds
at both subsamplings, odd dims, restart markers, grayscale and 16-bit
quant-table decode paths, strict rejection of progressive/corrupt
streams, and format-independent pixel semantics through the real
resize path (the cross-format parity gate, extended to the fourth
codec — JPEG is lossy, so its parity bound is a tolerance, not
equality)."""

import struct

import numpy as np
import pytest

from fasta_windows_ray.stages.jpeg import (_AC_CHROMA_BITS,
                                           _AC_CHROMA_VALS, _AC_LUMA_BITS,
                                           _AC_LUMA_VALS, jpeg_decode,
                                           jpeg_encode)
from fasta_windows_ray.stages.multimodal import (ResizeStub, bmp_encode,
                                                 resize_nearest)


def smooth_img(h, w, seed=0):
    """Gentle fixed-slope gradient without %256 wraparound cliffs — the
    regime where JPEG error bounds are tight and assertable (a steep
    chroma gradient through 4:2:0 box-average/replicate is lossy by
    design, so slopes stay at ~3/px)."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([40 + x * 3 + seed, 30 + y * 3, 60 + x + y],
                    axis=2).clip(0, 255).astype(np.uint8)


def test_annex_k_table_sizes():
    assert sum(_AC_LUMA_BITS) == len(_AC_LUMA_VALS) == 162
    assert sum(_AC_CHROMA_BITS) == len(_AC_CHROMA_VALS) == 162


@pytest.mark.parametrize("subsample", [True, False])
@pytest.mark.parametrize("dims", [(32, 32), (17, 13), (8, 40), (9, 9)])
def test_roundtrip_error_bound(subsample, dims):
    img = smooth_img(*dims)
    buf = jpeg_encode(img, quality=92, subsample=subsample)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    out = jpeg_decode(buf)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth content at q92: tight bounds (4:2:0 chroma averaging is
    # the looser of the two)
    assert err.max() <= (12 if subsample else 8)
    assert err.mean() <= 3.0


def test_deterministic_encode():
    img = smooth_img(21, 18)
    assert jpeg_encode(img) == jpeg_encode(img)


def test_restart_markers_roundtrip():
    img = smooth_img(48, 33, seed=2)
    buf = jpeg_encode(img, quality=95, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in buf            # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in buf for i in range(8))
    base = jpeg_decode(jpeg_encode(img, quality=95, subsample=True))
    np.testing.assert_array_equal(jpeg_decode(buf), base)


def test_noise_roundtrip_444():
    img = np.random.default_rng(1).integers(0, 256, (24, 40, 3)) \
            .astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95, subsample=False))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24


def test_grayscale_decode():
    """Genuine 1-component JPEG built from the module's own primitives
    (reference grayscale encoder straight from T.81): the decoder must
    replicate Y to three channels."""
    from fasta_windows_ray.stages.jpeg import (_AC_LUMA_BITS, _AC_LUMA_VALS,
                                               _BitWriter, _DC_LUMA_BITS,
                                               _DC_LUMA_VALS, ZIGZAG,
                                               _build_codes,
                                               _encode_component_blocks,
                                               _pad_edge, _scaled_quant,
                                               _QUANT_LUMA, _huff_block)
    h, w = 14, 19
    y, x = np.mgrid[0:h, 0:w]
    plane = (50 + x * 4 + y * 2).astype(np.uint8)
    ql = _scaled_quant(_QUANT_LUMA, 97)
    zz = _encode_component_blocks(_pad_edge(plane.astype(np.float64),
                                            8, 8), ql)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(v) for v in ql[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])
    for tc, bits, vals in ((0, _DC_LUMA_BITS, _DC_LUMA_VALS),
                           (1, _AC_LUMA_BITS, _AC_LUMA_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0, 0, 63, 0])
    dc = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(zz.shape[0]):
        for bx in range(zz.shape[1]):
            pred = _huff_block(bw, zz[by, bx], pred, dc, ac)
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    dec = jpeg_decode(bytes(out))
    assert dec.shape == (h, w, 3)
    np.testing.assert_array_equal(dec[:, :, 0], dec[:, :, 1])
    np.testing.assert_array_equal(dec[:, :, 0], dec[:, :, 2])
    assert np.abs(dec[:, :, 0].astype(int) - plane.astype(int)).max() <= 4


def test_16bit_quant_table_decode():
    """Pq=1 (16-bit) DQT entries decode identically when values fit
    in 8 bits."""
    img = smooth_img(16, 16, seed=4)
    buf = jpeg_encode(img, quality=90, subsample=False)
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 2] == b"\xff\xdb":
            size, = struct.unpack_from(">H", buf, pos + 2)
            seg = buf[pos + 4:pos + 2 + size]
            tq = seg[0] & 15
            wide = b"".join(struct.pack(">H", v) for v in seg[1:65])
            out += b"\xff\xdb" + struct.pack(">H", 3 + 128) \
                + bytes([(1 << 4) | tq]) + wide
            pos += 2 + size
        else:
            out.append(buf[pos])
            pos += 1
    np.testing.assert_array_equal(jpeg_decode(bytes(out)),
                                  jpeg_decode(buf))


def test_rejections():
    img = smooth_img(8, 8)
    buf = bytearray(jpeg_encode(img))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        jpeg_decode(bytes(buf[:40]))              # truncated segment
    i = buf.find(b"\xff\xc0")
    prog = bytes(buf[:i + 1]) + b"\xc2" + bytes(buf[i + 2:])
    with pytest.raises(ValueError):
        jpeg_decode(prog)                         # progressive
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((0, 4, 3), np.uint8))


def test_format_parity_through_resize_stage():
    """Same image as BMP (lossless) and JPEG (lossy) through the real
    ResizeStub path: JPEG takes the genuine decode→resample→re-encode
    route (src dims reported, checksum within the quantization-error
    bound of the lossless one)."""
    import pandas as pd
    img = smooth_img(19, 23, seed=6)
    stage = ResizeStub(width=6, height=5, strict=True)
    jbuf = jpeg_encode(img, quality=95, subsample=False)
    rows = stage(pd.DataFrame({
        "media_id": [1, 2], "payload": [bmp_encode(img), jbuf]}))
    assert list(rows["src_height"]) == [19, 19]
    assert list(rows["src_width"]) == [23, 23]
    ref, jp = int(rows["pixel_checksum"].iloc[0]), \
        int(rows["pixel_checksum"].iloc[1])
    # 30 pixels x sum-weight 15 x max per-channel error ~8
    assert jp > 0 and abs(jp - ref) <= 30 * 15 * 8
    # the md5 is of the genuinely re-encoded JPEG of the resample
    import hashlib
    want = hashlib.md5(jpeg_encode(
        resize_nearest(jpeg_decode(jbuf), 5, 6))).hexdigest()
    assert rows["resized_md5"].iloc[1] == want
