"""Image codec tests: raw + pure numpy/zlib PNG, PSNR gate."""

import numpy as np
import pytest
import zlib

from xutil_spark.kernels import codec


def _pattern(w, h, seed):
    """Deterministic gradient + hash-noise test image (FIXTURES.md §1)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx * 31 + yy * 17 + seed) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


@pytest.mark.parametrize("w,h", [(16, 16), (32, 24), (64, 48), (1, 1), (7, 3)])
def test_raw_roundtrip(w, h):
    img = _pattern(w, h, 42)
    data = codec.encode_raw(img)
    assert len(data) == w * h * 3
    back = codec.decode_raw(data, w, h)
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("w,h", [(16, 16), (32, 24), (64, 48), (1, 1), (7, 3)])
def test_png_roundtrip(w, h):
    img = _pattern(w, h, 7)
    data = codec.encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = codec.decode_png(data)
    np.testing.assert_array_equal(back, img)


def test_png_decoder_handles_sub_and_up_filters():
    """Build a PNG with filter types 1 (Sub) and 2 (Up) by hand."""
    import struct

    img = _pattern(4, 2, 3)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int32)
    rows = []
    # row 0: Sub filter
    r0 = flat[0].copy()
    enc0 = r0.copy()
    enc0[3:] = (r0[3:] - r0[:-3]) & 0xFF
    rows.append(bytes([1]) + bytes(enc0.astype(np.uint8)))
    # row 1: Up filter
    enc1 = (flat[1] - flat[0]) & 0xFF
    rows.append(bytes([2]) + bytes(enc1.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = zlib.compress(b"".join(rows))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", payload)
        + codec._chunk(b"IEND", b"")
    )
    back = codec.decode_png(png)
    np.testing.assert_array_equal(back, img)


def test_encode_image_dispatch_and_stub():
    img = _pattern(8, 8, 1)
    assert codec.decode_image(codec.encode_image(img, "raw"), 8, 8, "raw").shape == (8, 8, 3)
    assert codec.decode_image(codec.encode_image(img, "png"), 8, 8, "png").shape == (8, 8, 3)
    with pytest.raises(NotImplementedError):
        codec.encode_image(img, "jpeg")  # codec libs absent — stubbed


def test_psnr():
    img = _pattern(32, 32, 9)
    assert codec.psnr(img, img) == float("inf")
    noisy = img.astype(np.int32).copy()
    noisy[0, 0, 0] += 4
    p = codec.psnr(img, np.clip(noisy, 0, 255).astype(np.uint8))
    assert p > 40.0  # single tiny perturbation stays above the lossy gate
    very_noisy = np.clip(img.astype(np.int32) + 64, 0, 255).astype(np.uint8)
    assert codec.psnr(img, very_noisy) < 40.0


def test_png_decoder_handles_average_and_paeth_filters():
    """Filters 3 (Average) and 4 (Paeth) built by hand with the spec's
    per-byte ENCODER (the inverse recurrence) — decode must restore the
    original image exactly (regression for the vectorized decoder)."""
    import struct

    img = _pattern(6, 3, 3)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int32)
    bpp = 3

    def enc_row(f, cur, prev):
        out = np.zeros(w * 3, dtype=np.int32)
        for i in range(w * 3):
            a = cur[i - bpp] if i >= bpp else 0  # decoded left = original
            b = prev[i]
            if f == 3:
                out[i] = (cur[i] - ((a + b) >> 1)) & 0xFF
            else:
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (cur[i] - pr) & 0xFF
        return out

    zero = np.zeros(w * 3, dtype=np.int32)
    rows = [
        bytes([3]) + bytes(enc_row(3, flat[0], zero).astype(np.uint8)),
        bytes([4]) + bytes(enc_row(4, flat[1], flat[0]).astype(np.uint8)),
        bytes([3]) + bytes(enc_row(3, flat[2], flat[1]).astype(np.uint8)),
    ]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + codec._chunk(b"IEND", b"")
    )
    back = codec.decode_png(png)
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("w,h", [(16, 16), (32, 24), (64, 48), (1, 1), (7, 3)])
def test_q6_lossy_roundtrip_psnr_gate(w, h):
    """The lossy format satisfies the input_hint acceptance gate on any
    image: allclose within the quantizer's error bound and PSNR >= 40
    (>= 42.1 by construction: max per-sample error 2)."""
    img = _pattern(w, h, 13)
    data = codec.encode_q6(img)
    assert len(data) == ((w * h * 3 + 3) // 4) * 3  # 25% under raw
    back = codec.decode_q6(data, w, h)
    assert back.shape == img.shape and back.dtype == np.uint8
    err = back.astype(np.int32) - img.astype(np.int32)
    assert np.abs(err).max() <= 2  # allclose, atol = quantizer bound
    assert codec.psnr(img, back) >= 40.0


def test_q6_worst_case_image_still_clears_gate():
    # every value hits the max quantization error simultaneously
    img = np.zeros((8, 8, 3), dtype=np.uint8)  # 0 -> rec 2, err 2
    back = codec.decode_q6(codec.encode_q6(img), 8, 8)
    assert np.all(back == 2)
    p = codec.psnr(img, back)
    assert 42.0 <= p <= 42.2  # 20*log10(255/2)


def test_q6_via_dispatch_and_spark_reencode():
    img = _pattern(32, 24, 99)
    data = codec.encode_image(img, "q6")
    back = codec.decode_image(data, 32, 24, "q6")
    assert codec.psnr(img, back) >= 40.0
    # re-quantizing the reconstruction is a fixed point (codes preserved)
    again = codec.decode_image(codec.encode_image(back, "q6"), 32, 24, "q6")
    np.testing.assert_array_equal(again, back)


@pytest.mark.parametrize("w,h", [(8, 8), (7, 5), (33, 9)])
def test_bmp_roundtrip_incl_row_padding(w, h):
    """BI_RGB 24-bit roundtrip; odd widths exercise the 4-byte row
    padding, and both row orders decode."""
    img = _pattern(w, h, 31)
    data = codec.encode_bmp(img)
    assert data[:2] == b"BM"
    back = codec.decode_bmp(data)
    np.testing.assert_array_equal(back, img)
    # top-down variant (negative height) from an external writer
    import struct as _s

    stride = (w * 3 + 3) & ~3
    raw = np.zeros((h, stride), dtype=np.uint8)
    raw[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)
    off = 14 + 40
    td = (_s.pack("<2sIHHI", b"BM", off + raw.size, 0, 0, off)
          + _s.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, raw.size,
                    2835, 2835, 0, 0) + raw.tobytes())
    np.testing.assert_array_equal(codec.decode_bmp(td), img)


def test_bmp_via_dispatch():
    img = _pattern(16, 16, 7)
    out = codec.decode_image(codec.encode_image(img, "bmp"), 16, 16, "bmp")
    np.testing.assert_array_equal(out, img)


def test_external_encoder_interop_via_pillow():
    """When Pillow is installed (not in this sandbox), its BMP and PNG
    output must decode bit-exactly through the pure-numpy codecs —
    the registry's non-synthetic-format proof."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _pattern(21, 13, 55)
    for fmt, dec in (("BMP", codec.decode_bmp),
                     ("PNG", codec.decode_png)):
        buf = io.BytesIO()
        PIL.fromarray(img, "RGB").save(buf, format=fmt)
        np.testing.assert_array_equal(dec(buf.getvalue()), img)
