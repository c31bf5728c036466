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


# ----------------------------------------------------------- JPEG

from xutil_spark.kernels import jpeg as J  # noqa: E402


@pytest.mark.parametrize("w,h", [(8, 8), (17, 13), (64, 48), (7, 5)])
def test_jpeg_roundtrip_clears_psnr_gate(w, h):
    img = _pattern(w, h, 42)
    data = J.encode_jpeg(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    back = J.decode_jpeg(data)
    assert back.shape == img.shape
    assert codec.psnr(img, back) >= 40.0


def test_jpeg_noise_image_still_clears_gate():
    """DCT-hostile content: uniform random pixels (worst case for a
    transform codec) must still clear the input_hint 40 dB gate at the
    default quantizer."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert codec.psnr(img, J.decode_jpeg(J.encode_jpeg(img))) >= 40.0


def test_jpeg_via_dispatch():
    img = _pattern(24, 16, 3)
    out = codec.decode_image(codec.encode_image(img, "jpg"), 24, 16, "jpg")
    assert codec.psnr(img, out) >= 40.0


def _seg(marker, payload):
    import struct as s

    return s.pack(">HH", marker, len(payload) + 2) + payload


def _headers(h, w, comps, qstep=4):
    """Minimal baseline headers for hand-crafted scan tests: comps =
    [(cid, H, V)], one shared quant + Huffman table set."""
    import struct as s

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, bytes([0x00]) + bytes([qstep] * 64))
    sof = s.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(J._DC_BITS) + bytes(J._DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(J._AC_BITS) + bytes(J._AC_VALS))
    return out


def _quant_block(block, qstep):
    f = J._dct2(block.astype(np.float64) - 128.0).reshape(64)
    return (np.sign(f) * np.floor(np.abs(f) / qstep + 0.5)).astype(
        np.int64).reshape(8, 8)


def test_jpeg_decoder_handles_restart_markers():
    """DRI/RSTn: 3 MCUs with restart interval 1 — byte-aligned resets
    and DC-predictor resets between every MCU."""
    img = _pattern(24, 8, 9)
    ycc = J._ycbcr_from_rgb(img)
    out = _headers(8, 24, [(1, 1, 1), (2, 1, 1), (3, 1, 1)])
    out += _seg(0xFFDD, (1).to_bytes(2, "big"))  # DRI = 1
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    for mcu in range(3):
        bw = J._BitWriter()
        for ci in range(3):  # preds reset each restart interval
            J._encode_block(
                bw, _quant_block(ycc[:, mcu * 8:mcu * 8 + 8, ci], 4), 0)
        out += bw.flush()
        if mcu < 2:
            out += bytes([0xFF, 0xD0 + mcu])
    out += b"\xff\xd9"
    back = J.decode_jpeg(bytes(out))
    assert back.shape == img.shape
    assert codec.psnr(img, back) >= 40.0


def test_jpeg_decoder_handles_420_subsampling():
    """4:2:0 (Y at 2x2, chroma at 1x1): one MCU = 4 Y blocks + Cb +
    Cr, chroma upsampled nearest.  The decoder output is compared
    BIT-EXACTLY against an independent reconstruction (dequant ->
    idct -> repeat-upsample -> color transform) of the same quantized
    blocks -- stronger than any PSNR floor."""
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([(xx * 16).clip(0, 255), (yy * 16).clip(0, 255),
                    ((xx + yy) * 8).clip(0, 255)],
                   axis=-1).astype(np.uint8)
    ycc = J._ycbcr_from_rgb(img)
    sub = ycc[::2, ::2, :]  # chroma decimation
    out = _headers(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bw = J._BitWriter()
    preds = [0, 0, 0]
    blocks = {}
    for by in range(2):  # 4 Y blocks in raster order within the MCU
        for bx in range(2):
            b = _quant_block(
                ycc[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, 0], 4)
            blocks[(0, by, bx)] = b
            preds[0] = J._encode_block(bw, b, preds[0])
    for ci in (1, 2):
        b = _quant_block(sub[:, :, ci], 4)
        blocks[(ci, 0, 0)] = b
        preds[ci] = J._encode_block(bw, b, preds[ci])
    out += bw.flush() + b"\xff\xd9"
    back = J.decode_jpeg(bytes(out))
    assert back.shape == img.shape

    yrec = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            yrec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = J._idct2(
                blocks[(0, by, bx)] * 4.0) + 128
    cbrec = np.repeat(np.repeat(
        J._idct2(blocks[(1, 0, 0)] * 4.0) + 128, 2, 0), 2, 1)
    crrec = np.repeat(np.repeat(
        J._idct2(blocks[(2, 0, 0)] * 4.0) + 128, 2, 0), 2, 1)
    np.testing.assert_array_equal(
        back, J._rgb_from_ycbcr(yrec, cbrec, crrec))
    assert codec.psnr(img, back) >= 30.0  # smooth content, mild chroma loss


def test_jpeg_decoder_handles_grayscale():
    img = _pattern(8, 8, 1)
    y = J._ycbcr_from_rgb(img)[:, :, 0]
    out = _headers(8, 8, [(1, 1, 1)])
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = J._BitWriter()
    J._encode_block(bw, _quant_block(y, 4), 0)
    out += bw.flush() + b"\xff\xd9"
    back = J.decode_jpeg(bytes(out))
    assert back.shape == (8, 8, 3)
    assert np.abs(back[:, :, 0].astype(np.float64) - y).mean() < 3.0
    np.testing.assert_array_equal(back[:, :, 0], back[:, :, 1])


def test_jpeg_rejects_progressive_and_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x01")
    out = _headers(8, 8, [(1, 1, 1)])
    prog = bytes(out).replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(prog + b"\xff\xd9")


def test_jpeg_external_encoder_interop_via_pillow():
    """When Pillow is installed (not in this sandbox): libjpeg output
    (including its default chroma subsampling and Annex K tables) must
    decode through this decoder, and libjpeg must accept this
    encoder's bytes — the conformance check that matters."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _pattern(40, 24, 77)
    buf = io.BytesIO()
    PIL.fromarray(img, "RGB").save(buf, format="JPEG", quality=92)
    ours = J.decode_jpeg(buf.getvalue())
    assert codec.psnr(img, ours) >= 30.0
    theirs = np.asarray(
        PIL.open(io.BytesIO(J.encode_jpeg(img))).convert("RGB"))
    assert codec.psnr(img, theirs) >= 40.0


def test_jpeg_rows_flow_through_spark_decode(spark):
    """A jpg-format row in the input_hint schema decodes through the
    same mapInPandas operators as raw/png — the registry is live in
    the pipeline, not just the kernel."""
    import pandas as pd

    from xutil_spark.raster.images import decode_stats, dhash

    img = _pattern(16, 16, 21)
    rows = pd.DataFrame([
        ("jpg0", J.encode_jpeg(img), 16, 16, "jpg", "cap", 0),
        ("raw0", codec.encode_raw(img), 16, 16, "raw", "cap", 1),
    ], columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
    df = spark.createDataFrame(rows)
    stats = {r.image_id: r for r in decode_stats(df).collect()}
    assert set(stats) == {"jpg0", "raw0"}
    # jpg is lossy-but-gated: per-channel means within 2 of the raw row
    for c in ("mean_r", "mean_g", "mean_b"):
        assert abs(stats["jpg0"][c] - stats["raw0"][c]) <= 2.0
    hashes = {r.image_id: r.dhash for r in dhash(df).collect()}
    # 42+ dB reconstruction keeps the perceptual hash within a few bits
    assert bin(hashes["jpg0"] ^ hashes["raw0"]).count("1") <= 4
