"""Pure-numpy baseline JPEG codec (functions/jpeg.py).

The decoder is pinned by a SPEC-LEVEL fixture: a minimal grayscale
JPEG hand-assembled from ITU-T T.81 (Annex K tables, hand-derived
huffman bits), so an encoder bug cannot cancel a decoder bug. The
encoder is then exercised via decode round-trips (PSNR — JPEG is
lossy) and a bitstream-equality check against the hand-derived
entropy bytes for a flat block.
"""

import struct

import numpy as np
import pytest

from rio_toa_spark.functions import jpeg


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _minimal_gray_jpeg():
    """Hand-assembled 8x8 grayscale baseline JPEG, flat value 128.

    Entropy data derived from the spec by hand: DC category 0 under the
    Annex K luma DC table is code '00'; AC EOB (symbol 0x00) under the
    Annex K luma AC table is '1010'; 6 bits padded with 1-bits ->
    0b00101011 = 0x2B.
    """
    q = jpeg._K1_LUMA.reshape(-1)[jpeg._ZZ].astype(np.uint8)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(q))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    bits, values = jpeg._DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(values))
    bits, values = jpeg._AC_LUMA
    out += _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(values))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0x2B])
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_spec_level_fixture():
    arr = jpeg.decode_jpeg(_minimal_gray_jpeg())
    assert arr.shape == (8, 8, 1)
    assert arr.dtype == np.uint8
    assert (arr == 128).all()


def test_flat_rgb_block_entropy_bytes_match_hand_derivation():
    """Flat RGB 128 -> Y=128, Cb=Cr=128: every coefficient is zero.
    Hand-derived entropy stream: Y '00'+'1010', Cb/Cr '00'+'00' each
    (chroma DC cat0 = '00', chroma EOB = '00'), 14 bits padded with
    1-bits -> 0x28 0x03."""
    data = jpeg.encode_jpeg(np.full((8, 8, 3), 128, np.uint8), quality=85)
    sos = data.find(b"\xff\xda")
    seg_len = struct.unpack(">H", data[sos + 2 : sos + 4])[0]
    entropy = data[sos + 2 + seg_len : -2]
    assert entropy == bytes([0x28, 0x03])
    arr = jpeg.decode_jpeg(data)
    assert (arr == 128).all() and arr.shape == (8, 8, 3)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (17, 13)])
def test_roundtrip_gray_psnr(shape):
    rng = np.random.default_rng(7)
    # smooth content (JPEG-friendly): low-frequency gradient + mild noise
    y, x = np.indices(shape)
    img = (96 + 3 * x + 2 * y + rng.integers(0, 6, shape)).clip(0, 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert out.shape == (*shape, 1)
    err = out[:, :, 0].astype(np.float64) - img
    psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
    assert psnr > 30.0, psnr


def test_roundtrip_rgb_psnr():
    rng = np.random.default_rng(11)
    y, x = np.indices((24, 40))
    img = np.stack(
        [(40 + 4 * x) % 256, (30 + 3 * y) % 256, (60 + x + y) % 256], axis=2
    ).astype(np.uint8)
    img = (img.astype(np.int32) + rng.integers(0, 5, img.shape)).clip(0, 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    err = out.astype(np.float64) - img
    psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
    assert psnr > 28.0, psnr


def test_decode_image_operator_routes_jpeg(spark):
    from rio_toa_spark.operators.multimodal import decode_image

    img = np.full((16, 8, 3), 200, np.uint8)
    payload = jpeg.encode_jpeg(img, quality=90)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = decode_image(df).collect()[0]
    assert (row.height, row.width, row.channels) == (16, 8, 3)
    got = np.frombuffer(row.pixels, np.uint8).reshape(16, 8, 3)
    assert abs(got.astype(int) - 200).max() <= 4  # flat block, small quant error


@pytest.mark.parametrize("shape", [(16, 16), (24, 40), (18, 21)])
def test_roundtrip_rgb_420_psnr(shape):
    """4:2:0 exercises the decoder's sampling-factor MCU layout and
    chroma upsampling."""
    h, w = shape
    y, x = np.indices(shape)
    img = np.stack(
        [(50 + 2 * x) % 256, (80 + 2 * y) % 256, (90 + x + y) % 256], axis=2
    ).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95, subsampling="420"))
    assert out.shape == img.shape
    err = out.astype(np.float64) - img
    psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
    assert psnr > 26.0, psnr


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_roundtrip_with_restart_markers(subsampling):
    """DRI/RSTn: predictor resets and bitstream resync must decode to
    the same image as the marker-free encoding."""
    y, x = np.indices((32, 48))
    img = np.stack(
        [(60 + 2 * x) % 256, (90 + y) % 256, (30 + x + 2 * y) % 256], axis=2
    ).astype(np.uint8)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92, subsampling=subsampling))
    rst = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=92, subsampling=subsampling, restart_interval=2)
    )
    assert (plain == rst).all()  # identical quantized content, markers transparent
