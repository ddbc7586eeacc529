"""Minimal pure-python/numpy PNG codec (zlib is stdlib) so the
multimodal decode seam exercises a GENUINE image decode in this
container (no PIL/libvips available). Supports 8-bit and 16-bit
greyscale, grey+alpha, RGB and RGBA, non-interlaced; the decoder
implements all five PNG scanline filters (which operate on BYTES with
bpp = bytes-per-pixel, so the same unfilter code serves both depths),
the encoder emits filter 0. 16-bit matters for raster payloads:
Landsat DN data is natively uint16, so the media seam can carry tile
buffers as real lossless images end to end.

This is the real-decoder plug for operators/multimodal.decode_image:
payloads starting with the PNG signature decode here; anything else
falls back to the documented deterministic stub.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TO_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 or uint16 array (H, W) or (H, W, C) with C in {1,2,3,4}
    -> PNG bytes (filter 0 scanlines, one IDAT chunk; depth follows
    the input dtype, 16-bit samples big-endian per spec)."""
    depth = 16 if np.asarray(arr).dtype == np.uint16 else 8
    arr = np.ascontiguousarray(arr, dtype=np.uint16 if depth == 16 else np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _CHANNELS_TO_COLOR:
        raise ValueError("expected (H, W[, C<=4]) uint8/uint16 array, got %r" % (arr.shape,))
    h, w, c = arr.shape
    if depth == 16:
        arr = arr.astype(">u2")  # network byte order on the wire
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, _CHANNELS_TO_COLOR[c], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    stride = row.shape[0]
    if ftype == 0:  # none
        return row
    if ftype == 2:  # up — uint8 addition wraps mod 256 as PNG requires
        return row + prev
    cur = row.copy()
    if ftype == 1:  # sub
        for i in range(bpp, stride):
            cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        return cur
    if ftype == 3:  # average
        for i in range(stride):
            left = int(cur[i - bpp]) if i >= bpp else 0
            cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return cur
    if ftype == 4:  # paeth
        for i in range(stride):
            left = int(cur[i - bpp]) if i >= bpp else 0
            ul = int(prev[i - bpp]) if i >= bpp else 0
            cur[i] = (int(cur[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        return cur
    raise ValueError("unknown PNG filter type %d" % ftype)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) array: uint8 for depth 8, uint16 for
    depth 16. Color types 0/2/4/6, non-interlaced; all five scanline
    filters handled (bytewise, bpp = bytes per pixel)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: list[bytes] = []
    meta = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth not in (8, 16):
                raise NotImplementedError("only 8/16-bit PNG supported (depth=%d)" % depth)
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            if color not in _COLOR_TO_CHANNELS:
                raise NotImplementedError("palette PNG not supported (color=%d)" % color)
            meta = (w, h, _COLOR_TO_CHANNELS[color], depth)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, c, depth = meta
    bpp = c * depth // 8  # filters operate on bytes, offset by bpp
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for r in range(h):
        ftype = raw[off]
        off += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off)
        off += stride
        prev = _unfilter_row(ftype, row, prev, bpp)
        out[r] = prev
    if depth == 16:
        return (
            np.frombuffer(out.tobytes(), dtype=">u2")
            .astype(np.uint16)
            .reshape(h, w, c)
        )
    return out.reshape(h, w, c)
