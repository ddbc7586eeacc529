"""Pure-python RIFF/WAVE PCM codec — the audio sibling of
functions/avi.py (same RIFF chunk walking) so the multimodal seam's
audio branch is a GENUINE decode, not a stub: WAV is fixed
little-endian headers plus raw PCM, zero dependencies.

Supports uncompressed PCM, 8-bit unsigned and 16-bit signed, any
channel count/sample rate. Non-PCM formats (float, ADPCM, extensible)
raise ValueError and fall to the operator's documented stub with
``decode_status='stub'``.
"""

from __future__ import annotations

import struct

import numpy as np

from rio_toa_spark.functions.avi import _walk

WAV_RIFF = b"RIFF"
WAV_FORM = b"WAVE"


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == WAV_RIFF and data[8:12] == WAV_FORM


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 (n,) or (n, channels) -> PCM16 WAV bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) int16 samples")
    n, ch = samples.shape
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        ch,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        16,  # bits per sample
    )
    # interleaved little-endian frames
    data = samples.astype("<i2").tobytes()
    body = (
        WAV_FORM
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n, channels), sample_rate).
    8-bit unsigned PCM is widened to int16 ((x-128) << 8)."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    fmt = None
    pcm = None
    for tag, p, sz in _walk(data, 12, end):
        if tag == b"fmt " and sz >= 16:
            fmt = struct.unpack_from("<HHIIHH", data, p)
        elif tag == b"data":
            pcm = data[p : p + sz]
    if fmt is None or pcm is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError("only uncompressed PCM WAV supported (format=%d)" % audio_format)
    if ch < 1:
        raise ValueError("WAV: zero channels")
    if bits == 16:
        samples = np.frombuffer(pcm[: (len(pcm) // (2 * ch)) * 2 * ch], dtype="<i2")
        samples = samples.astype(np.int16).reshape(-1, ch)
    elif bits == 8:
        samples = np.frombuffer(pcm[: (len(pcm) // ch) * ch], dtype=np.uint8)
        samples = ((samples.astype(np.int16) - 128) << 8).reshape(-1, ch)
    else:
        raise ValueError("only 8/16-bit PCM WAV supported (bits=%d)" % bits)
    return samples, rate
