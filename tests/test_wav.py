"""RIFF/WAVE PCM codec + genuine audio decode operators.

WAV PCM is lossless, so round-trips are bitwise; features are
asserted against independent numpy computations over the pre-encode
samples (the media_truth pattern at unit level).
"""

import struct

import numpy as np
import pytest

from rio_toa_spark.functions.wav import decode_wav, encode_wav, is_wav
from rio_toa_spark.operators import multimodal as mm


def _tone(n=4000, ch=1, rate=16_000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    f = 220.0 * (1 + np.arange(ch))[None, :]
    sig = 0.5 * np.sin(2 * np.pi * f * t / rate) + 0.05 * rng.normal(size=(n, ch))
    return np.clip(sig * 32767, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_wav_roundtrip_bitwise(ch):
    s = _tone(ch=ch, seed=ch)
    data = encode_wav(s, sample_rate=22_050)
    assert is_wav(data)
    got, rate = decode_wav(data)
    assert rate == 22_050
    assert got.dtype == np.int16
    assert np.array_equal(got, s)


def test_wav_8bit_widens_to_int16():
    # hand-assembled 8-bit unsigned PCM: x -> (x - 128) << 8
    raw = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(data)
    assert rate == 8000
    assert got[:, 0].tolist() == [(-128) << 8, 0, 127 << 8, (-64) << 8]


def test_wav_rejects_non_pcm_and_truncated():
    s = _tone(n=100)
    good = encode_wav(s)
    # float format id
    bad_fmt = bytearray(good)
    fmt_off = good.find(b"fmt ") + 8
    bad_fmt[fmt_off] = 3
    for bad in (b"junk", good[:30], bytes(bad_fmt)):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_decode_audio_genuine_and_stub(spark):
    s = _tone(n=2000, ch=2, seed=5)
    rows = [
        (1, encode_wav(s, sample_rate=16_000)),
        (2, b"RIFF\x10\x00\x00\x00WAVEjunkjunk"),  # bad WAV -> stub
        (3, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    got = {r.media_id: r for r in mm.decode_audio(df).collect()}
    assert got[1].decode_status == "genuine_wav"
    assert (got[1].n_samples, got[1].n_channels, got[1].sample_rate) == (2000, 2, 16_000)
    assert np.array_equal(
        np.frombuffer(got[1].samples, "<i2").reshape(2000, 2), s
    )
    assert got[2].decode_status == "stub" and got[3].decode_status == "stub"
    exp2, _ = mm._fake_audio(rows[1][1])
    assert np.array_equal(
        np.frombuffer(got[2].samples, "<i2").reshape(-1, 1), exp2
    )


def test_audio_features_match_numpy(spark):
    s = _tone(n=3200, ch=2, seed=9)
    df = spark.createDataFrame([(1, encode_wav(s, sample_rate=16_000))], "media_id int, payload binary")
    row = mm.audio_features(mm.decode_audio(df)).collect()[0]
    assert row.decode_status == "genuine_wav"
    assert row.duration_s == pytest.approx(3200 / 16_000.0)
    f = s.astype(np.float64)
    exp = np.concatenate(
        [
            np.sqrt((f**2).mean(axis=0)),
            np.abs(f).max(axis=0),
            np.abs(np.diff(np.signbit(f).astype(np.int8), axis=0)).mean(axis=0),
        ]
    ).astype(np.float32)
    assert np.allclose(np.array(row.features, dtype=np.float32), exp, rtol=1e-6)


def test_describe_media_wav_vs_avi(spark):
    from rio_toa_spark.functions.avi import encode_avi
    from rio_toa_spark.functions.png import encode_png

    wav = encode_wav(_tone(n=50))
    avi = encode_avi([encode_png(np.zeros((8, 8, 3), np.uint8))], 8, 8, fourcc=b"MPNG")
    df = spark.createDataFrame([(1, wav), (2, avi)], "media_id int, payload binary")
    got = {
        r.media_id: r.media_meta.media_type
        for r in mm.describe_media(df).collect()
    }
    assert got == {1: "audio/wav", 2: "video/avi"}


def test_wav_with_extra_chunks():
    # real WAVs carry LIST/INFO and fact chunks around fmt/data; the
    # RIFF walk must pick the right chunks regardless of order
    import struct

    s = _tone(n=120, ch=1, seed=2)
    pcm = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16_000, 32_000, 2, 16)
    info = b"LIST" + struct.pack("<I", 10) + b"INFOISFT\x00\x00"
    fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 120)
    body = (
        b"WAVE"
        + info
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(data)
    assert rate == 16_000
    assert np.array_equal(got, s)
