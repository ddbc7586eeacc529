"""Property-based invariants (hypothesis) for the pure kernels —
no Spark session needed, so these run in milliseconds and explore
inputs the example-based tests never pick.

* Morton encode/decode roundtrip + monotone locality of parents
* TOA kernel algebra: radiance linearity, reflectance clip bounds,
  brightness-temp monotonicity, rescale range safety
* PNG codec roundtrip on arbitrary shapes/channels
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rio_toa_spark.functions import kernels
from rio_toa_spark.functions.png import decode_png, encode_png
from rio_toa_spark.spatial import cells as cm

_finite = dict(allow_nan=False, allow_infinity=False)


@given(
    st.lists(st.integers(0, (1 << 16) - 1), min_size=1, max_size=64),
    st.lists(st.integers(0, (1 << 16) - 1), min_size=1, max_size=64),
)
def test_morton_roundtrip(xs, ys):
    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], dtype=np.int64)
    y = np.asarray(ys[:n], dtype=np.int64)
    code = cm.morton_encode(x, y)
    rx, ry = cm.morton_decode(code)
    assert np.array_equal(rx, x) and np.array_equal(ry, y)


@given(
    st.floats(-180, 180, **_finite),
    st.floats(-90, 90, **_finite),
    st.integers(1, 12),
    st.integers(1, 3),
)
def test_cell_parent_contains_point(lon, lat, level, k):
    """A point's coarse cell must equal the Morton parent of its fine
    cell whenever both levels are valid."""
    if level - k < 0:
        return
    fine = cm.cell_of_points([lon], [lat], level)
    coarse = cm.cell_of_points([lon], [lat], level - k)
    assert cm.cell_parent(fine, k)[0] == coarse[0]


@given(
    st.lists(st.integers(0, 65535), min_size=1, max_size=128),
    st.floats(1e-6, 1e-2, **_finite),
    st.floats(-100, 100, **_finite),
)
def test_radiance_linear_in_dn(dns, ml, al):
    img = np.asarray(dns, dtype=np.uint16)
    out = kernels.radiance(img, ml, al, src_nodata=None)
    exp = (np.float32(ml) * img.astype(np.float32)) + np.float32(al)
    assert np.array_equal(out, exp.astype(np.float32))


@given(
    st.lists(st.integers(1, 65535), min_size=1, max_size=128),
    st.floats(1e-6, 1e-4, **_finite),
    st.floats(-0.2, 0.2, **_finite),
    st.floats(1.0, 89.0, **_finite),
)
def test_reflectance_clipped_to_unit_interval_after_rescale(dns, mr, ar, e):
    img = np.asarray(dns, dtype=np.uint16)
    refl = kernels.reflectance(img, mr, ar, e, src_nodata=0)
    out = kernels.rescale(refl, 1.0, "float32", clip=True)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)


@given(st.lists(st.integers(1, 65535), min_size=2, max_size=64))
def test_brightness_temp_monotone_in_dn(dns):
    """For positive radiance coefficients, hotter DN -> hotter K."""
    img = np.sort(np.asarray(dns, dtype=np.uint16))
    t = kernels.brightness_temp(img, 3.3420e-04, 0.1, 774.8853, 1321.0789, src_nodata=None)
    assert np.all(np.diff(t) >= 0)


@given(
    st.lists(st.floats(0.0, 1.0, width=32, **_finite), min_size=1, max_size=64),
    st.sampled_from(["uint8", "uint16"]),
)
def test_rescale_clip_respects_dtype_range(vals, dtype):
    arr = np.asarray(vals, dtype=np.float32)
    factor = float(np.iinfo(np.dtype(dtype)).max)
    out = kernels.rescale(arr, factor, dtype, clip=True)
    info = np.iinfo(np.dtype(dtype))
    assert out.dtype == np.dtype(dtype)
    assert out.min() >= info.min and out.max() <= info.max


@settings(deadline=None, max_examples=25)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(1, 4),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_random_shapes(h, w, c, seed):
    arr = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(1, 4),
    st.sampled_from([np.uint8, np.uint16]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, c, dtype, seed):
    """encode->decode is the identity for every shape/channel/depth."""
    rng = np.random.default_rng(seed)
    hi = 256 if dtype == np.uint8 else 65536
    arr = rng.integers(0, hi, size=(h, w, c), dtype=dtype)
    out = decode_png(encode_png(arr))
    assert out.dtype == dtype
    assert np.array_equal(out, arr)


@given(st.binary(min_size=0, max_size=300), st.integers(0, 3))
@settings(max_examples=150, deadline=None)
def test_codec_fuzz_never_hangs_or_leaks_exceptions(data, sig):
    """Arbitrary bytes forced under each codec signature must either
    decode or raise one of the documented parse-error types — the
    decode seam's never-raises contract depends on this closed set."""
    import struct
    import zlib

    from rio_toa_spark.functions.avi import avi_frames
    from rio_toa_spark.functions.jpeg import decode_jpeg
    from rio_toa_spark.functions.wav import decode_wav

    prefixes = [
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff",
        b"RIFF\xff\x00\x00\x00AVI ",
        b"RIFF\xff\x00\x00\x00WAVE",
    ]
    payload = prefixes[sig] + data
    decoders = [decode_png, decode_jpeg, avi_frames, decode_wav]
    try:
        decoders[sig](payload)
    except (ValueError, KeyError, IndexError, NotImplementedError,
            struct.error, zlib.error):
        pass


@given(
    st.integers(1, 400),
    st.integers(1, 3),
    st.integers(0, 2**31 - 1),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, ch, seed, rate):
    from rio_toa_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-(1 << 15), 1 << 15, size=(n, ch), dtype=np.int16)
    got, r = decode_wav(encode_wav(s, sample_rate=rate))
    assert r == rate
    assert np.array_equal(got, s)


@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
    st.integers(1, 640),
    st.integers(1, 480),
)
@settings(max_examples=60, deadline=None)
def test_avi_container_roundtrip_property(frames, w, h):
    """encode_avi -> avi_frames is the identity on arbitrary frame
    payloads (any sizes/parities — word-alignment must never corrupt
    or shift a byte), and the header metadata survives."""
    from rio_toa_spark.functions.avi import avi_frames, avi_meta, encode_avi

    data = encode_avi(frames, w, h, fourcc=b"MJPG")
    assert avi_frames(data) == frames
    meta = avi_meta(data)
    assert (meta["total_frames"], meta["width"], meta["height"]) == (len(frames), w, h)


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 3]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_progressive_decode_equals_baseline_property(h, w, c, seed):
    """Progressive scans carry the same quantized coefficients as the
    baseline stream, so decode must agree pixel-for-pixel on ANY
    shape — including single-block, tall, wide, and odd sizes."""
    from rio_toa_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=88))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=88))
    assert np.array_equal(base, prog)
