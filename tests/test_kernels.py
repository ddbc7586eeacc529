"""Unit tests for the numpy TOA kernels (the port of the reference's
literal tiny-array tests, tests/test_radiance.py:13-48,
test_reflectance.py:49-96, plus hypothesis-style property checks like
test_brightness_temp.py:52-97)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from rio_toa_spark.functions import kernels


def test_radiance_literal():
    dn = np.array([[0, 100, 65535], [1, 2, 3]], dtype=np.uint16)
    ml, al = 0.01, -5.0
    out = kernels.radiance(dn, ml, al)
    assert out.dtype == np.float32
    expected = (0.01 * dn.astype(np.float32) - 5.0).astype(np.float32)
    expected[dn == 0] = 0.0
    assert np.array_equal(out, expected)


def test_radiance_nodata_none_keeps_zero_pixels():
    dn = np.array([[0, 10]], dtype=np.uint16)
    out = kernels.radiance(dn, 2.0, 1.0, src_nodata=None)
    assert out[0, 0] == 1.0  # 2*0+1, not masked
    assert out[0, 1] == 21.0


def test_reflectance_literal_scalar_e():
    dn = np.array([[0, 5000], [10000, 20000]], dtype=np.uint16)
    mr, ar, e = 2.0e-5, -0.1, 30.0
    out = kernels.reflectance(dn, mr, ar, e)
    raw = (2.0e-5 * dn.astype(np.float32) - 0.1) / np.sin(np.deg2rad(30.0))
    raw[dn == 0] = 0.0
    assert out.dtype == np.float32
    assert np.array_equal(out, raw)


def test_reflectance_negative_sun_raises():
    dn = np.ones((2, 2), dtype=np.uint16)
    with pytest.raises(ValueError):
        kernels.reflectance(dn, 2e-5, -0.1, -1.0)
    grid = np.array([[10.0, -0.001], [5.0, 5.0]])
    with pytest.raises(ValueError):
        kernels.reflectance(dn, 2e-5, -0.1, grid)


def test_reflectance_multiband_roundtrip_shape():
    dn = np.arange(24, dtype=np.uint16).reshape(3, 2, 4)
    out = kernels.reflectance(dn, [1e-5, 2e-5, 3e-5], [-0.1, -0.2, -0.3], 45.0)
    assert out.shape == dn.shape
    # band 1 plane uses its own M/A
    expected_b1 = (2e-5 * dn[1].astype(np.float32) - 0.2) / np.sin(np.deg2rad(45.0))
    expected_b1[dn[1] == 0] = 0.0
    assert np.allclose(out[1], expected_b1)


def test_brightness_temp_literal():
    dn = np.array([[0, 20000], [30000, 40000]], dtype=np.uint16)
    ml, al, k1, k2 = 3.342e-4, 0.1, 774.8853, 1321.0789
    out = kernels.brightness_temp(dn, ml, al, k1, k2)
    lum = (ml * dn.astype(np.float32) + al).astype(np.float32)
    lum[dn == 0] = np.nan
    expected = k2 / np.log(k1 / lum + 1)
    assert np.isnan(out[0, 0])
    assert np.allclose(out[dn != 0], expected[dn != 0])


def test_rescale_clip_and_cast():
    arr = np.array([-0.5, 0.0, 0.5, 1.0, 2.0], dtype=np.float32)
    out = kernels.rescale(arr, 255, np.uint8, clip=True)
    assert out.dtype == np.uint8
    assert out.tolist() == [0, 0, 127, 255, 255]


def test_rescale_overflow_raises_without_clip():
    arr = np.array([2.0], dtype=np.float32)
    with pytest.raises(ValueError):
        kernels.rescale(arr, 65535, np.uint16, clip=False)
    # in-range values pass
    out = kernels.rescale(np.array([0.5], dtype=np.float32), 100, np.uint16, clip=False)
    assert out[0] == 50


def test_rescale_does_not_mutate_input():
    arr = np.array([2.0], dtype=np.float32)
    kernels.rescale(arr, 255, np.uint8, clip=True)
    assert arr[0] == 2.0


def test_temp_rescale():
    arr = np.array([273.15], dtype=np.float32)
    assert kernels.temp_rescale(arr, "K")[0] == pytest.approx(273.15)
    assert kernels.temp_rescale(arr, "C")[0] == pytest.approx(0.0)
    assert kernels.temp_rescale(arr, "F")[0] == pytest.approx(32.0, abs=1e-3)
    with pytest.raises(ValueError):
        kernels.temp_rescale(arr, "X")


def test_normalize_scale_defaults():
    assert kernels.normalize_scale(None, "uint8") == 255
    assert kernels.normalize_scale(None, "uint16") == 65535
    assert kernels.normalize_scale(None, "float32") == 1.0
    assert kernels.normalize_scale(None, "int32") == 1.0
    assert kernels.normalize_scale(7.5, "uint8") == 7.5


@settings(max_examples=50, deadline=None)
@given(
    dn=arrays(np.uint16, (3, 8, 8), elements=st.integers(0, 65535)),
    ml=st.floats(1e-6, 1e-2),
    al=st.floats(-100.0, 100.0),
)
def test_radiance_property_matches_inline_formula(dn, ml, al):
    out = kernels.radiance(dn[0], ml, al)
    ref = ml * dn[0].astype(np.float32) + al
    ref[dn[0] == 0] = 0.0
    assert np.array_equal(out, ref, equal_nan=True)


@settings(max_examples=50, deadline=None)
@given(
    dn=arrays(np.uint16, (4, 4), elements=st.integers(1, 65535)),
    k1=st.floats(400.0, 800.0),
    k2=st.floats(1100.0, 1400.0),
)
def test_brightness_temp_property(dn, k1, k2):
    ml, al = 3.342e-4, 0.1
    out = kernels.brightness_temp(dn, ml, al, k1, k2)
    lum = ml * dn.astype(np.float32) + al
    ref = k2 / np.log(k1 / lum + 1)
    assert np.allclose(out, ref, equal_nan=True)


def test_brightness_temp_non_python_scalars_keep_f64_upcast():
    # non-python-scalar K1/K2 (array-likes: the multiband constant
    # shape) must take the expression path, whose value-based casting
    # upcasts to f64 — the in-place f32 fusion would silently
    # double-round. Same guard radiance applies to ML/AL (ADVICE r03).
    dn = np.array([[100, 200], [0, 40000]], dtype=np.uint16)
    ml, al = 3.342e-4, 0.1
    k1 = np.array([774.8853])
    k2 = np.array([1321.0789])
    got = kernels.brightness_temp(dn, ml, al, k1, k2)
    lum = ml * dn.astype(np.float32) + al
    lum[dn == 0] = np.nan
    exp = k2 / np.log((k1 / lum) + 1)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, exp)
    # python-float constants still hit the fused path and stay f32
    fused = kernels.brightness_temp(dn, ml, al, 774.8853, 1321.0789)
    assert fused.dtype == np.float32
