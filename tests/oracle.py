"""Independent numpy transliteration of the reference workers, used as
the golden oracle in tests. Deliberately written inline (no reuse of
rio_toa_spark.functions.kernels) so engine-vs-oracle comparisons are
not tautological.

Semantics transliterated from:
  _radiance_worker         rio_toa/radiance.py:45-61
  _reflectance_worker      rio_toa/reflectance.py:77-128
  _brightness_temp_worker  rio_toa/brightness_temp.py:65-91
  rescale / temp_rescale   rio_toa/toa_utils.py:121-153
  sun_utils                rio_toa/sun_utils.py:6-215
"""

from __future__ import annotations

import datetime

import numpy as np


def _rescale(arr, factor, dtype, clip=True):
    arr = arr.copy()
    if clip:
        arr[arr < 0.0] = 0.0
        arr[arr > 1.0] = 1.0
    arr *= factor
    return arr.astype(dtype)


def radiance_worker(dn: np.ndarray, M, A, src_nodata, factor, dtype, clip=True):
    rs = M * dn.astype(np.float32) + A
    if src_nodata is not None:
        rs[dn == src_nodata] = 0.0
    return _rescale(rs, factor, dtype, clip)


def sun_elevation_grid(bbox, shape, date_str, time_str):
    rows, cols = shape
    w, s, e, n = bbox
    utc = datetime.datetime.strptime(
        (date_str + " " + time_str).split(".")[0], "%Y-%m-%d %H:%M:%S"
    )
    dec_hour = utc.hour + utc.minute / 60.0 + utc.second / 3600.0
    day = utc.timetuple().tm_yday
    xcell = (e - w) / float(cols)
    ycell = (n - s) / float(rows)
    lat_i, lng_i = np.indices((rows, cols), dtype=np.float32)
    lng = lng_i * xcell + w + xcell / 2.0
    lat = np.flipud(lat_i) * ycell + s + ycell / 2.0

    declination = np.arcsin(np.sin(np.deg2rad(23.45)) * np.sin(np.deg2rad(360.0 / 365.0) * (day - 81)))
    localtime = (lng / 180.0) * 12 + dec_hour
    lstm = 15 * (localtime - dec_hour)
    B = np.deg2rad((360.0 / 365.0) * (day - 81))
    eot = 9.87 * np.sin(2 * B) - 7.53 * np.cos(B) - 1.5 * np.sin(B)
    solar_angle = 15 * (localtime + (4 * (lng - lstm) + eot) / 60.0 - 12)
    hour_angle = np.deg2rad(solar_angle)
    lat_r = np.deg2rad(lat)
    return np.rad2deg(
        np.arcsin(
            np.sin(declination) * np.sin(lat_r)
            + np.cos(declination) * np.cos(lat_r) * np.cos(hour_angle)
        )
    )


def reflectance_worker(
    dn: np.ndarray,
    M_list,
    A_list,
    E_scalar,
    src_nodata,
    factor,
    dtype,
    clip=True,
    pixel_sunangle=False,
    bbox=None,
    date_str=None,
    time_str=None,
):
    """dn: (rows, cols) uint16 for a single band (depth-1 stack)."""
    rows, cols = dn.shape
    data = dn.astype(np.float32)[np.newaxis, :, :]
    depth = 1
    if pixel_sunangle:
        E = sun_elevation_grid(bbox, (rows, cols), date_str, time_str).reshape(rows, cols, 1)
    else:
        E = np.array([E_scalar for _ in range(depth)])

    if np.any(E < 0.0):
        raise ValueError("negative sun elevation")
    img = np.rollaxis(data, 0, 3)
    rf = ((M_list * img.astype(np.float32)) + A_list) / np.sin(np.deg2rad(E))
    if src_nodata is not None:
        rf[img == src_nodata] = 0.0
    rf = np.rollaxis(rf, 2, 0)
    return _rescale(rf, factor, dtype, clip)


def brightness_temp_worker(dn: np.ndarray, M, A, K1, K2, src_nodata, temp_scale, dtype):
    L = M * dn.astype(np.float32) + A
    L[dn == 0] = 0.0
    L[dn == src_nodata] = np.nan
    T = K2 / np.log((K1 / L) + 1)
    if temp_scale == "F":
        T = T * (9 / 5.0) - 459.67
    elif temp_scale == "C":
        T = T - 273.15
    return T.astype(dtype)
