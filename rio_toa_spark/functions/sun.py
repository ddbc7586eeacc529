"""Per-pixel solar geometry — numpy, float32-parity with rio-toa.

Computes the sun-elevation grid for a tile given its WGS84 bounds and
the scene acquisition timestamp. Runs inside the reflectance Arrow UDF
(per tile, embarrassingly parallel) — the Spark equivalent of the
per-window computation at rio_toa/reflectance.py:100-111.

Math parity notes (all against /root/reference/rio_toa/sun_utils.py):
* parse_utc_string      :6-33   — strict regex, fractional secs dropped
* time_to_dec_hour      :36-52
* calculate_declination :55-77
* solar_angle           :80-110 — LSTM + equation of time
* _calculate_sun_elevation :113-145
* _create_lnglats       :148-173 — float32 index grids, flipud lat
* sun_elevation         :176-215

The lng/lat meshes are float32 (np.indices dtype=float32) and scalar
constants stay python floats, so intermediate dtypes — and therefore
float32 rounding — match the reference bit-for-bit.
"""

from __future__ import annotations

import datetime
import re

import numpy as np

_UTC_RE = re.compile(r"\d{4}\-\d{2}\-\d{2}\ \d{2}\:\d{2}\:\d{2}\.\d+Z")


def parse_utc_string(collected_date: str, collected_time_utc: str) -> datetime.datetime:
    """Parse 'YYYY-MM-DD' + 'HH:MM:SS.fffZ' into a datetime; fractional
    seconds are dropped. Raises ValueError on any format deviation."""
    utcstr = collected_date + " " + collected_time_utc
    if not _UTC_RE.match(utcstr):
        raise ValueError("%s is an invalid utc time" % utcstr)
    return datetime.datetime.strptime(utcstr.split(".")[0], "%Y-%m-%d %H:%M:%S")


def time_to_dec_hour(parsedtime: datetime.datetime) -> float:
    """Decimal hour of day: h + m/60 + s/3600."""
    return parsedtime.hour + parsedtime.minute / 60.0 + parsedtime.second / 60.0**2


def calculate_declination(day_of_year: int):
    """Solar declination (radians) for a given day-of-year."""
    return np.arcsin(
        np.sin(np.deg2rad(23.45)) * np.sin(np.deg2rad(360.0 / 365.0) * (day_of_year - 81))
    )


def solar_angle(day_of_year: int, utc_hour: float, longitude):
    """Solar hour angle (degrees) for the given longitudes, using local
    solar time mean + the 9.87/7.53/1.5 equation-of-time correction."""
    localtime = (longitude / 180.0) * 12 + utc_hour
    lstm = 15 * (localtime - utc_hour)
    b = np.deg2rad((360.0 / 365.0) * (day_of_year - 81))
    eot = 9.87 * np.sin(2 * b) - 7.53 * np.cos(b) - 1.5 * np.sin(b)
    return 15 * (localtime + (4 * (longitude - lstm) + eot) / 60.0 - 12)


def _calculate_sun_elevation(longitude, latitude, declination, day_of_year, utc_hour):
    """Spherical solar elevation (degrees) over lng/lat grids."""
    hour_angle = np.deg2rad(solar_angle(day_of_year, utc_hour, longitude))
    latitude = np.deg2rad(latitude)
    return np.rad2deg(
        np.arcsin(
            np.sin(declination) * np.sin(latitude)
            + np.cos(declination) * np.cos(latitude) * np.cos(hour_angle)
        )
    )


def _create_lnglats(shape, bbox):
    """Pixel-center lng/lat meshes for a (rows, cols) grid over bbox
    [w, s, e, n]; latitude rows are flipped so row 0 is the north edge."""
    rows, cols = shape
    w, s, e, n = bbox
    x_cell = (e - w) / float(cols)
    y_cell = (n - s) / float(rows)
    lat_idx, lng_idx = np.indices(shape, dtype=np.float32)
    return (
        (lng_idx * x_cell) + w + (x_cell / 2.0),
        (np.flipud(lat_idx) * y_cell) + s + (y_cell / 2.0),
    )


def sun_elevation_rows(bounds, shape, row_start: int, row_stop: int, date_collected: str, time_collected_utc: str):
    """Per-pixel sun elevation for a horizontal strip [row_start,
    row_stop) of the tile grid.

    Bitwise-identical to the corresponding rows of
    ``sun_elevation(bounds, shape, ...)``: every op in the chain is
    elementwise, the float32 index grids carry the same values per
    cell, and broadcasting a (k,1) lat column against a (1,cols) lng
    row performs the identical scalar float32 ops. Used for
    cache-blocked (L2-resident) kernel execution in operators/toa.py.
    """
    utc_time = parse_utc_string(date_collected, time_collected_utc)
    rows, cols = (shape[1], shape[2]) if len(shape) == 3 else shape
    w, s, e, n = list(bounds)
    x_cell = (e - w) / float(cols)
    y_cell = (n - s) / float(rows)
    lng_idx = np.arange(cols, dtype=np.float32).reshape(1, cols)
    # flipud semantics: grid row r carries index value (rows-1-r)
    lat_idx = np.arange(rows - 1 - row_start, rows - 1 - (row_stop - 1) - 1, -1, dtype=np.float32).reshape(-1, 1)
    lng = (lng_idx * x_cell) + w + (x_cell / 2.0)
    lat = (lat_idx * y_cell) + s + (y_cell / 2.0)
    decimal_hour = time_to_dec_hour(utc_time)
    day_of_year = utc_time.timetuple().tm_yday
    declination = calculate_declination(day_of_year)
    return _calculate_sun_elevation(lng, lat, declination, day_of_year, decimal_hour)


def sun_elevation(bounds, shape, date_collected: str, time_collected_utc: str):
    """Per-pixel sun elevation (degrees) for a tile.

    Parameters: ``bounds`` is [w, s, e, n] in EPSG:4326 (or an object
    unpackable to it); ``shape`` is (rows, cols) or (depth, rows, cols).
    """
    utc_time = parse_utc_string(date_collected, time_collected_utc)
    if len(shape) == 3:
        _, rows, cols = shape
    else:
        rows, cols = shape

    lng, lat = _create_lnglats((rows, cols), list(bounds))
    decimal_hour = time_to_dec_hour(utc_time)
    day_of_year = utc_time.timetuple().tm_yday
    declination = calculate_declination(day_of_year)
    return _calculate_sun_elevation(lng, lat, declination, day_of_year, decimal_hour)
