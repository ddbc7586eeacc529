"""GeoTIFF ingest bridge (sources/geotiff.py).

The container has no rasterio, so the windowed-read path is exercised
only when rasterio is importable (skip otherwise); the filename
parsing and the import gate are always tested.
"""

import pytest

from rio_toa_spark.sources import geotiff

HAVE_RASTERIO = True
try:
    import rasterio  # noqa: F401
except ImportError:
    HAVE_RASTERIO = False


def test_parse_band_reference_style_names():
    assert geotiff.parse_band("LC81060712016134LGN00_B5.TIF") == 5
    assert geotiff.parse_band("/x/y/LC80330352015160LGN00_B10.tif") == 10
    with pytest.raises(ValueError):
        geotiff.parse_band("notaband.tif")


def test_parse_scene():
    assert geotiff.parse_scene("LC81060712016134LGN00_B5.TIF") == "LC81060712016134LGN00"
    with pytest.raises(ValueError):
        geotiff.parse_scene("B5.TIF")


@pytest.mark.skipif(HAVE_RASTERIO, reason="rasterio installed: gate inactive")
def test_import_gate_is_informative(spark):
    with pytest.raises(ImportError, match="rasterio"):
        geotiff.geotiff_to_tiles(spark, ["LC8_B5.TIF"])


@pytest.mark.skipif(not HAVE_RASTERIO, reason="rasterio not installed")
def test_roundtrip_tiny_tif(spark, tmp_path):
    import numpy as np
    import rasterio
    from rasterio.transform import from_bounds

    path = str(tmp_path / "LC80010012015001LGN00_B5.TIF")
    data = np.arange(40 * 60, dtype=np.uint16).reshape(40, 60)
    with rasterio.open(
        path, "w", driver="GTiff", width=60, height=40, count=1,
        dtype="uint16", crs="EPSG:4326",
        transform=from_bounds(10.0, 20.0, 16.0, 24.0, 60, 40), nodata=0,
    ) as dst:
        dst.write(data, 1)

    out = geotiff.geotiff_to_tiles(spark, [path], tile_size=32).collect()
    assert len(out) == 4  # 2x2 windows of a 40x60 raster at 32px
    full = {(r.tile_row, r.tile_col): r for r in out}
    r00 = full[(0, 0)]
    assert (r00.width, r00.height) == (32, 32)
    assert np.frombuffer(r00.pixels, np.uint16).reshape(32, 32).tolist() == data[:32, :32].tolist()
    assert r00.bounds_w == pytest.approx(10.0)
    assert r00.bounds_n == pytest.approx(24.0)
    # edge window keeps its true size
    r11 = full[(1, 1)]
    assert (r11.width, r11.height) == (28, 8)
