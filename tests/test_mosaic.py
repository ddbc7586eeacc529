"""mosaic_scene: tiles -> one full-scene raster row per (scene, band),
verified against an independent vstack/hstack assembly."""

import numpy as np
from pyspark.sql import functions as F

from rio_toa_spark.operators import toa


def test_mosaic_scene_reassembles_grid(spark, tiles_df):
    out = {r.scene_id: r for r in toa.mosaic_scene(tiles_df.where(F.col("band") == 5)).collect()}
    src = tiles_df.where(F.col("band") == 5).collect()
    by_scene = {}
    for t in src:
        by_scene.setdefault(t.scene_id, {})[(t.tile_row, t.tile_col)] = np.frombuffer(
            t.pixels, np.uint16
        ).reshape(t.height, t.width)
    assert set(out) == set(by_scene)
    for sid, tiles in by_scene.items():
        n = max(k[0] for k in tiles) + 1
        m = max(k[1] for k in tiles) + 1
        exp = np.vstack(
            [np.hstack([tiles[(r, c)] for c in range(m)]) for r in range(n)]
        )
        r = out[sid]
        got = np.frombuffer(r.pixels, np.uint16).reshape(r.height, r.width)
        assert np.array_equal(got, exp)
        assert r.dtype == "uint16" and r.band == 5
        # mosaic bounds are the envelope of the tile bounds
        scene_tiles = [t for t in src if t.scene_id == sid]
        assert r.bounds_n == max(t.bounds_n for t in scene_tiles)
        assert r.bounds_w == min(t.bounds_w for t in scene_tiles)


def test_mosaic_of_toa_output_keeps_dtype(spark, tiles_df, scenes_df):
    rad = toa.radiance_tiles(tiles_df, scenes_df, band=5)
    out = toa.mosaic_scene(rad).collect()
    assert out and all(r.dtype == "float32" for r in out)
    for r in out:
        arr = np.frombuffer(r.pixels, np.float32).reshape(r.height, r.width)
        assert arr.shape == (r.height, r.width)
        assert r.bounds_w is None  # TOA rows carry no bounds columns


def test_mosaic_rejects_holes(spark, tiles_df):
    import pytest

    holey = tiles_df.where(
        (F.col("band") == 5)
        & ~((F.col("tile_row") == 0) & (F.col("tile_col") == 0))
    )
    with pytest.raises(Exception, match="missing tiles"):
        toa.mosaic_scene(holey).collect()


def test_mosaic_subgrid_not_anchored_at_zero(spark, tiles_df):
    """A full sub-rectangle that doesn't start at (0,0) mosaics fine."""
    sub = tiles_df.where((F.col("band") == 5) & (F.col("tile_row") == 1))
    out = toa.mosaic_scene(sub).collect()
    assert out
    for r in out:
        assert r.height == 128 and r.width == 256  # 1x2 strip of 128px tiles
