"""Spatial layer tests: cell-id parity (SQL expr vs numpy), the three
point-in-footprint join strategies vs a brute-force oracle (exact row
parity incl. edge/outside/hot-spot pages), kNN vs brute force with
deterministic tie-breaks, and skew/partitioning behavior."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rio_toa_spark.operators import spatial_join as sj
from rio_toa_spark.spatial import cells as cell_mod


LEVEL = 7


def test_cell_expr_matches_numpy(spark, pages_df):
    rows = (
        sj.with_cell(pages_df, level=LEVEL)
        .select("lon", "lat", "cell")
        .collect()
    )
    lon = np.array([r.lon for r in rows])
    lat = np.array([r.lat for r in rows])
    expected = cell_mod.cell_of_points(lon, lat, LEVEL)
    got = np.array([r.cell for r in rows])
    assert np.array_equal(got, expected)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 10, 1000)
    y = rng.integers(0, 1 << 10, 1000)
    code = cell_mod.morton_encode(x, y)
    dx, dy = cell_mod.morton_decode(code)
    assert np.array_equal(dx, x) and np.array_equal(dy, y)


def test_cover_bbox_contains_point_cells():
    w, s, e, n = 10.0, 20.0, 14.0, 23.0
    cover = set(cell_mod.cover_bbox(w, s, e, n, LEVEL).tolist())
    rng = np.random.default_rng(1)
    lon = w + (e - w) * rng.random(200)
    lat = s + (n - s) * rng.random(200)
    pts = cell_mod.cell_of_points(lon, lat, LEVEL)
    assert set(pts.tolist()) <= cover


def _brute_force_pip(fixture_paths):
    pages = pq.read_table(fixture_paths["pages"]).to_pylist()
    import json

    scenes = pq.read_table(fixture_paths["scenes"]).to_pylist()
    boxes = {}
    for s in scenes:
        meta = json.loads(s["mtl_json"])["L1_METADATA_FILE"]["PRODUCT_METADATA"]
        boxes[s["scene_id"]] = (
            min(meta["CORNER_%s_LON_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
            min(meta["CORNER_%s_LAT_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
            max(meta["CORNER_%s_LON_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
            max(meta["CORNER_%s_LAT_PRODUCT" % c] for c in ("UL", "UR", "LL", "LR")),
        )
    expected = set()
    for p in pages:
        for sid, (w, s_, e, n) in boxes.items():
            if w <= p["lon"] <= e and s_ <= p["lat"] <= n:
                expected.add((p["url"], sid))
    return expected


@pytest.fixture(scope="module")
def pip_expected(fixture_paths):
    return _brute_force_pip(fixture_paths)


@pytest.mark.parametrize("strategy", ["broadcast", "salted", "index"])
def test_pip_join_strategies_exact(spark, pages_df, scenes_df, pip_expected, strategy):
    fps = sj.scene_footprints(scenes_df)
    out = sj.pip_join(pages_df, fps, level=LEVEL, strategy=strategy)
    got = {(r.url, r.scene_id) for r in out.select("url", "scene_id").collect()}
    assert got == pip_expected
    assert len(got) > 0
    # pages outside every footprint must be absent
    all_urls = {r.url for r in pages_df.select("url").collect()}
    assert len(all_urls - {u for u, _ in got}) > 0


def test_pip_join_includes_edge_pages(spark, pages_df, scenes_df, pip_expected):
    """Pages placed exactly on footprint edges must match (inclusive
    bounds) — they exist by construction in the fixture."""
    fps = sj.scene_footprints(scenes_df).collect()
    edges = set()
    for fp in fps:
        edges.update([fp.fw, fp.fe])
    edge_urls = {
        r.url
        for r in pages_df.where(F.col("lon").isin(list(edges))).select("url").collect()
    }
    assert edge_urls, "fixture must contain edge pages"
    joined_urls = {u for u, _ in pip_expected}
    assert edge_urls <= joined_urls
    got = {
        r.url
        for r in sj.pip_join(pages_df, sj.scene_footprints(scenes_df), level=LEVEL)
        .select("url")
        .collect()
    }
    assert edge_urls <= got


def test_pages_to_tiles_assignment(spark, pages_df, tiles_df, pip_expected):
    """Page -> covering tile: each in-footprint page lands in >= 1 tile
    and every (page, tile) respects containment."""
    tf = sj.tile_footprints(tiles_df)
    out = sj.pip_join(pages_df, tf, level=LEVEL).select("url", "tile_id").collect()
    in_scene_urls = {u for u, _ in pip_expected}
    matched_urls = {r.url for r in out}
    assert matched_urls == in_scene_urls


def _brute_force_knn(fixture_paths, k):
    pages = pq.read_table(fixture_paths["pages"]).to_pylist()
    tiles = pq.read_table(fixture_paths["tiles"]).to_pylist()
    seen = {}
    for t in tiles:
        tid = "%s/%d/%d" % (t["scene_id"], t["tile_row"], t["tile_col"])
        seen[tid] = (
            (t["bounds_w"] + t["bounds_e"]) / 2,
            (t["bounds_s"] + t["bounds_n"]) / 2,
        )
    expected = {}
    for p in pages:
        cands = sorted(
            ((np.sqrt((p["lon"] - cx) ** 2 + (p["lat"] - cy) ** 2), tid) for tid, (cx, cy) in seen.items()),
        )[:k]
        expected[p["url"]] = [tid for _, tid in cands]
    return expected


@pytest.mark.parametrize("strategy", ["broadcast", "cells"])
def test_knn_matches_brute_force(spark, pages_df, tiles_df, fixture_paths, strategy):
    k = 3
    out = sj.knn_join(pages_df, tiles_df, k=k, strategy=strategy, level=LEVEL)
    got = {}
    for r in out.collect():
        got.setdefault(r.url, []).append((r.rank, r.tile_id))
    expected = _brute_force_knn(fixture_paths, k)
    assert len(got) == len(expected)
    for url, ranked in got.items():
        assert [t for _, t in sorted(ranked)] == expected[url]


def test_salted_join_spreads_hot_cell(spark, pages_df, scenes_df):
    """The hot cell holds ~25% of pages; after salting, no single
    (cell, salt) group should hold more than ~1/salt of the hot mass."""
    level = LEVEL
    salt = 8
    pts = sj.with_cell(pages_df, level=level).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("lon"), F.col("lat")), F.lit(salt))
    )
    grp = pts.groupBy("cell", "_salt").count().collect()
    top = max(r["count"] for r in grp)
    total = sum(r["count"] for r in grp)
    hot_total = max(
        sum(r["count"] for r in grp if r.cell == c) for c in {r.cell for r in grp}
    )
    assert hot_total / total > 0.2  # fixture really is skewed
    assert top < hot_total  # salting split the hot cell
    assert top <= hot_total / salt * 2.5  # reasonably even spread


def test_repartition_by_cell_ranges(spark, pages_df):
    out = sj.repartition_by_cell(pages_df, num_partitions=4, level=LEVEL)
    assert out.rdd.getNumPartitions() <= 4
    assert out.count() == pages_df.count()


def test_cell_hierarchy_parent_commutes(spark):
    """Morton parent (>> 2k) must equal re-encoding the point at the
    coarser level — the prefix property hierarchy rollups rely on."""
    import numpy as np

    from rio_toa_spark.spatial import cells as cm

    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    c8 = cm.cell_of_points(lon, lat, 8)
    for k in (1, 2, 3):
        assert np.array_equal(cm.cell_parent(c8, k), cm.cell_of_points(lon, lat, 8 - k))


def test_cell_children_roundtrip():
    import numpy as np

    from rio_toa_spark.spatial import cells as cm

    for cell in (0, 5, 1234, (1 << 12) - 1):
        kids = cm.cell_children(cell)
        assert len(kids) == 4 and len(set(kids.tolist())) == 4
        assert np.array_equal(cm.cell_parent(kids), np.full(4, cell))


def test_cell_parent_expr_matches_numpy(spark):
    import numpy as np

    from rio_toa_spark.operators import spatial_join as sj
    from rio_toa_spark.spatial import cells as cm

    rng = np.random.default_rng(6)
    rows = [(float(a), float(b)) for a, b in zip(rng.uniform(-180, 180, 300), rng.uniform(-90, 90, 300))]
    df = spark.createDataFrame(rows, "lon double, lat double")
    got = (
        sj.with_cell(df, level=8)
        .select(sj.cell_parent_expr(__import__("pyspark.sql.functions", fromlist=["x"]).col("cell"), 2).alias("p"))
        .collect()
    )
    exp = cm.cell_parent(cm.cell_of_points([r[0] for r in rows], [r[1] for r in rows], 8), 2)
    assert [r.p for r in got] == exp.tolist()


def test_knn_broadcast_exact_ties_beyond_partition_slice(spark):
    """All centroids exactly equidistant (integer lattice, d^2 exact in
    f64): the kth value equals the partition-slice max, forcing the
    full-sort fallback — ties must resolve to the lowest tile_ids."""
    pts = spark.createDataFrame([("p", 0.0, 0.0)], "url string, lon double, lat double")
    ring = [(3, 4), (4, 3), (-3, 4), (-4, 3), (3, -4), (4, -3), (-3, -4), (-4, -3),
            (0, 5), (5, 0), (0, -5), (-5, 0), (3, 4), (4, 3), (-3, 4), (-4, 3)]
    cents = spark.createDataFrame(
        [("t%02d" % i, float(x), float(y)) for i, (x, y) in enumerate(ring)],
        "tile_id string, cx double, cy double",
    )
    out = sj.knn_centroids(pts, cents, k=3, strategy="broadcast").collect()
    assert [r.tile_id for r in sorted(out, key=lambda r: r.rank)] == ["t00", "t01", "t02"]
    assert all(r.dist == 5.0 for r in out)


def test_knn_broadcast_empty_centroids(spark):
    pts = spark.createDataFrame([("p", 0.0, 0.0)], "url string, lon double, lat double")
    cents = spark.createDataFrame([], "tile_id string, cx double, cy double")
    assert sj.knn_centroids(pts, cents, k=3, strategy="broadcast").count() == 0
