"""Deterministic synthetic fixtures: scenes (MTL), tiles, web pages.

Shapes mirror the reference's test fixtures (tiny uint16 Landsat crops
+ LC8*_MTL.{txt,json}, see /root/reference/tests/data) and the graft
``input_hint`` page table (url, warc_ts, html, text, lang) plus a
synthetic geocode. Everything is seeded — same arguments, same bytes —
because the correctness gates demand byte/bit-level reproducibility.

The page geocode distribution deliberately includes:
* a HOT CELL holding ~25% of all pages (exercises salting),
* pages outside every scene footprint (anti-join cases),
* pages exactly on footprint edges (inclusive-boundary cases).
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BANDS_REFLECTIVE = [2, 3, 4, 5]
BANDS_THERMAL = [10, 11]
ALL_BANDS = BANDS_REFLECTIVE + BANDS_THERMAL

# (lon, lat) scene centers spanning hemispheres + seasons, like the
# reference's 4-scene sun corpus (tests/test_sun_utils.py:31-38).
_SCENE_SPECS = [
    # (path, row, year, doy, center_lon, center_lat, sun_elev)
    (139, 45, 2014, 295, 88.5, 27.0, 40.2),
    (106, 71, 2016, 134, 150.9, -24.5, 35.7),
    (33, 35, 2015, 160, -106.2, 37.6, 65.8),
    (164, 62, 2015, 21, 36.7, -13.4, 58.1),
    (7, 28, 2015, 180, -66.1, 46.2, 60.3),
    (196, 22, 2015, 312, 9.9, 55.1, 12.4),
]


def _center_time(lon: float, path: int, row: int, doy: int) -> str:
    """UTC time string placing local solar time near 10:30 for the
    scene longitude (Landsat is sun-synchronous)."""
    utc_hour = 10.5 - lon / 15.0 + ((path + row + doy) % 7 - 3) / 60.0
    utc_hour %= 24.0
    hh = int(utc_hour)
    mm = int((utc_hour - hh) * 60)
    ss = int(((utc_hour - hh) * 60 - mm) * 60)
    return "%02d:%02d:%02d.%07d0Z" % (hh, mm, ss, (path * row * doy) % 10**7)


def _mtl_dict(path, row, year, doy, lon, lat, sun_elev, half=1.1):
    """One scene's MTL as a nested dict (values shaped like the real
    LC8*_MTL.json files the reference parses)."""
    date = datetime.date(year, 1, 1) + datetime.timedelta(days=doy - 1)
    scene_id = "LC8%03d%03d%d%03dLGN00" % (path, row, year, doy)
    rr = {}
    for b in range(1, 12):
        rr["RADIANCE_MULT_BAND_%d" % b] = round(0.01 + 0.0004 * b, 6)
        rr["RADIANCE_ADD_BAND_%d" % b] = round(-50.0 - 1.5 * b, 5)
    for b in range(1, 10):
        rr["REFLECTANCE_MULT_BAND_%d" % b] = 2.0e-05
        rr["REFLECTANCE_ADD_BAND_%d" % b] = -0.1
    corners = {
        "CORNER_UL_LAT_PRODUCT": round(lat + half, 5),
        "CORNER_UL_LON_PRODUCT": round(lon - half, 5),
        "CORNER_UR_LAT_PRODUCT": round(lat + half, 5),
        "CORNER_UR_LON_PRODUCT": round(lon + half, 5),
        "CORNER_LL_LAT_PRODUCT": round(lat - half, 5),
        "CORNER_LL_LON_PRODUCT": round(lon - half, 5),
        "CORNER_LR_LAT_PRODUCT": round(lat - half, 5),
        "CORNER_LR_LON_PRODUCT": round(lon + half, 5),
    }
    return scene_id, {
        "L1_METADATA_FILE": {
            "METADATA_FILE_INFO": {
                "LANDSAT_SCENE_ID": scene_id,
                "STATION_ID": "LGN",
            },
            "PRODUCT_METADATA": {
                "DATE_ACQUIRED": date.isoformat(),
                # Sun-synchronous orbit: acquisition near local solar
                # 10:30, so per-pixel sun elevation stays positive.
                "SCENE_CENTER_TIME": _center_time(lon, path, row, doy),
                **corners,
            },
            "IMAGE_ATTRIBUTES": {
                "SUN_ELEVATION": sun_elev,
                "SUN_AZIMUTH": round(120.0 + path % 90, 5),
            },
            "RADIOMETRIC_RESCALING": rr,
            "TIRS_THERMAL_CONSTANTS": {
                "K1_CONSTANT_BAND_10": 774.8853,
                "K2_CONSTANT_BAND_10": 1321.0789,
                "K1_CONSTANT_BAND_11": 480.8883,
                "K2_CONSTANT_BAND_11": 1201.1442,
            },
        }
    }


def _mtl_to_odl(mtl: dict) -> str:
    """Serialize a nested MTL dict as Landsat ODL text (GROUP /
    END_GROUP blocks, ``  KEY = value`` lines) — the inverse of the
    parser, used for txt<->json equivalence tests (the port of
    tests/test_toa_utils.py:42-57)."""
    lines: list[str] = []

    def emit(node: dict, name: str | None, depth: int):
        pad = "  " * depth
        if name is not None:
            lines.append("%sGROUP = %s" % (pad, name))
        for key, value in node.items():
            if isinstance(value, dict):
                emit(value, key, depth + 1)
            else:
                if isinstance(value, str):
                    value = '"%s"' % value
                lines.append("%s  %s = %s" % (pad, key, value))
        if name is not None:
            lines.append("%sEND_GROUP = %s" % (pad, name))

    for key, value in mtl.items():
        emit(value, key, 0)
    lines.append("END")
    return "\n".join(lines) + "\n"


def make_scenes(n_scenes: int = 4) -> list[tuple[str, dict]]:
    specs = [_SCENE_SPECS[i % len(_SCENE_SPECS)] for i in range(n_scenes)]
    return [_mtl_dict(*spec) for spec in specs]


def scenes_arrow(scenes: list[tuple[str, dict]]) -> pa.Table:
    return pa.table(
        {
            "scene_id": [sid for sid, _ in scenes],
            "mtl_txt": [_mtl_to_odl(mtl) for _, mtl in scenes],
            "mtl_json": [json.dumps(mtl) for _, mtl in scenes],
        }
    )


def scene_bounds(mtl: dict) -> tuple[float, float, float, float]:
    pm = mtl["L1_METADATA_FILE"]["PRODUCT_METADATA"]
    lats = [pm["CORNER_%s_LAT_PRODUCT" % c] for c in ("LL", "LR", "UR", "UL")]
    lons = [pm["CORNER_%s_LON_PRODUCT" % c] for c in ("LL", "LR", "UR", "UL")]
    return (min(lons), min(lats), max(lons), max(lats))


def tiles_arrow(
    scenes: list[tuple[str, dict]],
    bands: list[int] | None = None,
    grid: int = 2,
    tile_size: int = 256,
    seed: int = 42,
    nodata_fraction: float = 0.08,
) -> pa.Table:
    """One row per (scene, band, tile_row, tile_col); uint16 LE pixels
    with nodata runs and near-overflow values; per-tile WGS84 bounds
    subdividing the scene footprint (tile_row 0 = north edge, matching
    the raster row order the reference reads)."""
    bands = bands or ALL_BANDS
    rng = np.random.default_rng(seed)
    cols: dict[str, list] = {
        k: []
        for k in (
            "scene_id",
            "band",
            "tile_row",
            "tile_col",
            "width",
            "height",
            "nodata",
            "bw",
            "bs",
            "be",
            "bn",
            "pixels",
        )
    }
    for sid, mtl in scenes:
        w, s, e, n = scene_bounds(mtl)
        dx = (e - w) / grid
        dy = (n - s) / grid
        for band in bands:
            for tr in range(grid):
                for tc in range(grid):
                    dn = rng.integers(1, 60000, size=(tile_size, tile_size), dtype=np.uint16)
                    # nodata runs (leading rows) + hot pixels near the top
                    n_zero_rows = int(tile_size * nodata_fraction * rng.random())
                    dn[:n_zero_rows, :] = 0
                    hot = rng.integers(0, tile_size, size=(8, 2))
                    dn[hot[:, 0], hot[:, 1]] = 65535
                    cols["scene_id"].append(sid)
                    cols["band"].append(band)
                    cols["tile_row"].append(tr)
                    cols["tile_col"].append(tc)
                    cols["width"].append(tile_size)
                    cols["height"].append(tile_size)
                    cols["nodata"].append(0)
                    cols["bw"].append(w + tc * dx)
                    cols["be"].append(w + (tc + 1) * dx)
                    # tile_row 0 is the northmost strip
                    cols["bn"].append(n - tr * dy)
                    cols["bs"].append(n - (tr + 1) * dy)
                    cols["pixels"].append(dn.tobytes())
    return pa.table(
        {
            "scene_id": pa.array(cols["scene_id"], pa.string()),
            "band": pa.array(cols["band"], pa.int32()),
            "tile_row": pa.array(cols["tile_row"], pa.int32()),
            "tile_col": pa.array(cols["tile_col"], pa.int32()),
            "width": pa.array(cols["width"], pa.int32()),
            "height": pa.array(cols["height"], pa.int32()),
            "nodata": pa.array(cols["nodata"], pa.int32()),
            "bounds_w": pa.array(cols["bw"], pa.float64()),
            "bounds_s": pa.array(cols["bs"], pa.float64()),
            "bounds_e": pa.array(cols["be"], pa.float64()),
            "bounds_n": pa.array(cols["bn"], pa.float64()),
            "pixels": pa.array(cols["pixels"], pa.binary()),
        }
    )


_WORDS = (
    "web crawl page text spark join tile scene raster landsat toa "
    "radiance reflectance temperature sun elevation cell index shuffle "
    "partition salt skew broadcast parquet iceberg snapshot manifest"
).split()


def _page_texts(n_pages: int, seed: int = 1000003) -> list[str]:
    """Deterministic pseudo-texts, vectorized (one RNG for the batch)."""
    rng = np.random.default_rng(seed)
    n_words = 20 + rng.integers(0, 180, size=n_pages)
    total = int(n_words.sum())
    flat = rng.integers(0, len(_WORDS), size=total)
    out = []
    pos = 0
    words = _WORDS
    for count in n_words:
        out.append(" ".join(words[k] for k in flat[pos : pos + count]))
        pos += count
    return out


def page_html(url: str, text: str) -> bytes:
    """Deterministic HTML wrapper; extract_text() must invert this
    byte-identically (the per-url invariant of the graft input_hint)."""
    return (
        "<html><head><title>%s</title></head><body>\n<p>%s</p>\n</body></html>"
        % (url, text)
    ).encode("utf-8")


def pages_arrow(
    scenes: list[tuple[str, dict]],
    n_pages: int = 2000,
    seed: int = 7,
    hot_fraction: float = 0.25,
    outside_fraction: float = 0.15,
) -> pa.Table:
    """Common-Crawl-style pages with synthetic geocodes.

    hot_fraction of pages cluster inside one small box within scene 0's
    footprint (one hot grid cell); outside_fraction land in an ocean
    box intersecting no footprint; a handful sit exactly on scene 0's
    footprint edges; the rest scatter uniformly across the scene
    footprints.
    """
    rng = np.random.default_rng(seed)
    boxes = [scene_bounds(mtl) for _, mtl in scenes]
    w0, s0, e0, n0 = boxes[0]
    hot_box = (w0 + 0.1, s0 + 0.1, w0 + 0.15, s0 + 0.15)  # tiny -> one cell
    ocean = (-150.0, -45.0, -140.0, -35.0)

    langs = ["en", "de", "fr", "es", "zh"]
    base_ts = datetime.datetime(2016, 3, 1, tzinfo=datetime.timezone.utc)
    n_hot = int(n_pages * hot_fraction)
    n_out = int(n_pages * outside_fraction)
    n_edge = min(8, max(n_pages - n_hot - n_out, 0))

    # vectorized geocodes: segment -> box, then uniform draws per page
    box_arr = np.array(boxes)  # (k, 4) as (w, s, e, n)
    seg_box = np.empty((n_pages, 4))
    seg_box[:n_hot] = hot_box
    seg_box[n_hot : n_hot + n_out] = ocean
    scatter0 = n_hot + n_out + n_edge
    if scatter0 < n_pages:
        pick = rng.integers(0, len(boxes), size=n_pages - scatter0)
        seg_box[scatter0:] = box_arr[pick]
    u = rng.random((n_pages, 2))
    lons = seg_box[:, 0] + (seg_box[:, 2] - seg_box[:, 0]) * u[:, 0]
    lats = seg_box[:, 1] + (seg_box[:, 3] - seg_box[:, 1]) * u[:, 1]
    # edge pages sit exactly on scene 0's footprint edges (inclusive)
    edge_pts = [
        (w0, (s0 + n0) / 2),
        (e0, (s0 + n0) / 2),
        ((w0 + e0) / 2, s0),
        ((w0 + e0) / 2, n0),
    ]
    for j in range(n_edge):
        lons[n_hot + n_out + j], lats[n_hot + n_out + j] = edge_pts[j % 4]

    texts = _page_texts(n_pages)
    urls = ["https://example-%04d.test/page/%d" % (i % 997, i) for i in range(n_pages)]
    htmls = [page_html(u_, t_) for u_, t_ in zip(urls, texts)]
    tss = [base_ts + datetime.timedelta(seconds=i * 37) for i in range(n_pages)]
    lang_col = [langs[i % len(langs)] for i in range(n_pages)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "lat": pa.array(np.asarray(lats), pa.float64()),
            "lon": pa.array(np.asarray(lons), pa.float64()),
        }
    )


def _tile_ground_truth(tiles: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Ground-truth side tables derived from the SAME pixel arrays the
    tiles carry as binary, giving the binary-pixel driver queries exact
    SQL oracles:

    * dns: one row per pixel (scene_id, band, dn int32, cx, cy pixel
      centers) — checks that the engine's distributed frombuffer /
      shift / bincount path recovers exactly the values that were
      encoded, and (via cx/cy) that its raster->vector coordinate math
      assigns every pixel to the right zone. cx/cy use the exact
      kernel formula (operators/zonal.py): bounds + (i + 0.5) * extent
      / size in f64, so the SQL oracle's coordinate comparisons are
      bitwise-faithful.
    * mosaics: per (scene, band) the numpy vstack/hstack assembly of
      the full grid with the md5-60bit hash of its bytes — checks the
      distributed mosaic_scene sink byte-for-byte.
    """
    import hashlib

    per_scene_band: dict[tuple, dict[tuple, np.ndarray]] = {}
    cols = tiles.to_pylist()
    dn_s, dn_b, dn_v, dn_x, dn_y = [], [], [], [], []
    for r in cols:
        arr = np.frombuffer(r["pixels"], dtype=np.uint16).reshape(
            r["height"], r["width"]
        )
        # pixel centers with the EXACT zonal-kernel arithmetic
        dx = (r["bounds_e"] - r["bounds_w"]) / r["width"]
        dy = (r["bounds_n"] - r["bounds_s"]) / r["height"]
        cx = r["bounds_w"] + (np.arange(r["width"]) + 0.5) * dx
        cy = r["bounds_n"] - (np.arange(r["height"]) + 0.5) * dy
        dn_s.append(np.repeat(np.array([r["scene_id"]], dtype=object), arr.size))
        dn_b.append(np.full(arr.size, r["band"], dtype=np.int32))
        dn_v.append(arr.ravel().astype(np.int32))
        dn_x.append(np.tile(cx, r["height"]))
        dn_y.append(np.repeat(cy, r["width"]))
        per_scene_band.setdefault((r["scene_id"], r["band"]), {})[
            (r["tile_row"], r["tile_col"])
        ] = arr
    dns = pa.table(
        {
            "scene_id": pa.array(np.concatenate(dn_s), pa.string()),
            "band": pa.array(np.concatenate(dn_b), pa.int32()),
            "dn": pa.array(np.concatenate(dn_v), pa.int32()),
            "cx": pa.array(np.concatenate(dn_x), pa.float64()),
            "cy": pa.array(np.concatenate(dn_y), pa.float64()),
        }
    )
    ms, mb, mh, mw, mhash = [], [], [], [], []
    for (sid, band), grid_map in sorted(per_scene_band.items()):
        n_rows = max(tr for tr, _ in grid_map) + 1
        n_cols = max(tc for _, tc in grid_map) + 1
        full = np.vstack(
            [
                np.hstack([grid_map[(tr, tc)] for tc in range(n_cols)])
                for tr in range(n_rows)
            ]
        )
        ms.append(sid)
        mb.append(band)
        mh.append(full.shape[0])
        mw.append(full.shape[1])
        mhash.append(int(hashlib.md5(full.tobytes()).hexdigest()[:15], 16))
    mosaics = pa.table(
        {
            "scene_id": pa.array(ms, pa.string()),
            "band": pa.array(mb, pa.int32()),
            "height": pa.array(mh, pa.int32()),
            "width": pa.array(mw, pa.int32()),
            "pixels_hash": pa.array(mhash, pa.int64()),
        }
    )
    return dns, mosaics


def ensure_fixtures(
    out_dir: str,
    n_scenes: int = 4,
    grid: int = 2,
    tile_size: int = 256,
    n_pages: int = 2000,
    bands: list[int] | None = None,
) -> dict[str, str]:
    """Idempotently write {scenes,tiles,pages,tile_dns,scene_mosaics}
    .parquet under out_dir; returns the path map. Deterministic for
    fixed arguments."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        name: os.path.join(out_dir, "%s.parquet" % name)
        for name in ("scenes", "tiles", "pages")
    }
    n_bands = len(bands or ALL_BANDS)
    total_px = n_scenes * n_bands * grid * grid * tile_size * tile_size
    # ground-truth side tables (exact oracles for the binary-pixel
    # driver queries) only make sense at unit/driver fixture scale —
    # the exploded-DN table is total_px rows
    with_truth = total_px <= 32_000_000
    if with_truth:
        for name in (
            "tile_dns",
            "scene_mosaics",
            "toa_truth",
            "media_truth",
            "frames_truth",
            "audio_truth",
            "embeddings",
            "ann_truth",
        ):
            paths[name] = os.path.join(out_dir, "%s.parquet" % name)
    marker = os.path.join(
        out_dir, ".fixtures-v7-%d-%d-%d-%d" % (n_scenes, grid, tile_size, n_pages)
    )
    if os.path.exists(marker) and all(os.path.exists(p) for p in paths.values()):
        return paths
    scenes = make_scenes(n_scenes)
    pq.write_table(scenes_arrow(scenes), paths["scenes"])
    tiles = tiles_arrow(scenes, bands=bands, grid=grid, tile_size=tile_size)
    # small row groups -> splittable scans: a single row group would
    # collapse the whole TOA pipeline into one Spark task
    pq.write_table(tiles, paths["tiles"], row_group_size=max(4, tiles.num_rows // 64))
    pq.write_table(
        pages_arrow(scenes, n_pages=n_pages),
        paths["pages"],
        row_group_size=max(1024, n_pages // 64),
    )
    if with_truth:
        from rio_toa_spark.sources import truth

        dns, mosaics = _tile_ground_truth(tiles)
        pq.write_table(dns, paths["tile_dns"], row_group_size=max(65536, dns.num_rows // 32))
        pq.write_table(mosaics, paths["scene_mosaics"])
        pq.write_table(truth.toa_truth(scenes, tiles), paths["toa_truth"])
        pq.write_table(truth.media_truth(), paths["media_truth"])
        pq.write_table(truth.frames_truth(), paths["frames_truth"])
        pq.write_table(truth.audio_truth(), paths["audio_truth"])
        emb = truth.embeddings_arrow()
        # splittable scan for the ANN queries (same rationale as tiles)
        pq.write_table(emb, paths["embeddings"], row_group_size=max(64, emb.num_rows // 32))
        pq.write_table(truth.ann_truth(emb), paths["ann_truth"])
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return paths
