"""Spatial join + tiling operators over web-page points and raster
footprints — the graft layer required by the north rule (no reference
counterpart; BASELINE.json north_rule / SURVEY.md §2.3 J3).

Design:

* Every point gets ONE level-L cell id; every footprint explodes into
  its (few) covering cells. The equi-join on cell is the prune step
  Catalyst can plan natively; an exact inclusive bbox predicate is the
  refine step. Because a point has exactly one cell, the cell join
  introduces no duplicate (point, footprint) pairs — no dedup pass.
* Three physical strategies, all proven result-identical in tests:
    - 'broadcast' (default): broadcast the exploded footprint side;
      zero shuffle on the page side. Right whenever footprints fit the
      broadcast threshold (scenes/tiles are dimension-sized even at
      100 TB of pages).
    - 'salted': shuffle hash join with the page side salted on
      pmod(xxhash64(url), S) and the footprint side replicated S ways.
      The explicit skew treatment for hot cells when the footprint
      side outgrows broadcast; AQE skew-join remains on as backstop.
    - 'index': mapInPandas with a broadcast RectIndex (the STRtree
      analogue) — pure map, candidate+refine fused in numpy.
* kNN page->tile: broadcast tile centroids into an Arrow batch kernel
  (exact, vectorized) or cell-ring candidate expansion + windowed
  row_number for the non-broadcastable case. Deterministic
  tie-breaking on (distance, tile_id).

The cell id is Morton (Z-order), computed by *native Spark SQL bit
arithmetic* — no UDF on the hot path — so range-partitioning by cell
id clusters spatially (Z-order locality) and Catalyst can fold/push
the expression.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rio_toa_spark.spatial import cells as cell_mod
from rio_toa_spark.spatial.index import RectIndex

DEFAULT_LEVEL = cell_mod.DEFAULT_LEVEL


# ---------------------------------------------------------------- cells


def _spread_bits(col: Column) -> Column:
    """Interleave-ready bit spread (Morton), SQL-side — mirrors
    cells._part1by1 so SQL and numpy agree bit-for-bit."""
    col = col.bitwiseAND(F.lit(0xFFFF))
    col = (col.bitwiseOR(F.shiftleft(col, 8))).bitwiseAND(F.lit(0x00FF00FF))
    col = (col.bitwiseOR(F.shiftleft(col, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    col = (col.bitwiseOR(F.shiftleft(col, 2))).bitwiseAND(F.lit(0x33333333))
    col = (col.bitwiseOR(F.shiftleft(col, 1))).bitwiseAND(F.lit(0x55555555))
    return col


def grid_xy_expr(lon: Column, lat: Column, level: int = DEFAULT_LEVEL) -> tuple[Column, Column]:
    n = 1 << level
    x = F.floor((lon - F.lit(-180.0)) / F.lit(360.0) * F.lit(n)).cast("long")
    y = F.floor((lat - F.lit(-90.0)) / F.lit(180.0) * F.lit(n)).cast("long")
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(n - 1), c))  # noqa: E731
    return clamp(x), clamp(y)


def cell_expr(lon: Column, lat: Column, level: int = DEFAULT_LEVEL) -> Column:
    """Native-SQL Morton cell id of a point — bit-identical to
    cells.cell_of_points."""
    x, y = grid_xy_expr(lon, lat, level)
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def with_cell(df: DataFrame, lon: str = "lon", lat: str = "lat", level: int = DEFAULT_LEVEL, out: str = "cell") -> DataFrame:
    return df.withColumn(out, cell_expr(F.col(lon), F.col(lat), level))


def cell_parent_expr(cell: Column, levels: int = 1) -> Column:
    """Native-SQL ancestor cell id: Morton parents are bit shifts
    (cells.cell_parent), so hierarchy rollups stay inside Catalyst."""
    return F.shiftright(cell, 2 * levels)


# ----------------------------------------------------------- footprints


def scene_footprints(scenes_df: DataFrame) -> DataFrame:
    """scene_id + WGS84 bbox from MTL corner products (the columnar
    form of rio_toa/toa_utils.py:111-118)."""
    from rio_toa_spark.operators.toa import prepare_scenes

    pm = F.col("mtl.L1_METADATA_FILE.PRODUCT_METADATA")
    lats = [pm["CORNER_%s_LAT_PRODUCT" % c] for c in ("LL", "LR", "UR", "UL")]
    lons = [pm["CORNER_%s_LON_PRODUCT" % c] for c in ("LL", "LR", "UR", "UL")]
    return prepare_scenes(scenes_df).select(
        "scene_id",
        F.least(*lons).alias("fw"),
        F.least(*lats).alias("fs"),
        F.greatest(*lons).alias("fe"),
        F.greatest(*lats).alias("fn"),
    )


def tile_footprints(tiles_df: DataFrame) -> DataFrame:
    """Distinct tile geometries (band-independent) with a stable
    sortable tile_id."""
    return (
        tiles_df.select(
            "scene_id",
            "tile_row",
            "tile_col",
            F.col("bounds_w").alias("fw"),
            F.col("bounds_s").alias("fs"),
            F.col("bounds_e").alias("fe"),
            F.col("bounds_n").alias("fn"),
        )
        .dropDuplicates(["scene_id", "tile_row", "tile_col"])
        .withColumn(
            "tile_id",
            F.concat_ws("/", F.col("scene_id"), F.col("tile_row"), F.col("tile_col")),
        )
    )


def _explode_cover(footprints: DataFrame, level: int) -> DataFrame:
    """footprint -> one row per covering cell. Covering cells of a
    bbox form a contiguous grid-index rectangle; enumerate it with a
    native sequence+transform (no Python on this side either)."""
    n = 1 << level
    x0, y0 = grid_xy_expr(F.col("fw"), F.col("fs"), level)
    x1, y1 = grid_xy_expr(F.col("fe"), F.col("fn"), level)
    out = (
        footprints.withColumn("_xs", F.sequence(x0, x1))
        .withColumn("_ys", F.sequence(y0, y1))
        .withColumn("_x", F.explode("_xs"))
        .withColumn("_y", F.explode("_ys"))
        .withColumn("cell", _spread_bits(F.col("_x")).bitwiseOR(F.shiftleft(_spread_bits(F.col("_y")), 1)))
        .drop("_xs", "_ys", "_x", "_y")
    )
    return out


_CONTAINS = (
    "(lon >= fw) AND (lon <= fe) AND (lat >= fs) AND (lat <= fn)"
)


def pip_join(
    points_df: DataFrame,
    footprints_df: DataFrame,
    level: int = DEFAULT_LEVEL,
    strategy: str = "broadcast",
    salt: int = 8,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Point-in-footprint inner join.

    Returns the point columns + the footprint id columns (everything in
    footprints_df except fw/fs/fe/fn). Inclusive boundaries, matching
    the DuckDB oracle's BETWEEN semantics.
    """
    fp_id_cols = [c for c in footprints_df.columns if c not in ("fw", "fs", "fe", "fn")]
    pts = with_cell(points_df, lon, lat, level)

    if strategy == "index":
        return _pip_index_join(points_df, footprints_df, fp_id_cols, lon, lat)

    cover = _explode_cover(footprints_df, level)
    refine = (
        (F.col(lon) >= F.col("fw"))
        & (F.col(lon) <= F.col("fe"))
        & (F.col(lat) >= F.col("fs"))
        & (F.col(lat) <= F.col("fn"))
    )

    if strategy == "broadcast":
        joined = pts.join(F.broadcast(cover), "cell").where(refine)
    elif strategy == "salted":
        salted_pts = pts.withColumn("_salt", F.pmod(F.xxhash64(F.col(lon), F.col(lat)), F.lit(salt)))
        replicated = cover.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        joined = salted_pts.join(replicated, ["cell", "_salt"]).where(refine).drop("_salt")
    else:
        raise ValueError("unknown strategy %r" % strategy)

    return joined.drop("cell", "fw", "fs", "fe", "fn")


def _pip_index_join(points_df, footprints_df, fp_id_cols, lon, lat):
    """Broadcast-RectIndex refine inside mapInPandas (the STRtree-style
    plan): candidate search + exact containment fused, zero shuffle."""
    spark = points_df.sparkSession
    fps = footprints_df.select("fw", "fs", "fe", "fn", *fp_id_cols).collect()
    idx = RectIndex(
        [r.fw for r in fps],
        [r.fs for r in fps],
        [r.fe for r in fps],
        [r.fn for r in fps],
        np.arange(len(fps), dtype=np.int64),
    )
    payload = [[getattr(r, c) for c in fp_id_cols] for r in fps]
    bc = spark.sparkContext.broadcast((idx, payload))

    pt_schema = points_df.schema
    out_schema = T.StructType(
        list(pt_schema.fields)
        + [footprints_df.schema[c] for c in fp_id_cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rio_toa_spark.operators.batching import coalesce_batches

        index, fp_payload = bc.value
        # page rows are tiny: coalesce the session's 256-row Arrow
        # batches so the per-batch pandas/Arrow overhead amortizes
        # (see operators/batching.py; row-independent, result-neutral)
        for pdf in coalesce_batches(batches):
            pt_idx, box_ids = index.query_points(pdf[lon].to_numpy(), pdf[lat].to_numpy())
            left = pdf.iloc[pt_idx].reset_index(drop=True)
            for j, col in enumerate(fp_id_cols):
                left[col] = [fp_payload[int(b)][j] for b in box_ids]
            yield left

    return points_df.mapInPandas(run, out_schema)


# ------------------------------------------------------------------ kNN


def knn_join(
    points_df: DataFrame,
    tiles_df: DataFrame,
    k: int = 3,
    strategy: str = "broadcast",
    level: int = DEFAULT_LEVEL,
    ring_radius: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    point_key: str = "url",
) -> DataFrame:
    """k nearest tile centroids per point (euclidean in degrees),
    deterministic tie-break on (distance, tile_id).

    'broadcast': exact brute-force against broadcast centroids inside
    an Arrow kernel — the right plan while tiles are dimension-sized.
    'cells': cell-ring candidate expansion + window row_number — the
    shuffle-based plan for a non-broadcastable tile side; rings expand
    until the k-th candidate's distance is provably covered
    (ring r guarantees all tiles within (r) cells; a candidate set is
    complete once kth_dist <= r * min_cell_extent).
    """
    tiles = tile_footprints(tiles_df).select(
        "tile_id",
        ((F.col("fw") + F.col("fe")) / 2).alias("cx"),
        ((F.col("fs") + F.col("fn")) / 2).alias("cy"),
    )
    return knn_centroids(
        points_df, tiles, k=k, strategy=strategy, level=level,
        ring_radius=ring_radius, lon=lon, lat=lat, point_key=point_key,
    )


def knn_centroids(
    points_df: DataFrame,
    centroids_df: DataFrame,
    k: int = 3,
    strategy: str = "broadcast",
    level: int = DEFAULT_LEVEL,
    ring_radius: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    point_key: str = "url",
) -> DataFrame:
    """kNN against an arbitrary (tile_id, cx, cy) centroid table."""
    if strategy == "broadcast":
        return _knn_broadcast(points_df, centroids_df, k, lon, lat, point_key)
    if strategy == "cells":
        return _knn_cells(points_df, centroids_df, k, level, ring_radius, lon, lat, point_key)
    raise ValueError("unknown strategy %r" % strategy)


def _knn_broadcast(points_df, tiles, k, lon, lat, point_key):
    spark = points_df.sparkSession
    # project BEFORE the opaque kernel: Spark cannot see which columns
    # mapInPandas touches and would ship (and scan) every page column —
    # including the ~0.5 KB html payloads — through Arrow into Python
    # (guide rule; measured 2.1 s -> 1.0 s on the 400k-page bench)
    points_df = points_df.select(point_key, lon, lat)
    tile_rows = tiles.orderBy("tile_id").collect()
    ids = [r.tile_id for r in tile_rows]
    cx = np.array([r.cx for r in tile_rows])
    cy = np.array([r.cy for r in tile_rows])
    bc = spark.sparkContext.broadcast((ids, cx, cy))

    out_schema = T.StructType(
        [
            points_df.schema[point_key],
            T.StructField("tile_id", T.StringType()),
            T.StructField("dist", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tids, tx, ty = bc.value
        tid_arr = np.array(tids)
        T = len(tids)
        if T == 0:  # no centroids -> no neighbors (not an error)
            return
        kk = min(k, T)
        m = min(4 * kk, T - 1)
        # cache blocking: an Arrow batch of ~10k points against T
        # centroids materializes an (n x T) f64 distance matrix —
        # ~0.5 GB at T=6k — and streams it through SIX elementwise +
        # selection passes, making the kernel DRAM-bandwidth-bound
        # (the worst scaler on a shared-memory box, BENCH.md). Points
        # are processed in sub-blocks sized so the two (bs x T)
        # temporaries stay L2/L3-resident across all passes: measured
        # 2.6x single-thread at T=6144 (22.5s -> 8.7s / 100k points,
        # flat from bs~170 down to 64) and a much flatter 2->8-core
        # curve. Bitwise-neutral: every op is row-local, so blocking
        # changes no IEEE result.
        bs = max(32, (1 << 20) // T)

        def topk_block(px, py):
            # squared distance in place (2 temporaries, not 5); rank
            # on d^2 (monotone), take sqrt only of the k selected
            # values — sqrt(d^2) is the identical IEEE double as
            # sorting on d
            d2 = px[:, None] - tx[None, :]
            d2 *= d2
            dy = py[:, None] - ty[None, :]
            dy *= dy
            d2 += dy
            # top-k via argpartition (O(T)) instead of a full row sort
            # (O(T log T), 3x slower at T=384); deterministic
            # (dist, tile_id) order restored by a lexsort of the slice.
            part = np.argpartition(d2, m, axis=1)[:, : m + 1]
            vals = np.take_along_axis(d2, part, axis=1)
            fix = np.lexsort((part, vals), axis=1)[:, :kk]
            order = np.take_along_axis(part, fix, axis=1)
            svals = np.take_along_axis(vals, fix, axis=1)
            # exactness guard: if the kth value reaches the slice's
            # max, ties may extend past the partition window — redo
            # those rows with the full stable sort
            if m + 1 < T:
                slice_max = vals.max(axis=1)
                risky = np.nonzero(svals[:, kk - 1] >= slice_max)[0]
                if risky.size:
                    full = np.lexsort(
                        (np.broadcast_to(np.arange(T), (risky.size, T)), d2[risky]),
                        axis=1,
                    )[:, :kk]
                    order[risky] = full
                    svals[risky] = np.take_along_axis(d2[risky], full, axis=1)
            return order, svals

        # input accumulation: the session caps Arrow batches at 256
        # rows (sized for half-MB binary TILE rows, session.py) — for
        # tiny page rows that is ~25k python batches per 6.4M points,
        # and per-batch pandas/Arrow overhead (~ms) dwarfs the ~100µs
        # of numpy compute. Coalesce incoming batches to ~8k-point
        # chunks before running the blocked kernel; outputs flush at
        # chunk granularity. Order within a partition is preserved and
        # per-row results are independent, so accumulation is
        # result-neutral.
        target = max(bs, 8192)
        buf: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        buffered = 0

        def flush():
            keys = np.concatenate([b[0] for b in buf])
            px = np.concatenate([b[1] for b in buf])
            py = np.concatenate([b[2] for b in buf])
            n = len(px)
            orders, sv = [], []
            for s in range(0, n, bs):
                o, v = topk_block(px[s : s + bs], py[s : s + bs])
                orders.append(o)
                sv.append(v)
            order = np.concatenate(orders) if orders else np.empty((0, kk), np.int64)
            svals = np.concatenate(sv) if sv else np.empty((0, kk))
            return pd.DataFrame(
                {
                    point_key: np.repeat(keys, kk),
                    "tile_id": tid_arr[order].ravel(),
                    "dist": np.sqrt(svals).ravel(),
                    "rank": np.tile(np.arange(1, kk + 1), n),
                }
            )

        for pdf in batches:
            buf.append(
                (pdf[point_key].to_numpy(), pdf[lon].to_numpy(), pdf[lat].to_numpy())
            )
            buffered += len(pdf)
            if buffered >= target:
                yield flush()
                buf, buffered = [], 0
        if buf:
            yield flush()

    return points_df.mapInPandas(run, out_schema)


def _knn_cells(points_df, tiles, k, level, radius, lon, lat, point_key):
    """Cell-ring candidate generation + windowed top-k, with an exact
    fallback for incomplete points.

    Each tile is replicated into every cell within Chebyshev radius R
    of its centroid's cell; points equi-join on their own cell, then a
    (point) window takes the top-k by (dist, tile_id). Completeness
    proof: a tile whose centroid cell is Chebyshev-further than R from
    the point's cell is at least R*min(cell_dx, cell_dy) degrees away,
    so a point's ring result is provably exact iff it found >= k
    candidates AND its kth distance < R*min(dx, dy). Points failing
    either condition (sparse regions — e.g. mid-ocean pages) are
    rerouted through the exact broadcast kernel; the union is exact
    for every point. One candidate shuffle + one window shuffle; the
    straggler set is tiny by construction.
    """
    from pyspark.sql.window import Window

    dx, dy = cell_mod.cell_size_degrees(level)
    guard = radius * min(dx, dy)
    n = 1 << level
    pts = with_cell(points_df, lon, lat, level)

    tx, ty = grid_xy_expr(F.col("cx"), F.col("cy"), level)
    cand = (
        tiles.withColumn("_tx", tx)
        .withColumn("_ty", ty)
        .withColumn("_ox", F.explode(F.sequence(F.lit(-radius), F.lit(radius))))
        .withColumn("_oy", F.explode(F.sequence(F.lit(-radius), F.lit(radius))))
        .withColumn("_gx", F.col("_tx") + F.col("_ox"))
        .withColumn("_gy", F.col("_ty") + F.col("_oy"))
        .where((F.col("_gx") >= 0) & (F.col("_gx") < n) & (F.col("_gy") >= 0) & (F.col("_gy") < n))
        .withColumn("cell", _spread_bits(F.col("_gx")).bitwiseOR(F.shiftleft(_spread_bits(F.col("_gy")), 1)))
        .select("tile_id", "cx", "cy", "cell")
    )
    # rank on squared distance (same order as dist up to IEEE sqrt
    # rounding collisions — d^2 is strictly more discriminating, and
    # the broadcast kernel + SQL twin rank identically on d^2)
    dist2 = (F.col(lon) - F.col("cx")) * (F.col(lon) - F.col("cx")) + (F.col(lat) - F.col("cy")) * (F.col(lat) - F.col("cy"))
    w = Window.partitionBy(point_key).orderBy(F.col("dist2").asc(), F.col("tile_id").asc())
    ranked = (
        pts.join(cand, "cell")
        .withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .withColumn("dist", F.sqrt(F.col("dist2")))
        .drop("dist2")
        .where(F.col("rank") <= k)
        .select(point_key, "tile_id", "dist", F.col("rank").cast("int").alias("rank"))
    )
    complete_keys = (
        ranked.groupBy(point_key)
        .agg(F.count("*").alias("n"), F.max("dist").alias("kth"))
        .where((F.col("n") == k) & (F.col("kth") < F.lit(guard)))
        .select(point_key)
    )
    exact_part = ranked.join(complete_keys, point_key)
    stragglers = points_df.join(complete_keys, point_key, "left_anti")
    # stragglers get a DISTRIBUTED exact pass (cross join + window) —
    # never _knn_broadcast, which collects the full centroid table to
    # the driver and would crash at exactly the scale that motivates
    # the 'cells' strategy. The straggler side is tiny by construction,
    # so Spark broadcasts it and streams the centroid side map-side.
    fallback = _knn_exact_shuffle(stragglers, tiles, k, lon, lat, point_key)
    return exact_part.unionByName(fallback)


def _knn_exact_shuffle(points_df, tiles, k, lon, lat, point_key):
    """Exact kNN with no driver-side collect of either input: cross
    join + per-point window top-k. Intended for small point sets (the
    'cells' stragglers); cost is |points| x |centroids| scored rows,
    all executor-side."""
    from pyspark.sql.window import Window

    dist2 = (F.col(lon) - F.col("cx")) * (F.col(lon) - F.col("cx")) + (F.col(lat) - F.col("cy")) * (F.col(lat) - F.col("cy"))
    w = Window.partitionBy(point_key).orderBy(F.col("dist2").asc(), F.col("tile_id").asc())
    return (
        points_df.select(point_key, lon, lat)
        .crossJoin(tiles.select("tile_id", "cx", "cy"))
        .withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            point_key,
            "tile_id",
            F.sqrt(F.col("dist2")).alias("dist"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ----------------------------------------------------------- partitioning


def repartition_by_cell(df: DataFrame, num_partitions: int | None = None, level: int = DEFAULT_LEVEL, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Explicit range-partitioned shuffle on the Z-order cell id —
    spatially clustered output partitions (north rule: 'explicit
    range-partitioned shuffles')."""
    out = with_cell(df, lon, lat, level, out="_range_cell")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(parts, "_range_cell").drop("_range_cell")
