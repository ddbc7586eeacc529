"""Zonal statistics — the raster↔vector aggregation surface of the
graft layer (BASELINE.json north_rule "raster<->vector"; no reference
counterpart — rio-toa's only whole-array reductions are the overflow
checks at rio_toa/toa_utils.py:131-136).

``zonal_stats(tiles, zones)`` computes per-(zone, band) count / mean /
min / max over the pixels whose CENTERS fall inside the zone's WGS84
box, nodata excluded.

Scale design:

* Candidate (tile, zone) pairs come from the same Morton-cell prune
  pip_join uses: zones explode to covering cells (broadcast side),
  tiles explode to THEIR covering cells, equi-join on cell. A pair
  whose boxes share k cells would appear k times; instead of a
  duplicate-elimination shuffle (which would move pixel payloads), a
  pair is kept only in the ONE cell containing the SW corner of the
  bbox intersection — that cell is in both covers by construction, so
  each pair survives exactly once, join-local.
* The pixel kernel is an Arrow-batched mapInPandas that emits
  per-(tile, zone) PARTIALS (count, sum, min, max) — the map-side
  combine. The final groupBy merges a few doubles per pair; the pixel
  binary never crosses a shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rio_toa_spark.operators.spatial_join import (
    DEFAULT_LEVEL,
    _explode_cover,
    cell_expr,
)


def _tile_cover_cells(tiles_df: DataFrame, level: int) -> DataFrame:
    """Explode each tile row to its covering cells (bounds_* bbox)."""
    renamed = tiles_df.select(
        "*",
        F.col("bounds_w").alias("fw"),
        F.col("bounds_s").alias("fs"),
        F.col("bounds_e").alias("fe"),
        F.col("bounds_n").alias("fn"),
    )
    return _explode_cover(renamed, level).drop("fw", "fs", "fe", "fn")


_PARTIAL_FIELDS = [
    T.StructField("band", T.IntegerType()),
    T.StructField("px_count", T.LongType()),
    T.StructField("px_sum", T.DoubleType()),
    T.StructField("px_min", T.DoubleType()),
    T.StructField("px_max", T.DoubleType()),
]


def dn_histogram(
    tiles_df: DataFrame,
    n_buckets: int = 16,
    include_nodata: bool = False,
) -> DataFrame:
    """Per-(scene, band) histogram of uint16 DN values over
    ``n_buckets`` equal-width buckets of [0, 65536).

    Same partial-aggregation shape as zonal_stats: the Arrow kernel
    bincounts each tile locally (one pass, O(pixels)), and only the
    (scene, band, bucket, n) partials shuffle. ``n_buckets`` must be a
    power of two so bucketing is a shift.

    Nodata filtering applies only when the input carries a ``nodata``
    column (raw DN tiles); frames without one (e.g. TOA output rows)
    histogram every pixel rather than failing mid-executor.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two, got %d" % n_buckets)
    shift = 16 - int(np.log2(n_buckets))
    drop_nodata = (not include_nodata) and "nodata" in tiles_df.columns

    schema = T.StructType(
        [
            tiles_df.schema["scene_id"],
            tiles_df.schema["band"],
            T.StructField("bucket", T.IntegerType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sid, band, bucket, n = [], [], [], []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.pixels, dtype=np.uint16)
                if drop_nodata:
                    arr = arr[arr != row.nodata]
                counts = np.bincount(arr >> shift, minlength=n_buckets)
                nz = np.nonzero(counts)[0]
                sid.extend([row.scene_id] * len(nz))
                band.extend([row.band] * len(nz))
                bucket.extend(nz.tolist())
                n.extend(counts[nz].tolist())
            yield pd.DataFrame(
                {"scene_id": sid, "band": band, "bucket": bucket, "n": n}
            )

    return (
        tiles_df.mapInPandas(run, schema)
        .groupBy("scene_id", "band", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def zonal_stats(
    tiles_df: DataFrame,
    zones_df: DataFrame,
    zone_key: str = "zone_id",
    level: int = DEFAULT_LEVEL,
) -> DataFrame:
    """Per-(zone, band) pixel statistics.

    ``zones_df``: (zone_key, fw, fs, fe, fn) WGS84 boxes — dimension
    sized (broadcast). ``tiles_df``: the engine tile shape (scene_id,
    band, width, height, nodata, bounds_*, pixels uint16 LE).

    A pixel belongs to a zone iff its center lies inside the zone box
    under the half-open convention [fw, fe) x [fs, fn): a center lying
    exactly on a boundary shared by two adjacent zones is counted by
    exactly one of them. Nodata pixels are excluded when the input carries a
    ``nodata`` column (raw tiles); TOA output rows (float32/float64
    payloads with a ``dtype`` column, no ``nodata``) aggregate every
    pixel. Returns one row per (zone, band) with px_count / px_mean /
    px_min / px_max; zones intersecting no tile produce no row.
    """
    zcover = _explode_cover(zones_df, level)
    tcover = _tile_cover_cells(tiles_df, level)

    overlap = (
        (F.col("bounds_w") <= F.col("fe"))
        & (F.col("bounds_e") >= F.col("fw"))
        & (F.col("bounds_s") <= F.col("fn"))
        & (F.col("bounds_n") >= F.col("fs"))
    )
    # canonical cell of the intersection's SW corner: keeps each
    # (tile, zone) pair exactly once without a dedup shuffle
    canonical = F.col("cell") == cell_expr(
        F.greatest(F.col("bounds_w"), F.col("fw")),
        F.greatest(F.col("bounds_s"), F.col("fs")),
        level,
    )
    joined = tcover.join(F.broadcast(zcover), "cell").where(overlap & canonical)

    out_schema = T.StructType([zones_df.schema[zone_key]] + _PARTIAL_FIELDS)
    has_dtype = "dtype" in tiles_df.columns
    has_nodata = "nodata" in tiles_df.columns

    # mapInArrow, not mapInPandas: the pandas conversion materializes
    # every 0.5 MB pixel cell as a python bytes copy before the kernel
    # can wrap it; Arrow record batches hand the kernel zero-copy
    # buffer slices instead (same pattern as the TOA strip kernels).
    # Arithmetic is untouched — identical numpy ops over identical
    # buffers — so partials stay bitwise-equal.
    from pyspark.sql.pandas.types import to_arrow_schema

    pa_out = to_arrow_schema(out_schema)

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            cols = {name: batch.column(name) for name in batch.schema.names}
            zcol = cols[zone_key]
            zid, band, cnt, tot, mn, mx = [], [], [], [], [], []
            for i in range(batch.num_rows):
                height = int(cols["height"][i].as_py())
                width = int(cols["width"][i].as_py())
                np_dtype = (
                    np.dtype(cols["dtype"][i].as_py()) if has_dtype else np.dtype(np.uint16)
                )
                arr = np.frombuffer(
                    cols["pixels"][i].as_buffer(), dtype=np_dtype
                ).reshape(height, width)
                bw = cols["bounds_w"][i].as_py()
                be = cols["bounds_e"][i].as_py()
                bs = cols["bounds_s"][i].as_py()
                bn = cols["bounds_n"][i].as_py()
                dx = (be - bw) / width
                dy = (bn - bs) / height
                # pixel-center coordinates; raster row 0 is the north edge
                cx = bw + (np.arange(width) + 0.5) * dx
                cy = bn - (np.arange(height) + 0.5) * dy
                # the in-zone pixels [fw, fe) x [fs, fn) form a
                # contiguous block (cx ascending, cy descending):
                # compute slice bounds and take a VIEW, not the
                # boolean-mask copy np.ix_ would make
                x0 = np.searchsorted(cx, cols["fw"][i].as_py(), side="left")
                x1 = np.searchsorted(cx, cols["fe"][i].as_py(), side="left")
                asc = -cy  # ascending; cy < fn <=> -cy > -fn
                y0 = np.searchsorted(asc, -cols["fn"][i].as_py(), side="right")
                y1 = np.searchsorted(asc, -cols["fs"][i].as_py(), side="right")
                sub = arr[y0:y1, x0:x1]
                nodata_v = cols["nodata"][i].as_py() if has_nodata else None
                # a null nodata keeps every pixel — same outcome as the
                # old pandas path, where a NaN-ified nodata made the
                # `!=` mask all-True
                vals = sub[sub != nodata_v] if nodata_v is not None else sub.ravel()
                zid.append(zcol[i].as_py())
                band.append(cols["band"][i].as_py())
                cnt.append(int(vals.size))
                tot.append(float(vals.sum(dtype=np.float64)) if vals.size else 0.0)
                mn.append(float(vals.min()) if vals.size else float("inf"))
                mx.append(float(vals.max()) if vals.size else float("-inf"))
            yield pa.RecordBatch.from_pydict(
                {
                    zone_key: zid,
                    "band": band,
                    "px_count": cnt,
                    "px_sum": tot,
                    "px_min": mn,
                    "px_max": mx,
                },
                schema=pa_out,
            )

    extra_zone_cols = [
        c for c in zones_df.columns if c not in (zone_key, "fw", "fs", "fe", "fn")
    ]
    partials = joined.drop("cell", *extra_zone_cols).mapInArrow(run, out_schema)
    return (
        partials.groupBy(zone_key, "band")
        .agg(
            F.sum("px_count").alias("px_count"),
            F.sum("px_sum").alias("px_sum"),
            F.min("px_min").alias("px_min"),
            F.max("px_max").alias("px_max"),
        )
        .where(F.col("px_count") > 0)
        .select(
            zone_key,
            "band",
            "px_count",
            (F.col("px_sum") / F.col("px_count")).alias("px_mean"),
            "px_min",
            "px_max",
        )
    )
