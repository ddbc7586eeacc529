"""TOA pipelines as Spark DataFrame operators.

Plan shape (the Spark equivalent of rio-toa's calculate_* drivers at
rio_toa/radiance.py:64-128, reflectance.py:131-210,
brightness_temp.py:94-172):

    tiles (scan, partition-pruned on band)
      |> broadcast hash join on scene_id against the parsed scenes dim
      |> mapInArrow kernel (zero-copy Arrow buffers -> numpy per tile)
      |> sink (parquet/iceberg, partitionBy scene_id, band)

Scene constants (M/A/E/K1/K2) travel through the broadcast join as
columns — Catalyst's version of the reference's ``global_args`` dict.
The pixel math itself is opaque to Catalyst by design: bitwise float32
parity requires numpy's exact op order (see functions/kernels.py).

Execution notes:
* Kernels run over ``mapInArrow``: the binary pixel buffers are read
  zero-copy from the Arrow batch (``scalar.as_buffer()``) instead of
  materializing per-row python bytes in pandas — measured ~1.5x on the
  radiance path.
* Strips of 64 rows keep float64 intermediates L2-resident (bitwise
  identical: every kernel op is elementwise).

Scalability notes:
* No shuffle anywhere in radiance / reflectance / brightness-temp —
  the scenes side is broadcast, tiles stream through map tasks.
* The reference's multiband stack (reflectance.py:93-96) exists only
  because its sink is one multi-band GeoTIFF; the math is
  band-elementwise, so we process band rows independently (bit-equal,
  proven in tests) and offer stack_bands() as an optional sink-side
  grouping. At 100 TB this turns a would-be k-way shuffle join into a
  pure map.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rio_toa_spark.functions import kernels, sun
from rio_toa_spark.functions.mtl import mtl_band_value, with_parsed_mtl

TILE_KEY = ["scene_id", "band", "tile_row", "tile_col"]

# Cache blocking: kernels run on horizontal strips so float64
# intermediates stay L2-resident instead of streaming DRAM (the
# kernels are elementwise, so strip execution is bitwise-identical to
# whole-tile execution — asserted by the parity tests).
STRIP_ROWS = 64


def _strips(height: int):
    for r0 in range(0, height, STRIP_ROWS):
        yield r0, min(r0 + STRIP_ROWS, height)

_OUT_FIELDS = [
    T.StructField("scene_id", T.StringType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("tile_row", T.IntegerType()),
    T.StructField("tile_col", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("dtype", T.StringType()),
    T.StructField("pixels", T.BinaryType()),
]
TOA_OUT_SCHEMA = T.StructType(_OUT_FIELDS)


def prepare_scenes(scenes_df: DataFrame) -> DataFrame:
    """Parse the ODL text column into the typed ``mtl`` struct
    (distributed MTL extraction; reference loads per-file on the
    driver at rio_toa/toa_utils.py:50-55)."""
    return with_parsed_mtl(scenes_df, "mtl_txt", "mtl")


def _nodata_of(value) -> int | None:
    return None if value is None or (isinstance(value, float) and np.isnan(value)) else int(value)


def _decode(dn_bytes: bytes, height: int, width: int) -> np.ndarray:
    return np.frombuffer(dn_bytes, dtype="<u2").reshape(int(height), int(width))


def _arrow_toa_op(src: DataFrame, dst_dtype: str, compute) -> DataFrame:
    """Shared mapInArrow runner: per row, hand ``compute`` the
    zero-copy uint16 DN array plus a scalar-accessor, collect the
    output buffer bytes, and emit the TOA output batch."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            cols = {name: batch.column(name) for name in batch.schema.names}
            n = batch.num_rows
            out = []
            for i in range(n):
                height = cols["height"][i].as_py()
                width = cols["width"][i].as_py()
                dn = np.frombuffer(cols["pixels"][i].as_buffer(), dtype="<u2").reshape(
                    int(height), int(width)
                )
                get = lambda name: cols[name][i].as_py()  # noqa: B023
                out.append(compute(dn, get))
            yield pa.record_batch(
                {
                    "scene_id": cols["scene_id"],
                    "band": cols["band"],
                    "tile_row": cols["tile_row"],
                    "tile_col": cols["tile_col"],
                    "width": cols["width"],
                    "height": cols["height"],
                    "dtype": pa.array([dst_dtype] * n),
                    "pixels": pa.array(out, pa.binary()),
                }
            )

    return src.mapInArrow(run, TOA_OUT_SCHEMA)


def radiance_tiles(
    tiles_df: DataFrame,
    scenes_df: DataFrame,
    band: int,
    dst_dtype: str = "float32",
    rescale_factor: float | None = None,
    clip: bool = True,
) -> DataFrame:
    """TOA radiance for one band: the Spark form of
    calculate_landsat_radiance (rio_toa/radiance.py:64-128); per-tile
    math matches _radiance_worker (:45-61) bit-for-bit."""
    factor = kernels.normalize_scale(rescale_factor, dst_dtype)
    scenes = prepare_scenes(scenes_df)
    dim = scenes.select(
        "scene_id",
        mtl_band_value(F.col("mtl"), "RADIOMETRIC_RESCALING", "RADIANCE_MULT_BAND_", F.lit(band)).alias("c_ml"),
        mtl_band_value(F.col("mtl"), "RADIOMETRIC_RESCALING", "RADIANCE_ADD_BAND_", F.lit(band)).alias("c_al"),
    )
    src = tiles_df.filter(F.col("band") == band).join(F.broadcast(dim), "scene_id")
    np_dtype = np.dtype(dst_dtype)

    def compute(dn, get):
        arr = np.empty(dn.shape, dtype=np_dtype)
        ml, al, nodata = get("c_ml"), get("c_al"), _nodata_of(get("nodata"))
        for r0, r1 in _strips(dn.shape[0]):
            arr[r0:r1] = kernels.rescale(
                kernels.radiance(dn[r0:r1], ml, al, nodata), factor, np_dtype, clip=clip
            )
        return arr.tobytes()

    return _arrow_toa_op(src, dst_dtype, compute)


def reflectance_tiles(
    tiles_df: DataFrame,
    scenes_df: DataFrame,
    bands: list[int],
    dst_dtype: str = "float32",
    rescale_factor: float | None = None,
    clip: bool = True,
    per_pixel_sun: bool = False,
) -> DataFrame:
    """TOA reflectance for the given bands (scene-center or per-pixel
    sun elevation): the Spark form of calculate_landsat_reflectance
    (rio_toa/reflectance.py:131-210).

    Bit parity with _reflectance_worker (:77-128): each band row is
    processed as a depth-1 stack — float32 pre-cast, length-1 M/A
    lists (which upcast intermediates to float64 exactly like the
    reference's per-band lists), E as a length-1 float64 array or the
    per-pixel grid reshaped (rows, cols, 1).
    """
    factor = kernels.normalize_scale(rescale_factor, dst_dtype)
    # Per-band constants need a (scene x band) dim; build it by
    # cross-joining the tiny scenes dim with the requested band list —
    # still broadcastable (|scenes| * |bands| rows).
    band_lit = F.explode(F.array(*[F.lit(b) for b in bands])).alias("band")
    dim = prepare_scenes(scenes_df).select("scene_id", "mtl").select(
        "scene_id", "mtl", band_lit
    ).select(
        "scene_id",
        "band",
        mtl_band_value(F.col("mtl"), "RADIOMETRIC_RESCALING", "REFLECTANCE_MULT_BAND_", F.col("band")).alias("c_ml"),
        mtl_band_value(F.col("mtl"), "RADIOMETRIC_RESCALING", "REFLECTANCE_ADD_BAND_", F.col("band")).alias("c_al"),
        F.col("mtl.L1_METADATA_FILE.IMAGE_ATTRIBUTES.SUN_ELEVATION").alias("c_e"),
        F.col("mtl.L1_METADATA_FILE.PRODUCT_METADATA.DATE_ACQUIRED").alias("c_date"),
        F.col("mtl.L1_METADATA_FILE.PRODUCT_METADATA.SCENE_CENTER_TIME").alias("c_time"),
    )
    src = tiles_df.filter(F.col("band").isin(bands)).join(
        F.broadcast(dim), ["scene_id", "band"]
    )

    np_dtype = np.dtype(dst_dtype)

    def compute(dn, get):
        rows_, cols_ = dn.shape
        nodata = _nodata_of(get("nodata"))
        ml, al = get("c_ml"), get("c_al")
        arr = np.empty((1, rows_, cols_), dtype=np_dtype)
        if per_pixel_sun:
            bbox = [get("bounds_w"), get("bounds_s"), get("bounds_e"), get("bounds_n")]
            date_s, time_s = get("c_date"), get("c_time")
        else:
            e_scene = get("c_e")
        for r0, r1 in _strips(rows_):
            data = dn[r0:r1].astype(np.float32)[np.newaxis, :, :]
            if per_pixel_sun:
                elev = sun.sun_elevation_rows(
                    bbox, (rows_, cols_), r0, r1, date_s, time_s
                ).reshape(r1 - r0, cols_, 1)
            else:
                elev = np.array([e_scene])
            arr[:, r0:r1] = kernels.rescale(
                kernels.reflectance(data, [ml], [al], elev, nodata),
                factor,
                np_dtype,
                clip=clip,
            )
        return arr.tobytes()

    return _arrow_toa_op(src, dst_dtype, compute)


def brightness_temp_tiles(
    tiles_df: DataFrame,
    scenes_df: DataFrame,
    band: int = 10,
    temp_scale: str = "K",
    dst_dtype: str = "float32",
    src_nodata: int = 0,
) -> DataFrame:
    """Brightness temperature for a thermal band: the Spark form of
    calculate_landsat_brightness_temperature
    (rio_toa/brightness_temp.py:94-172). Matches
    _brightness_temp_worker (:65-91): kernel -> temp_rescale -> direct
    dtype cast, no 0-1 rescale; nodata hardcoded to 0 like the
    reference's global_args (:161)."""
    scenes = prepare_scenes(scenes_df)
    dim = scenes.select(
        "scene_id",
        mtl_band_value(F.col("mtl"), "RADIOMETRIC_RESCALING", "RADIANCE_MULT_BAND_", F.lit(band)).alias("c_ml"),
        mtl_band_value(F.col("mtl"), "RADIOMETRIC_RESCALING", "RADIANCE_ADD_BAND_", F.lit(band)).alias("c_al"),
        mtl_band_value(F.col("mtl"), "TIRS_THERMAL_CONSTANTS", "K1_CONSTANT_BAND_", F.lit(band)).alias("c_k1"),
        mtl_band_value(F.col("mtl"), "TIRS_THERMAL_CONSTANTS", "K2_CONSTANT_BAND_", F.lit(band)).alias("c_k2"),
    )
    src = tiles_df.filter(F.col("band") == band).join(F.broadcast(dim), "scene_id")

    np_dtype = np.dtype(dst_dtype)

    def compute(dn, get):
        arr = np.empty(dn.shape, dtype=np_dtype)
        ml, al, k1, k2 = get("c_ml"), get("c_al"), get("c_k1"), get("c_k2")
        for r0, r1 in _strips(dn.shape[0]):
            arr[r0:r1] = kernels.temp_rescale(
                kernels.brightness_temp(dn[r0:r1], ml, al, k1, k2, src_nodata),
                temp_scale,
            ).astype(np_dtype)
        return arr.tobytes()

    return _arrow_toa_op(src, dst_dtype, compute)


def stack_bands(toa_df: DataFrame, bands: list[int]) -> DataFrame:
    """Optional sink-side band stacking (one row per tile with the
    band planes in order) — the Spark analogue of the reference's
    multi-band GeoTIFF assembly (rio_toa/reflectance.py:198-210).
    The only shuffle in the TOA path, and only when requested.

    Groups by the tile key ONLY and raises if the collected planes
    disagree on width/height/dtype — the stack-level analogue of the
    reference's output-shape check (rio_toa/reflectance.py:67-72).
    Keying on the dims instead would silently SPLIT a mismatched tile
    into two partial rows."""
    order = F.array_position(F.array(*[F.lit(b) for b in bands]), F.col("band"))
    grouped = (
        toa_df.withColumn("_ord", order)
        .groupBy("scene_id", "tile_row", "tile_col")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_ord"),
                        F.col("band"),
                        F.col("width"),
                        F.col("height"),
                        F.col("dtype"),
                        F.col("pixels"),
                    )
                )
            ).alias("_planes")
        )
    )
    dims = F.array_distinct(
        F.transform(
            "_planes",
            lambda p: F.struct(
                p["width"].alias("width"),
                p["height"].alias("height"),
                p["dtype"].alias("dtype"),
            ),
        )
    )
    first = F.element_at(dims, 1)
    # the guard rides EVERY emitted column (not just width): a consumer
    # that selects only `planes`/`bands` lets Catalyst prune the other
    # columns, and a guard carried by one pruned column would silently
    # vanish — the exact misaligned-stack failure it exists to prevent
    err = F.raise_error(
        F.concat(
            F.lit("stack_bands: bands disagree on width/height/dtype for tile "),
            F.col("scene_id"),
            F.lit("/"),
            F.col("tile_row").cast("string"),
            F.lit("/"),
            F.col("tile_col").cast("string"),
            F.lit(" — refusing to stack misaligned planes"),
        )
    )
    ok = F.size(dims) == 1

    def checked(col: F.Column) -> F.Column:
        return F.when(ok, col).otherwise(err)

    return grouped.select(
        "scene_id",
        "tile_row",
        "tile_col",
        checked(first["width"]).alias("width"),
        checked(first["height"]).alias("height"),
        checked(first["dtype"]).alias("dtype"),
        checked(F.transform("_planes", lambda p: p["band"])).alias("bands"),
        checked(F.transform("_planes", lambda p: p["pixels"])).alias("planes"),
    )


def tile_stats(toa_df: DataFrame) -> DataFrame:
    """Per-tile min/max/mean over the decoded payload — the engine's
    form of the whole-array reductions the reference uses for overflow
    checks and tests (rio_toa/toa_utils.py:131-136)."""
    schema = T.StructType(
        [f for f in _OUT_FIELDS if f.name != "pixels"]
        + [
            T.StructField("px_min", T.DoubleType()),
            T.StructField("px_max", T.DoubleType()),
            T.StructField("px_mean", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mins, maxs, means = [], [], []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.pixels, dtype=np.dtype(row.dtype))
                # isfinite works on integer and float dtypes alike for
                # masking; only a bool mask is materialized (no upcast)
                finite = (
                    arr[np.isfinite(arr)]
                    if np.issubdtype(arr.dtype, np.floating)
                    else arr
                )
                mins.append(float(finite.min()) if finite.size else float("nan"))
                maxs.append(float(finite.max()) if finite.size else float("nan"))
                means.append(float(finite.mean()) if finite.size else float("nan"))
            yield pd.DataFrame(
                {
                    "scene_id": pdf["scene_id"],
                    "band": pdf["band"],
                    "tile_row": pdf["tile_row"],
                    "tile_col": pdf["tile_col"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "dtype": pdf["dtype"],
                    "px_min": mins,
                    "px_max": maxs,
                    "px_mean": means,
                }
            )

    return toa_df.mapInPandas(run, schema)


_HIST_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def value_histogram(toa_df: DataFrame, bucket_scale: float = 1.0 / 64) -> DataFrame:
    """Order-insensitive EXACT summary of a TOA raster: per
    (scene, band, bucket) — pixel count, distinct-value count and the
    min/max pixel value, with bucket = floor(value * bucket_scale)
    computed in float32.

    Every output is exact under any execution order (integer counts;
    f32 min/max widened losslessly to f64), which is what makes this
    the SQL-twinnable projection of a float32 pixel buffer: the DuckDB
    oracle recomputes the identical f32 values from the fixture
    generator's exploded-DN side table and must match bit-for-bit.
    Pick a power-of-two ``bucket_scale`` so the f32 multiply is exact.
    Non-finite pixels are dropped (radiance/reflectance emit none;
    brightness_temp NaN-masks nodata — count those via tile_stats).

    Plan shape: per-tile ``np.unique`` partials map-side, then a
    hash-aggregate keyed (scene, band, bucket, value) whose width is
    bounded by the value DOMAIN (<= 65536 distinct per scene/band for
    uint16-sourced rasters), independent of pixel count — so the
    shuffle stays tiny at 100 TB.
    """
    scale = float(bucket_scale)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = {
            "scene_id": pd.Series([], dtype=object),
            "band": pd.Series([], dtype="int32"),
            "bucket": pd.Series([], dtype="int32"),
            "value": pd.Series([], dtype="float64"),
            "n": pd.Series([], dtype="int64"),
        }
        for pdf in batches:
            cols = {k: [] for k in empty}
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.pixels, dtype=np.dtype(row.dtype)).ravel()
                if np.issubdtype(arr.dtype, np.floating):
                    arr = arr[np.isfinite(arr)]
                vals, counts = np.unique(arr, return_counts=True)
                # uint8/uint16 widen exactly into f32 (< 2^24)
                f32 = vals.astype(np.float32, copy=False)
                k = len(vals)
                cols["scene_id"].append(
                    np.repeat(np.array([row.scene_id], dtype=object), k)
                )
                cols["band"].append(np.full(k, row.band, dtype=np.int32))
                cols["bucket"].append(
                    np.floor(f32 * scale).astype(np.int32)
                )
                cols["value"].append(f32.astype(np.float64))
                cols["n"].append(counts.astype(np.int64))
            if not cols["scene_id"]:
                yield pd.DataFrame(empty)
                continue
            yield pd.DataFrame(
                {k: np.concatenate(v) for k, v in cols.items()}
            )

    per_value = (
        toa_df.mapInPandas(run, _HIST_PARTIAL_SCHEMA)
        .groupBy("scene_id", "band", "bucket", "value")
        .agg(F.sum("n").alias("n"))
    )
    return per_value.groupBy("scene_id", "band", "bucket").agg(
        F.sum("n").alias("n"),
        F.count("*").alias("ndv"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


def mosaic_scene(tiles_like_df: DataFrame) -> DataFrame:
    """Assemble each (scene, band)'s tile grid back into ONE full-scene
    raster row — the engine's form of the reference's single-GeoTIFF
    sink (windows written into one dst, rio_toa/radiance.py:108-111).

    Works on raw tiles (uint16, no dtype column) and on TOA outputs
    (dtype column present). One shuffle, keyed (scene_id, band); each
    group materializes one scene-band buffer — bounded by scene size
    (the same bound the reference's single-file output has), and groups
    parallelize across (scene, band) pairs.
    """
    has_dtype = "dtype" in tiles_like_df.columns
    has_bounds = "bounds_w" in tiles_like_df.columns
    out_schema = T.StructType(
        [
            tiles_like_df.schema["scene_id"],
            tiles_like_df.schema["band"],
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("bounds_w", T.DoubleType()),
            T.StructField("bounds_s", T.DoubleType()),
            T.StructField("bounds_e", T.DoubleType()),
            T.StructField("bounds_n", T.DoubleType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        scene_id, band = key
        dtype = pdf["dtype"].iloc[0] if has_dtype else "uint16"
        np_dtype = np.dtype(dtype)
        pdf = pdf.sort_values(["tile_row", "tile_col"])
        # the grid is anchored at the group's own min indices (a
        # subsetted input need not start at tile 0,0), and a HOLE in
        # the grid is a hard error — np.block on a None cell would
        # otherwise die with an opaque executor TypeError
        r0 = int(pdf["tile_row"].min())
        c0 = int(pdf["tile_col"].min())
        n_rows = int(pdf["tile_row"].max()) - r0 + 1
        n_cols = int(pdf["tile_col"].max()) - c0 + 1
        grid = [[None] * n_cols for _ in range(n_rows)]
        for row in pdf.itertuples(index=False):
            grid[int(row.tile_row) - r0][int(row.tile_col) - c0] = np.frombuffer(
                row.pixels, dtype=np_dtype
            ).reshape(row.height, row.width)
        missing = [
            (r + r0, c + c0)
            for r in range(n_rows)
            for c in range(n_cols)
            if grid[r][c] is None
        ]
        if missing:
            raise ValueError(
                "mosaic_scene: scene %s band %s is missing tiles %s — "
                "cannot assemble a contiguous raster" % (scene_id, band, missing[:8])
            )
        full = np.block(grid)
        return pd.DataFrame(
            {
                "scene_id": [scene_id],
                "band": [band],
                "height": [full.shape[0]],
                "width": [full.shape[1]],
                "dtype": [dtype],
                "bounds_w": [float(pdf["bounds_w"].min()) if has_bounds else None],
                "bounds_s": [float(pdf["bounds_s"].min()) if has_bounds else None],
                "bounds_e": [float(pdf["bounds_e"].max()) if has_bounds else None],
                "bounds_n": [float(pdf["bounds_n"].max()) if has_bounds else None],
                "pixels": [full.tobytes()],
            }
        )

    return tiles_like_df.groupBy("scene_id", "band").applyInPandas(assemble, out_schema)
