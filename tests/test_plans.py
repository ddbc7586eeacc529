"""Physical-plan shape assertions — the scale contract:

* predicate pushdown reaches the parquet scan (PushedFilters),
* column pruning keeps unused payloads out of ReadSchema,
* dimension joins broadcast (no shuffle on the fact side),
* TOA pipelines contain no hash-partition exchange at all,
* relational queries run inside WholeStageCodegen.

These are regression guards: a future edit that silently breaks one of
them (e.g. a join that stops broadcasting) fails here, not at 100 TB.
"""

from pyspark.sql import functions as F

from rio_toa_spark.operators import spatial_join as sj
from rio_toa_spark.operators import toa


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_band_filter_pushed_to_scan(spark, tiles_df, scenes_df):
    plan = _plan(toa.radiance_tiles(tiles_df, scenes_df, band=5))
    assert "PushedFilters" in plan
    # the band predicate must reach the parquet reader
    assert "EqualTo(band,5)" in plan.replace(" ", "")


def test_column_pruning_pages(spark, pages_df, scenes_df):
    """Selecting join keys only must drop html/text from the scan."""
    out = sj.pip_join(pages_df, sj.scene_footprints(scenes_df), level=7).select(
        "url", "scene_id"
    )
    plan = _plan(out)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l and "pages" in l]
    assert scan_lines, plan
    assert "html" not in scan_lines[0]
    assert "text" not in scan_lines[0]


def test_toa_pipeline_shuffle_free(spark, tiles_df, scenes_df):
    for df in (
        toa.radiance_tiles(tiles_df, scenes_df, band=5),
        toa.reflectance_tiles(tiles_df, scenes_df, bands=[4], per_pixel_sun=True),
        toa.brightness_temp_tiles(tiles_df, scenes_df, band=10),
    ):
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan


def test_pip_broadcast_no_page_shuffle(spark, pages_df, scenes_df):
    plan = _plan(sj.pip_join(pages_df, sj.scene_footprints(scenes_df), level=7))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_pip_salted_shuffles_on_salted_key(spark, pages_df, scenes_df):
    """With broadcast disabled (the regime salting exists for), the
    shuffle key must include the salt so the hot cell spreads."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            sj.pip_join(pages_df, sj.scene_footprints(scenes_df), level=7, strategy="salted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "hashpartitioning" in plan
    assert "_salt" in plan.split("hashpartitioning", 1)[1][:200]


def test_pip_salted_broadcasts_when_dim_is_small(spark, pages_df, scenes_df):
    """At dimension-sized footprints AQE/planner picks broadcast even
    for the salted variant — no page-side shuffle."""
    plan = _plan(
        sj.pip_join(pages_df, sj.scene_footprints(scenes_df), level=7, strategy="salted")
    )
    assert "BroadcastHashJoin" in plan


def test_relational_query_codegen(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    agg.collect()  # finalize AQE
    plan = _plan(agg)
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in plan
    # and aggregation must be partial map-side before the shuffle
    assert "partial_sum" in plan


def test_rgb_stack_single_shuffle(spark, tiles_df, scenes_df):
    """Multiband stack: the groupBy that assembles band planes is the
    ONLY hash-partition exchange in the whole reflectance+stack plan."""
    stacked = toa.stack_bands(
        toa.reflectance_tiles(tiles_df, scenes_df, bands=[4, 3, 2]), bands=[4, 3, 2]
    )
    plan = _plan(stacked)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_lsh_candidates_single_pass_uncached(spark):
    """The LSH candidate step must not cache (no InMemoryRelation) and
    must not self-join the signature pipeline: one groupBy shuffle for
    bucketing + one for the final distinct."""
    from rio_toa_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = dedup.minhash_signatures(docs, num_hashes=8)
    pairs = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    plan = _plan(pairs)
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    # only ONE signature computation feeds the plan: a self-join would
    # show two parquet scans of documents
    assert plan.count("Scan parquet") == 1, plan


def test_token_hash_projection_not_inlined(spark):
    """shingle_hash_sets materializes the per-token md5 array in its
    own projection; if CollapseProject ever inlines it, the shingle
    combine's higher-order lambdas would re-evaluate the md5 transform
    per outer element (measured 11x slower). Guard: exactly one md5 in
    the optimized plan."""
    from rio_toa_spark.operators.dedup import shingle_hash_sets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = shingle_hash_sets(docs)
    plan = sh._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1, plan


def test_zonal_partials_single_shuffle(spark, tiles_df, scenes_df):
    """Zonal stats: zones broadcast, pixel kernel map-side; the only
    hash exchange carries the per-pair partial doubles."""
    from rio_toa_spark.operators.zonal import zonal_stats

    zones = sj.scene_footprints(scenes_df).select(
        F.col("scene_id").alias("zone_id"), "fw", "fs", "fe", "fn"
    )
    plan = _plan(zonal_stats(tiles_df, zones))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cell_expr_is_native(spark, pages_df):
    """The Morton cell id must be pure Catalyst expressions (no
    BatchEvalPython / ArrowEvalPython nodes)."""
    plan = _plan(sj.with_cell(pages_df, level=7).select("cell"))
    assert "EvalPython" not in plan


def test_fixture_row_groups_splittable(fixture_paths):
    """Fixture parquet must carry multiple row groups so big scans
    split into parallel tasks (a single row group collapses the whole
    TOA pipeline into one task — seen and fixed in round 1)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(fixture_paths["tiles"])
    assert md.num_row_groups >= 2


def test_value_histogram_partials_before_shuffle(spark, tiles_df, scenes_df):
    # the per-value partial aggregate must run map-side (partial
    # HashAggregate before the exchange) so the shuffle width is
    # bounded by the value domain, not the pixel count
    from rio_toa_spark.operators import toa

    hist = toa.value_histogram(
        toa.radiance_tiles(tiles_df, scenes_df, band=5, clip=False)
    )
    plan = hist._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.index("Exchange hashpartitioning")
    assert "HashAggregate" in plan[first_exchange:]  # final agg after shuffle
    assert "HashAggregate" in plan[:first_exchange]  # partial agg before it


def test_media_pipelines_shuffle_free(spark):
    """The multimodal chains (decode -> resize -> features; decode ->
    audio features; container -> frame sampling) are pure row-local
    mapInPandas stages: their physical plans must contain NO exchange
    of any kind — the property that lets the media path scale linearly
    with input splits at 100 TB (binary payloads never shuffle)."""
    from rio_toa_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, b"\x00payload")], "media_id long, payload binary")
    img_chain = mm.image_features(mm.resize_image(mm.decode_image(df)))
    audio_chain = mm.audio_features(mm.decode_audio(df))
    frames_chain = mm.sample_video_frames(df, n_frames=2)
    for chain in (img_chain, audio_chain, frames_chain):
        plan = _plan(chain)
        assert "Exchange" not in plan, plan
