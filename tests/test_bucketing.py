"""Bucketed storage co-location: a big-big equi-join between two
tables bucketed on the join key runs WITHOUT a shuffle on either side
(the storage-level partitioning strategy for repeated large joins at
100 TB, complementing broadcast for dims and salting for skew)."""

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, pages_df):
    """Two page-derived tables bucketed+sorted on cell (16 buckets)."""
    from rio_toa_spark.operators.spatial_join import with_cell

    left = with_cell(pages_df, level=6).select("url", "cell", "lang")
    right = (
        with_cell(pages_df, level=6)
        .groupBy("cell")
        .agg(F.count("*").alias("n_in_cell"))
    )
    names = ("t_left_%s" % uuid.uuid4().hex[:8], "t_right_%s" % uuid.uuid4().hex[:8])
    (
        left.write.bucketBy(16, "cell").sortBy("cell")
        .mode("overwrite").format("parquet").saveAsTable(names[0])
    )
    (
        right.write.bucketBy(16, "cell").sortBy("cell")
        .mode("overwrite").format("parquet").saveAsTable(names[1])
    )
    yield names
    for n in names:
        spark.sql("DROP TABLE IF EXISTS %s" % n)


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    lname, rname = bucketed_pair
    left = spark.table(lname)
    right = spark.table(rname)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "cell")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located scan-to-scan join: no Exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        n = joined.count()
        # every page row survives (inner join on its own cell stats)
        assert n == left.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
