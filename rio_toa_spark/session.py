"""SparkSession factory with scale-oriented defaults.

The settings below are the ones that matter at 100 TB just as much as
on local[32]:

* AQE on (runtime coalescing + skew-join splitting backstops the
  explicit salting done by the spatial layer).
* Arrow execution for every pandas-UDF / mapInPandas boundary, with a
  bounded batch size so a pixel-heavy batch (binary tile payloads)
  cannot blow executor memory — this replaces the reference's
  riomucho window streaming (rio_toa/radiance.py:122-128).
* shuffle partition count sized by the caller (cores on local mode,
  2-3x total cores on a cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Tile rows carry ~0.5 MiB binary payloads; 256 rows/batch keeps an
# Arrow batch near 128 MiB worst-case, far under executor headroom.
ARROW_MAX_RECORDS_PER_BATCH = 256


def get_spark(
    app_name: str = "rio_toa_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # Tile/page parquet files are written small at test SF; on a
        # real cluster this bound splits 100 TB into ~128 MiB tasks.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
