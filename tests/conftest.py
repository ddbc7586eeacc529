import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rio_toa_spark.session import get_spark  # noqa: E402
from rio_toa_spark.sources.fixtures import ensure_fixtures  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".fixture_cache")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="rio_toa_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_paths():
    return ensure_fixtures(FIXTURE_DIR, n_scenes=4, grid=2, tile_size=128, n_pages=1200)


@pytest.fixture(scope="session")
def tiles_df(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["tiles"])


@pytest.fixture(scope="session")
def scenes_df(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["scenes"])


@pytest.fixture(scope="session")
def pages_df(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["pages"])
