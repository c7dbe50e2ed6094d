from __future__ import annotations

import pytest

from beeper_matric_etl_tool_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = get_spark(
        app_name="beeper-matric-etl-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias for property tests (hypothesis + function-scoped fixtures
    don't mix; the session-scoped SparkSession is safe to share)."""
    return spark
