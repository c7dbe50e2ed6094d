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
        # local[8] (r14): the operators overlap independent jobs from
        # driver thread pools (trainer chains, index lifecycles, modality
        # legs) — 4 cores re-serialized them in every test; 8 measured
        # ~10 % off representative files on the 32-core CI box with no
        # test depending on the core count (the one defaultParallelism
        # assert is dynamic)
        master="local[8]",
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
