from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datasplash_spark.pipeline import PipelineOptions, make_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = make_session(
        PipelineOptions(
            app_name="datasplash-spark-tests",
            # small local shuffle for tiny test data
            shuffle_partitions=8,
            extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
        )
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from datasplash_spark.pipeline import load_tables

    return load_tables(spark, SF_DIR)
