"""Shared test fixtures: one SparkSession per test run (JVM startup ~15 s)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_start_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink_start_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def activity(spark):
    from flink_start_spark.sources.json_activity import user_activity_fixture

    df = user_activity_fixture(spark)
    df.cache()
    df.count()
    return df
