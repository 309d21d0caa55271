"""Shared test fixtures: one SparkSession per test run (JVM startup ~15 s)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_start_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight redundancy test (each duplicates coverage the "
        "driver's own oracle run or a sibling test already provides); "
        "skipped unless FLINK_SPARK_FULL_TESTS=1 so the driver's "
        "verify-budget run finishes (round-10 verdict item 2 — the full "
        "suite exceeded the driver window; the round-end battery sets "
        "the env var and runs everything)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("FLINK_SPARK_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow lane — set FLINK_SPARK_FULL_TESTS=1 to include"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
