"""Connector configuration tests (no broker/DB in the container — the
reference likewise declares connectors it never exercises, SURVEY §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_start_spark.schemas import USER_ACTIVITY_RAW
from flink_start_spark.sources import connectors as C


def test_kafka_reader_configured(spark):
    reader = C.kafka_stream_reader(spark, "localhost:9092", "user-activity")
    # configured, not connected: .load() would need a broker
    assert reader is not None


def test_parse_kafka_json_shape(spark):
    # simulate the kafka frame schema with a static frame
    raw = spark.createDataFrame(
        [
            (
                "user-activity",
                0,
                7,
                None,
                '{"userId": "bob", "activity": "register", "timestamp": "2025-08-03T13:00:02Z"}',
            )
        ],
        "topic string, partition int, offset long, timestamp timestamp, value string",
    ).withColumn("value", F.col("value").cast("binary"))
    out = C.parse_kafka_json(raw, USER_ACTIVITY_RAW, ts_col="timestamp")
    row = out.collect()[0]
    assert row["offset"] == 7  # the count-trigger arrival index at the kafka edge
    assert row["userId"] == "bob"
    assert row["timestamp"].year == 2025


def test_jdbc_reader_requires_bounds_for_parallelism(spark):
    r = C.jdbc_reader(
        spark,
        "jdbc:postgresql://localhost:5432/docker",
        "events",
        partition_column="event_id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert r is not None


def test_cassandra_writer_raises_without_connector(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ImportError, match="spark-cassandra-connector"):
        C.cassandra_writer(df, "ks", "tbl")
