"""Kafka surface, exercised end-to-end IN-PROCESS (no broker exists in
this container, exactly as none exists in the reference's CI — its
build.sbt:20 declares flink-connector-kafka that no code path calls).

What a live broker would add is transport; everything else — the
writer's (key, value, topic) frame contract, the JSON value encode, the
consumer-side decode with broker metadata, and the offset-as-arrival-
index semantics the count-trigger operator consumes — is engine-side
and is pinned here:

1. encode → decode round-trip over a real micro-batched stream,
2. the writer frame schema contract (what Kafka's sink validates at
   runtime, surfaced at plan build),
3. offset ordering feeding streaming/count_trigger.py: Kafka's
   per-partition offset IS the arrival index, so the trigger's
   order_col is a pure projection on a real topic (no global rank
   needed — the same contract the batch operator documents).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_start_spark.sources.connectors import (
    encode_kafka_frame,
    parse_kafka_json,
    validate_kafka_frame,
)
from flink_start_spark.streaming import run_to_memory, stream_user_activity

from tests.test_streaming_joins import _write_one_batch

ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("activity", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_stream_encode_decode_roundtrip(spark, tmp_path):
    """Micro-batched stream → Kafka wire frame → consumer decode: every
    typed row survives the value encode/decode byte-exactly, and the
    key column carries the partitioner input."""
    rows = [
        ("bob", "register", "2025-08-03T13:00:02Z"),
        ("sam", "login", "2025-08-03T13:00:03Z"),
        ("eve", "logout", "2025-08-03T13:00:04Z"),
    ]
    src = _write_one_batch(tmp_path, "kafka_rt", rows)
    stream = stream_user_activity(spark, src).select("user_id", "activity", "ts")
    frame = encode_kafka_frame(stream, key_col="user_id", topic="activity")
    wire = run_to_memory(frame, "kafka_wire", "append")

    # what the broker hands back: the same key/value bytes plus
    # (topic, partition, offset, timestamp) metadata; offset is the
    # per-partition arrival index
    w = (
        wire.withColumn("partition", F.lit(0))
        .withColumn(
            "offset",
            F.row_number().over(Window.orderBy("value")).cast("long") - 1,
        )
        .withColumn("timestamp", F.current_timestamp())
    )
    decoded = parse_kafka_json(w, ACTIVITY_SCHEMA)
    got = {r["user_id"]: (r["activity"], str(r["ts"])) for r in decoded.collect()}
    assert got == {
        "bob": ("register", "2025-08-03 13:00:02"),
        "sam": ("login", "2025-08-03 13:00:03"),
        "eve": ("logout", "2025-08-03 13:00:04"),
    }
    # decode preserves broker metadata for downstream operators
    assert {"topic", "partition", "offset", "kafka_ts"} <= set(decoded.columns)
    # keys are the raw partitioner bytes
    keys = sorted(bytes(r["key"]).decode() for r in wire.collect())
    assert keys == ["bob", "eve", "sam"]


def test_writer_frame_contract(spark):
    """The Kafka sink's runtime schema validation, at plan build: value
    required, field names closed, types constrained."""
    df = spark.createDataFrame([("a", "b")], "user_id string, activity string")
    ok = encode_kafka_frame(df, key_col="user_id", topic="t")
    assert [f.name for f in ok.schema.fields] == ["key", "value", "topic"]
    assert ok.schema["key"].dataType.typeName() == "binary"
    assert ok.schema["value"].dataType.typeName() == "binary"

    with pytest.raises(ValueError, match="requires a 'value'"):
        validate_kafka_frame(df.select(F.col("user_id").alias("key")))
    with pytest.raises(ValueError, match="not a Kafka frame field"):
        validate_kafka_frame(
            df.select(F.lit("x").alias("value"), F.col("user_id"))
        )
    with pytest.raises(ValueError, match="must be one of"):
        validate_kafka_frame(df.select(F.lit(1).alias("value")))


def test_offset_is_count_trigger_arrival_index(spark):
    """The production contract the count-trigger documents: with a Kafka
    source, ``offset`` is a dense per-partition arrival index, so the
    trigger's bucket id is a pure projection (offset // n) and fires
    reproduce the batch operator exactly."""
    from flink_start_spark.operators.windows import count_trigger_buckets

    # a decoded kafka relation: offsets 0..19, every 4th record a signup
    rows = [(i, "signup" if i % 4 == 0 else "view") for i in range(20)]
    decoded = spark.createDataFrame(rows, "offset long, activity string")
    # offset-as-arrival: order_col IS the offset
    got = {
        r["fire_seq"]: r["cnt"]
        for r in count_trigger_buckets(
            decoded, F.col("activity") == "signup", every=5, order_col="offset"
        ).collect()
    }
    # arrival buckets [0..4],[5..9],[10..14],[15..19] each contain
    # signups at offsets {0,4},{8},{12,16},{} -> wait: 0,4,8,12,16
    expect = {}
    for b in range(4):
        expect[b + 1] = sum(
            1 for i in range(b * 5, b * 5 + 5) if i % 4 == 0
        )
    assert got == expect
    # and the payload JSON itself round-trips through the value codec
    val = json.loads(
        spark.createDataFrame([("u1", "signup")], "user_id string, activity string")
        .select(F.to_json(F.struct("user_id", "activity")).alias("j"))
        .collect()[0]["j"]
    )
    assert val == {"user_id": "u1", "activity": "signup"}
