"""Streaming joins: stream-static enrichment and stream-stream join with
watermarked state (neither exists in the reference — completing the
Structured Streaming surface)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from flink_start_spark.streaming import run_to_memory, stream_user_activity


def _write_one_batch(tmp_path, name, rows):
    d = tmp_path / name
    d.mkdir()
    p = d / "batch_000.json"
    p.write_text(
        "\n".join(
            json.dumps({"userId": u, "activity": a, "timestamp": ts})
            for u, a, ts in rows
        )
    )
    os.utime(p, (time.time() - 5, time.time() - 5))
    return str(d)


def test_stream_static_enrichment_join(spark, tmp_path):
    # enrich a stream against a static dimension (broadcast per batch)
    src = _write_one_batch(
        tmp_path,
        "ss",
        [
            ("bob", "register", "2025-08-03T13:00:02Z"),
            ("sam", "register", "2025-08-03T13:00:03Z"),
            ("ghost", "register", "2025-08-03T13:00:04Z"),  # not in dim
        ],
    )
    dim = spark.createDataFrame(
        [("bob", "US"), ("sam", "DE")], "user_id string, country string"
    )
    stream = stream_user_activity(spark, src)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    table = run_to_memory(enriched, "ss_sink", "append")
    got = {r["user_id"]: r["country"] for r in table.collect()}
    assert got == {"bob": "US", "sam": "DE", "ghost": None}


def test_stream_stream_join_within_watermark(spark, tmp_path):
    # correlate registers with logins of the same user within 10 s —
    # the canonical watermarked stream-stream inner join with a time bound
    rows = [
        ("bob", "register", "2025-08-03T13:00:02Z"),
        ("bob", "login", "2025-08-03T13:00:05Z"),      # within 10 s -> joins
        ("sam", "register", "2025-08-03T13:00:03Z"),
        ("sam", "login", "2025-08-03T13:00:20Z"),      # outside 10 s -> no join
    ]
    src = _write_one_batch(tmp_path, "s2s", rows)
    stream = stream_user_activity(spark, src)
    regs = (
        stream.filter(F.col("activity") == "register")
        .select("user_id", F.col("ts").alias("reg_ts"))
        .withWatermark("reg_ts", "30 seconds")
    )
    logins = (
        stream.filter(F.col("activity") == "login")
        .select(F.col("user_id").alias("l_user"), F.col("ts").alias("login_ts"))
        .withWatermark("login_ts", "30 seconds")
    )
    joined = regs.join(
        logins,
        (F.col("user_id") == F.col("l_user"))
        & (F.col("login_ts") >= F.col("reg_ts"))
        & (F.col("login_ts") <= F.col("reg_ts") + F.expr("INTERVAL 10 SECONDS")),
    )
    table = run_to_memory(joined, "s2s_sink", "append")
    assert [r["user_id"] for r in table.collect()] == ["bob"]
