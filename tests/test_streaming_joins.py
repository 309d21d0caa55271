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


def test_stream_asof_join_static_dimension(spark, tmp_path):
    # AS-OF enrichment: each event picks the dimension version in
    # effect at ITS event time (not the latest overall) — recast as a
    # point-in-time interval join so no streaming aggregation is needed;
    # watermark applied on the stream side composes with a downstream
    # windowed count.
    from flink_start_spark.streaming.pipelines import asof_enrich_stream

    src = _write_one_batch(
        tmp_path,
        "asof",
        [
            ("bob", "login", "2025-08-03T12:59:00Z"),  # before any version
            ("bob", "login", "2025-08-03T13:00:30Z"),  # v1 in effect
            ("bob", "login", "2025-08-03T13:02:30Z"),  # v2 in effect
            ("sam", "login", "2025-08-03T13:05:00Z"),  # sam's only version
        ],
    )
    dim = spark.createDataFrame(
        [
            ("bob", "bronze", "2025-08-03 13:00:00"),
            ("bob", "gold", "2025-08-03 13:02:00"),
            ("sam", "silver", "2025-08-03 13:00:00"),
        ],
        "user_id string, tier string, eff_ts string",
    ).withColumn("eff_ts", F.col("eff_ts").cast("timestamp"))
    stream = stream_user_activity(spark, src)
    enriched = asof_enrich_stream(
        stream, dim, "user_id", ts_col="ts", watermark="30 seconds"
    )
    table = run_to_memory(enriched, "asof_sink", "append")
    got = sorted((r["user_id"], str(r["ts"]), r["tier"]) for r in table.collect())
    assert got == [
        ("bob", "2025-08-03 12:59:00", None),
        ("bob", "2025-08-03 13:00:30", "bronze"),
        ("bob", "2025-08-03 13:02:30", "gold"),
        ("sam", "2025-08-03 13:05:00", "silver"),
    ]
    # watermark survives the join: a downstream windowed count runs in
    # append mode without re-declaring it
    counted = (
        asof_enrich_stream(
            stream_user_activity(spark, src),
            dim,
            "user_id",
            ts_col="ts",
            watermark="30 seconds",
        )
        .groupBy(F.window("ts", "1 minute"), F.col("tier"))
        .count()
    )
    t2 = run_to_memory(counted, "asof_counts", "append")
    assert t2.schema.simpleString().startswith("struct<window:")


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
