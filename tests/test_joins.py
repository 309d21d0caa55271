"""Edge-case tests for the composed time-series joins (operators/joins.py)."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from flink_start_spark.operators.joins import as_of_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-10 00:00:00")),
            (2, "u1", _ts("2024-01-20 00:00:00")),
            (3, "u2", _ts("2024-01-05 00:00:00")),
        ],
        "event_id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-08 00:00:00"), 100.0),
            ("u1", _ts("2024-01-15 00:00:00"), 200.0),
            ("u2", _ts("2024-01-07 00:00:00"), 300.0),  # after u2's event
        ],
        "key string, rts timestamp, payload double",
    )
    out = {
        r["event_id"]: (r["payload"], r["matched_ts"])
        for r in as_of_join(left, right, "key", "ts", "rts", ["payload"]).collect()
    }
    assert out[1] == (100.0, _ts("2024-01-08 00:00:00"))  # latest <= Jan 10
    assert out[2] == (200.0, _ts("2024-01-15 00:00:00"))  # advanced to Jan 15
    assert out[3] == (None, None)  # no prior right row -> NULL payload


def test_asof_match_at_equal_timestamp(spark):
    # "at or before": a right row exactly at the left ts must match
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-10 12:00:00"))], "event_id long, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-10 12:00:00"), 7.0)],
        "key string, rts timestamp, payload double",
    )
    row = as_of_join(left, right, "key", "ts", "rts", ["payload"]).collect()[0]
    assert row["payload"] == 7.0


def test_asof_single_shuffle_plan(spark):
    # the 100TB property: one hash-partitioning exchange by key, no
    # range/nested-loop join anywhere
    left = spark.range(10).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("key"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
    )
    right = spark.range(5).select(
        (F.col("id") % 3).cast("string").alias("key"),
        F.timestamp_seconds(F.col("id") * 150).alias("rts"),
        F.col("id").cast("double").alias("payload"),
    )
    df = as_of_join(left, right, "key", "ts", "rts", ["payload"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides share the key exchange


def test_range_join_residual_filter(spark):
    points = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 00:30:00")),  # inside
            ("k", _ts("2024-01-01 02:30:00")),  # outside (after end)
            ("k", _ts("2023-12-31 23:59:00")),  # outside (before start)
        ],
        "key string, ts timestamp",
    )
    ranges = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00"))],
        "key string, start timestamp, end timestamp",
    )
    out = range_join(points, ranges, "key", "ts", "start", "end", bucket="1 hour")
    assert [str(r["ts"]) for r in out.collect()] == ["2024-01-01 00:30:00"]


def test_range_join_boundary_semantics(spark):
    # [start, end): start inclusive, end exclusive
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00")), ("k", _ts("2024-01-01 02:00:00"))],
        "key string, ts timestamp",
    )
    ranges = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00"))],
        "key string, start timestamp, end timestamp",
    )
    out = range_join(points, ranges, "key", "ts", "start", "end", bucket="1 hour")
    assert [str(r["ts"]) for r in out.collect()] == ["2024-01-01 00:00:00"]


def test_asof_join_rejects_clashing_payload_column(spark):
    """Regression: a payload column sharing a left column's name
    produced duplicate output columns (unusable downstream)."""
    import pytest

    left = spark.createDataFrame([(1, 10, 5.0)], "k long, t long, value double")
    right = spark.createDataFrame([(1, 9, 7.0)], "k long, rt long, value double")
    with pytest.raises(ValueError, match="payload columns .* also exist"):
        as_of_join(left, right, "k", "t", "rt", ["value"])


def test_range_join_fractional_second_range_end(spark):
    """A range_end with a sub-second fraction whose integral second is
    a bucket multiple must still match points in the final partial
    bucket (the cast-to-long truncation trap); reference = the plain
    inequality join."""
    from flink_start_spark.operators.joins import range_join

    base = 1704452400  # a whole multiple of 3600
    pts = spark.createDataFrame(
        [(1, float(base) + 0.0002), (1, float(base) - 5.0), (1, float(base) + 1.0)],
        "k long, t double",
    ).select("k", F.timestamp_seconds("t").alias("t"))
    rgs = spark.createDataFrame(
        [(1, float(base) - 3600.0, float(base) + 0.0004)], "k long, s double, e double"
    ).select(
        "k",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    got = sorted(
        r["t"] for r in range_join(pts, rgs, "k", "t", "s", "e", "1 hour").collect()
    )
    want = sorted(
        r["t"]
        for r in pts.join(rgs, "k")
        .filter((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
        .collect()
    )
    assert got == want and len(want) == 2  # base+0.0002 AND base-5


def test_asof_null_key_matches_nothing(spark):
    """SQL join semantics for NULL keys: a NULL-key left row carries
    NULL payloads even when a NULL-key right row exists, and NULL-key
    right rows match no one (Window.partitionBy would otherwise group
    all NULLs into one partition and 'match' them to each other —
    the adversarial-corpus NULL-user_id events caught exactly this)."""
    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-10 00:00:00")),
            (2, "u1", _ts("2024-01-10 00:00:00")),
        ],
        "event_id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01 00:00:00"), 666.0),  # NULL-key right row
            ("u1", _ts("2024-01-01 00:00:00"), 100.0),
        ],
        "key string, rts timestamp, payload double",
    )
    for direction in ("backward", "forward", "nearest"):
        out = {
            r["event_id"]: (r["payload"], r["matched_ts"])
            for r in as_of_join(
                left, right, "key", "ts", "rts", ["payload"],
                direction=direction,
            ).collect()
        }
        assert out[1] == (None, None), direction  # NULL key -> no match
        if direction == "backward":
            assert out[2] == (100.0, _ts("2024-01-01 00:00:00"))


def test_epoch_cast_floors_pre_epoch_fractional(spark):
    """The repo-wide epoch convention is FLOOR (matching the oracles'
    floor(epoch(..))). cast('long') floorDivs the underlying micros;
    unix_timestamp truncates toward zero and reads 1969-12-31
    23:59:59.5 as 0 instead of -1 — every epoch-emitting query must
    therefore use the cast, never unix_timestamp."""
    row = (
        spark.sql(
            "SELECT cast(timestamp'1969-12-31 23:59:59.5' AS long) AS c, "
            "unix_timestamp(timestamp'1969-12-31 23:59:59.5') AS u"
        )
        .collect()[0]
    )
    assert row["c"] == -1  # floor — what the DuckDB oracle computes
    assert row["u"] == 0  # trunc-toward-zero — the divergence we ban
    import subprocess

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    banned = subprocess.run(
        ["grep", "-rn", "unix_timestamp(", "flink_start_spark/"],
        capture_output=True, text=True, cwd=repo_root,
    ).stdout
    assert banned.strip() == "", f"unix_timestamp re-entered plans:\n{banned}"
