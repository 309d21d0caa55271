"""Golden-output tests for the window operator family (FIXTURES.md G1-G4).

Counts re-derived by hand from the reference's 12-event sample and
verified against its ASCII-art expectations
(/root/reference/src/main/scala/datastreams/FlinkWindowLearning.scala:63-72,
:141-157, :185-219, :239-240).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_start_spark.operators import windows as W

BASE = 1754226000  # 2025-08-03T13:00:00Z epoch seconds


def _by_start(df):
    rows = df.collect()
    return {int(r["window_start"].timestamp()): r for r in rows}


def test_g1_tumbling_register_count(activity):
    out = W.tumbling_window_agg(
        activity,
        "3 seconds",
        W.conditional_count(F.col("activity") == "register", "register_cnt"),
    )
    got = {k - BASE: r["register_cnt"] for k, r in _by_start(out).items()}
    # G1: windows [0,3)=1, [3,6)=3, [6,9)=2, [9,12)=0 registers; Spark emits
    # no empty-window rows, and [9,12) holds 3 online events, so it appears
    # with count 0.
    assert got == {0: 1, 3: 3, 6: 2, 9: 0}


def test_g2_keyed_tumbling(activity):
    out = W.tumbling_window_agg(
        activity, "3 seconds", F.count("*").alias("cnt"), keys=["activity"]
    )
    got = {
        (r["activity"], int(r["window_start"].timestamp()) - BASE): r["cnt"]
        for r in out.collect()
    }
    assert got == {
        ("register", 0): 1,
        ("register", 3): 3,
        ("register", 6): 2,
        ("online", 0): 1,
        ("online", 3): 1,
        ("online", 6): 1,
        ("online", 9): 3,
    }


def test_g3_sliding_register_count(activity):
    out = W.sliding_window_agg(
        activity,
        "3 seconds",
        "1 second",
        W.conditional_count(F.col("activity") == "register", "register_cnt"),
    )
    got = {k - BASE: r["register_cnt"] for k, r in _by_start(out).items()}
    # G3: starts 13:00:00..13:00:09 → 1,2,4,3,3,1,2,1,1,0 plus the :10
    # window (3 online events, 0 registers) the reference diagram stops
    # short of. Empty windows (all-online ones still non-empty) appear
    # whenever any event falls in them.
    assert got == {
        0: 1, 1: 2, 2: 4, 3: 3, 4: 3, 5: 1, 6: 2, 7: 1, 8: 1, 9: 0, 10: 0,
    }


def test_session_windows_per_user(activity):
    out = W.session_window_agg(
        activity, "3 seconds", F.count("*").alias("n"), keys=["user_id"]
    )
    got = {
        (r["user_id"], int(r["window_start"].timestamp()) - BASE): (
            int(r["window_end"].timestamp()) - BASE,
            r["n"],
        )
        for r in out.collect()
    }
    # gap=3s: a session breaks when the next event is MORE than 3s later
    # (boundary-touching windows merge); end = last event + gap.
    # rob/alice (:04, :10 — gap 6) split; carl (:08, :10 — gap 2)
    # merges into one [8, 13) session.
    assert got == {
        ("bob", 2): (5, 2),
        ("sam", 3): (7, 2),
        ("rob", 4): (7, 1),
        ("rob", 10): (13, 1),
        ("alice", 4): (7, 1),
        ("alice", 10): (13, 1),
        ("mary", 6): (9, 2),
        ("carl", 8): (13, 2),
    }


def test_g4_count_trigger_cumulative(activity):
    out = W.count_trigger_cumulative(
        activity, F.col("activity") == "register", every=5, order_col="arrival"
    )
    rows = sorted(out.collect(), key=lambda r: r["fire_seq"])
    # Flink FIRE-no-PURGE: fire@5 → 3 registers, fire@10 → 6 cumulative,
    # no fire for arrivals 11-12.
    assert [(r["fire_seq"], r["arrival"], r["cnt"]) for r in rows] == [
        (1, 5, 3),
        (2, 10, 6),
    ]


def test_g4_count_trigger_buckets(activity):
    out = W.count_trigger_buckets(
        activity, F.col("activity") == "register", every=5, order_col="arrival"
    )
    rows = sorted(out.collect(), key=lambda r: r["fire_seq"])
    # Per-bucket: arrivals 1-5 → 3, arrivals 6-10 → 3; tail (11-12) no fire.
    assert [(r["fire_seq"], r["cnt"]) for r in rows] == [(1, 3), (2, 3)]


def test_event_time_extraction(spark):
    # O4: ISO-8601 string → timestamp (reference package.scala:11).
    df = spark.createDataFrame(
        [("2025-08-03T13:00:02Z",)], "timestamp_raw string"
    )
    out = W.with_event_time(df, ts_col="ts", source_col="timestamp_raw")
    assert int(out.collect()[0]["ts"].timestamp()) == BASE + 2


def test_windowed_agg_rejects_key_colliding_alias(spark):
    import pytest as _pt
    from flink_start_spark.operators import windows as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2025-08-03T13:00:00Z", "u1")], "ts string, user_id string"
    ).withColumn("ts", F.try_to_timestamp("ts"))
    with _pt.raises(ValueError, match="collide"):
        W.tumbling_window_agg(
            df, "1 minute", F.count(F.lit(1)).alias("user_id"),
            keys=["user_id"],
        )
