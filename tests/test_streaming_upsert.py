"""Streaming keyed upsert (MERGE) sink: latest-per-key store equals the
batch answer, later batches overwrite earlier state, and batch replay
is idempotent (streaming/upsert.py)."""

from __future__ import annotations

import json
import os
import time

from flink_start_spark.streaming import stream_user_activity
from flink_start_spark.streaming.upsert import latest_per_key, upsert_parquet_sink


def _write_file(d, i, rows):
    p = d / f"batch_{i:03d}.json"
    p.write_text(
        "\n".join(
            json.dumps({"userId": u, "activity": a, "timestamp": ts})
            for u, a, ts in rows
        )
    )
    os.utime(p, (time.time() - 10 + i, time.time() - 10 + i))


def _run(spark, src, out, ckpt):
    q = upsert_parquet_sink(
        stream_user_activity(spark, str(src)),
        out,
        ckpt,
        key_cols=["user_id"],
        order_cols=["ts"],
    )
    q.awaitTermination()


def test_upsert_keeps_latest_row_per_key(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_file(src, 0, [
        ("bob", "register", "2025-08-03T13:00:02Z"),
        ("sam", "register", "2025-08-03T13:00:03Z"),
    ])
    # batch 2 updates bob (later ts) and inserts kim
    _write_file(src, 1, [
        ("bob", "purchase", "2025-08-03T13:00:09Z"),
        ("kim", "register", "2025-08-03T13:00:04Z"),
    ])
    _run(spark, src, out, ckpt)
    got = {
        r["user_id"]: r["activity"] for r in spark.read.parquet(out).collect()
    }
    assert got == {"bob": "purchase", "sam": "register", "kim": "register"}


def test_upsert_restart_applies_only_new_batches(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    out = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ckpt2")
    _write_file(src, 0, [("bob", "register", "2025-08-03T13:00:02Z")])
    _run(spark, src, out, ckpt)
    # restart with one new file: checkpoint replays nothing, applies one
    _write_file(src, 1, [("bob", "login", "2025-08-03T13:00:07Z")])
    _run(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["activity"] == "login"
    # idle restart: store unchanged
    _run(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 1


def test_merge_is_idempotent_under_batch_replay(spark, tmp_path):
    """Re-applying the same micro-batch must not change the store —
    the property that turns foreachBatch's at-least-once into
    exactly-once convergence."""
    rows = [
        ("bob", "register", "2025-08-03T13:00:02Z"),
        ("bob", "purchase", "2025-08-03T13:00:05Z"),
        ("sam", "register", "2025-08-03T13:00:03Z"),
    ]
    df = spark.createDataFrame(rows, "user_id string, activity string, ts string")
    once = latest_per_key(df, ["user_id"], ["ts"])
    twice = latest_per_key(once.unionByName(df), ["user_id"], ["ts"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_crashed_swap_recovers_from_old_dir(spark, tmp_path):
    """A crash between the two swap renames leaves the store only at
    ._upsert_old; the next merge must restore it, not restart empty."""
    import os as _os

    src = tmp_path / "src3"
    src.mkdir()
    out = str(tmp_path / "store3")
    _write_file(src, 0, [("bob", "register", "2025-08-03T13:00:02Z")])
    _run(spark, src, out, str(tmp_path / "ckpt3a"))
    # simulate the crash window: path renamed away, tmp never promoted
    _os.rename(out, out + "._upsert_old")
    _write_file(src, 1, [("kim", "register", "2025-08-03T13:00:04Z")])
    _run(spark, src, out, str(tmp_path / "ckpt3b"))  # fresh ckpt replays all
    got = {r["user_id"] for r in spark.read.parquet(out).collect()}
    assert got == {"bob", "kim"}


def test_out_of_order_batch_does_not_regress_state(spark, tmp_path):
    """A replayed/late batch with OLDER timestamps must lose the merge:
    state is ordered by event time, not arrival."""
    new = spark.createDataFrame(
        [("bob", "purchase", "2025-08-03T13:00:09Z")],
        "user_id string, activity string, ts string",
    )
    old = spark.createDataFrame(
        [("bob", "register", "2025-08-03T13:00:02Z")],
        "user_id string, activity string, ts string",
    )
    merged = latest_per_key(new.unionByName(old), ["user_id"], ["ts"])
    assert merged.collect()[0]["activity"] == "purchase"
