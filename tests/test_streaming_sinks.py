"""Exactly-once sink semantics: checkpointed file sink recovery and the
foreachBatch idempotent-write pattern.

The reference declares sinks it never exercises (Cassandra/JDBC,
SURVEY §2); these tests pin the semantics our engine actually ships:
Spark's checkpoint + file-sink transaction log give end-to-end
exactly-once for file targets, and foreachBatch(batch_id) is the
idempotence hook for everything else.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from flink_start_spark.streaming import stream_user_activity


def _write_file(d, i, rows):
    p = d / f"batch_{i:03d}.json"
    p.write_text(
        "\n".join(
            json.dumps({"userId": u, "activity": a, "timestamp": ts})
            for u, a, ts in rows
        )
    )
    os.utime(p, (time.time() - 10 + i, time.time() - 10 + i))


def test_checkpointed_parquet_sink_no_duplicates_on_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_file(src, 0, [("bob", "register", "2025-08-03T13:00:02Z")])

    def run():
        q = (
            stream_user_activity(spark, str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(out).count() == 1

    # restart with one NEW file: the checkpoint must replay only the
    # unseen file — rerunning must not duplicate bob
    _write_file(src, 1, [("sam", "register", "2025-08-03T13:00:03Z")])
    run()
    rows = sorted(r["user_id"] for r in spark.read.parquet(out).collect())
    assert rows == ["bob", "sam"]

    # a third run with nothing new writes nothing
    run()
    assert spark.read.parquet(out).count() == 2


def test_foreachbatch_idempotent_by_batch_id(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    for i, rows in enumerate(
        [
            [("bob", "register", "2025-08-03T13:00:02Z")],
            [("sam", "register", "2025-08-03T13:00:03Z")],
        ]
    ):
        _write_file(src, i, rows)

    def sink(df, batch_id):
        # the foreachBatch exactly-once recipe: partition target by
        # batch_id and overwrite that partition — replays of a batch
        # overwrite, never append twice
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    q = (
        stream_user_activity(spark, str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert sorted(r["user_id"] for r in back.collect()) == ["bob", "sam"]
    # distinct batch ids == micro-batches (maxFilesPerTrigger=1)
    assert back.select("batch_id").distinct().count() == 2
