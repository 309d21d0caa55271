"""SpaceSaving streaming heavy hitters: estimate/bound invariants vs
exact batch counts, cross-batch state accumulation, and the bounded-
capacity eviction guarantee."""

from __future__ import annotations

import json as _json
import os
import time

from pyspark.sql import functions as F

from flink_start_spark.sources.catalog import load_table
from flink_start_spark.streaming import run_to_memory, stream_events
from flink_start_spark.streaming.heavy_hitters import heavy_hitters_stream

from tests.conftest import SF_SMOKE


def _latest(rows):
    out = {}
    for r in rows:
        k = (r["key"], r["item"])
        if k not in out or r["n_seen"] > out[k]["n_seen"]:
            out[k] = r
    return out


def test_invariants_against_exact_counts(spark):
    stream = stream_events(spark, os.path.join(SF_SMOKE, "events.parquet"))
    # item = the event's user id bucketized -> hundreds of distinct
    # items per event_type, far above the 16-counter capacity
    stream = stream.withColumn("uid", F.col("user_id").cast("string"))
    hh = heavy_hitters_stream(stream, "event_type", "uid", capacity=16, k=5)
    got = _latest(run_to_memory(hh, "hh_sink", "update").collect())

    ev = load_table(spark, "events", SF_SMOKE)
    exact = {
        (r["event_type"], str(r["user_id"])): r["c"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    totals = {
        r["event_type"]: r["c"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    assert got, "no heavy-hitter rows emitted"
    for (key, item), r in got.items():
        true = exact.get((key, item), 0)
        # SpaceSaving invariants: never underestimates; certified lower
        # bound est - err <= true; error bounded by n/capacity
        assert r["count_est"] >= true, (key, item)
        assert r["count_est"] - r["err_bound"] <= true, (key, item)
        assert r["err_bound"] <= totals[key] / 16, (key, item)
        assert r["n_seen"] == totals[key]


def test_exact_when_capacity_exceeds_cardinality(spark, tmp_path):
    d = tmp_path / "hhbatches"
    d.mkdir()
    batches = [
        ["a"] * 5 + ["b"] * 2 + ["c"],
        ["a"] * 3 + ["c"] * 4 + ["d"],
    ]
    for i, items in enumerate(batches):
        p = d / f"b{i}.json"
        p.write_text("\n".join(_json.dumps({"k": "x", "it": s}) for s in items))
        os.utime(p, (time.time() - 5 + i, time.time() - 5 + i))
    stream = (
        spark.readStream.schema("k string, it string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    hh = heavy_hitters_stream(stream, "k", "it", capacity=8, k=8)
    rows = run_to_memory(hh, "hh2_sink", "update").collect()
    final = {r["item"]: r for r in rows if r["n_seen"] == 16}
    # capacity 8 > 4 distinct items -> all counts exact, zero error
    assert {i: final[i]["count_est"] for i in final} == {
        "a": 8, "c": 5, "b": 2, "d": 1
    }
    assert all(r["err_bound"] == 0 for r in final.values())
    # ranks follow (count desc, item asc)
    assert [r["item"] for r in sorted(final.values(), key=lambda r: r["rank"])] == [
        "a", "c", "b", "d"
    ]
    # first micro-batch emitted its partial state too
    partial = [r for r in rows if r["n_seen"] == 8]
    assert partial and {r["item"] for r in partial} == {"a", "b", "c"}


def test_eviction_keeps_bounds(spark, tmp_path):
    d = tmp_path / "hhevict"
    d.mkdir()
    items = ["hot"] * 10 + ["w1", "w2", "w3", "w4", "hot", "hot"]
    (d / "b0.json").write_text(
        "\n".join(_json.dumps({"k": "x", "it": s}) for s in items)
    )
    stream = spark.readStream.schema("k string, it string").json(str(d))
    hh = heavy_hitters_stream(stream, "k", "it", capacity=2, k=2)
    rows = run_to_memory(hh, "hh3_sink", "update").collect()
    assert rows
    top = min(rows, key=lambda r: r["rank"])
    # the true heavy hitter (12/16 of the stream) must survive capacity
    # 2 and its certified lower bound must not exceed its true count
    assert top["item"] == "hot"
    assert top["count_est"] >= 12
    assert top["count_est"] - top["err_bound"] <= 12
