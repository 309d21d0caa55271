"""RocksDB state store parity: the PRODUCTION streaming state backend
(state lives off-heap/on-disk, so stateful operators survive state
sizes far beyond executor heap — the 100 TB streaming lever) must
produce results identical to the default HDFS-backed store on the same
input, for both a built-in keyed windowed aggregation and an
applyInPandasWithState operator (custom python state)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_start_spark.streaming import run_to_memory, stream_events
from flink_start_spark.streaming.quantiles import quantile_stream

from tests.conftest import SF_SMOKE

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_conf(spark):
    try:
        old = spark.conf.get(_KEY)
    except Exception:
        old = None
    yield  # each test sets/unsets around individual runs
    if old is None:
        spark.conf.unset(_KEY)
    else:
        spark.conf.set(_KEY, old)


def _events(spark):
    import os

    return stream_events(spark, os.path.join(SF_SMOKE, "events.parquet"))


def _run_windows(spark, sink):
    from flink_start_spark.streaming.pipelines import (
        keyed_tumbling_counts_stream,
    )

    out = keyed_tumbling_counts_stream(
        _events(spark), size="1 hour", watermark="1 hour",
        key_col="event_type",
    )
    t = run_to_memory(out, sink, "update")
    final = {}
    for r in t.collect():
        k = (r["window_start"], r["event_type"])
        final[k] = max(final.get(k, 0), r["cnt"])
    return final


def test_keyed_windows_identical_under_rocksdb(spark, rocksdb_conf):
    spark.conf.unset(_KEY) if _has(spark) else None
    default = _run_windows(spark, "ss_default")
    spark.conf.set(_KEY, _ROCKS)
    rocks = _run_windows(spark, "ss_rocks")
    assert rocks == default and len(default) > 5


def test_apply_in_pandas_with_state_identical_under_rocksdb(
    spark, rocksdb_conf
):
    def run(sink):
        q = quantile_stream(
            _events(spark), "event_type", "value",
            probs=(0.5, 0.9), lo=0.0, hi=1100.0,
        )
        t = run_to_memory(q, sink, "update")
        latest = {}
        for r in t.collect():
            k = (r["key"], r["prob"])
            if k not in latest or r["n_seen"] > latest[k]["n_seen"]:
                latest[k] = (r["n_seen"], r["q_lo"], r["q_hi"])
        return latest

    spark.conf.unset(_KEY) if _has(spark) else None
    default = run("qq_default")
    spark.conf.set(_KEY, _ROCKS)
    rocks = run("qq_rocks")
    assert rocks == default and len(default) == 10


def _has(spark) -> bool:
    try:
        spark.conf.get(_KEY)
        return True
    except Exception:
        return False
