"""Structured Streaming surface: the reference's streaming pipelines
re-expressed on Spark's incremental execution model (SURVEY §3)."""

from flink_start_spark.streaming.pipelines import (
    keyed_tumbling_counts_stream,
    run_to_memory,
    session_window_stream,
    sliding_signup_counts_stream,
    stream_dedup,
    stream_events,
    stream_user_activity,
    tumbling_signup_counts_stream,
)
from flink_start_spark.streaming.count_trigger import count_trigger_stream
from flink_start_spark.streaming.upsert import latest_per_key, upsert_parquet_sink
from flink_start_spark.streaming.drift import drift_stream, psi_from_counts
from flink_start_spark.streaming.heavy_hitters import heavy_hitters_stream
from flink_start_spark.streaming.quantiles import quantile_stream

__all__ = [
    "stream_events",
    "stream_user_activity",
    "tumbling_signup_counts_stream",
    "keyed_tumbling_counts_stream",
    "sliding_signup_counts_stream",
    "session_window_stream",
    "stream_dedup",
    "count_trigger_stream",
    "drift_stream",
    "psi_from_counts",
    "heavy_hitters_stream",
    "quantile_stream",
    "latest_per_key",
    "upsert_parquet_sink",
    "run_to_memory",
]
