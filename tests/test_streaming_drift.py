"""Streaming PSI drift monitor: batch-parity (a drained stream over the
current window reproduces the batch feature_drift_psi value exactly),
cross-batch state accumulation, and the unknown-key fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_start_spark.plans import QUERIES
from flink_start_spark.sources.catalog import load_table
from flink_start_spark.streaming import run_to_memory, stream_events
from flink_start_spark.streaming.drift import drift_stream, psi_from_counts

from tests.conftest import SF_SMOKE

LO, HI, BINS = 0.0, 600.0, 8
_CUT = "2024-01-16 00:00:00"


def _bin_counts(df):
    """Batch-side reference histograms, binned EXACTLY like the monitor."""
    b = F.least(
        F.lit(BINS - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - LO) / (HI - LO) * BINS)),
    ).cast("long")
    rows = (
        df.filter(F.col("value").isNotNull())
        .groupBy("event_type", b.alias("bin"))
        .count()
        .collect()
    )
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r["event_type"], [0] * BINS)[r["bin"]] = r["count"]
    return out


def test_drained_stream_psi_matches_batch_query(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE)
    cut = F.lit(_CUT).cast("timestamp")
    ref = _bin_counts(ev.filter(F.col("ts") < cut))
    # replay ONLY the current window through the stream
    cur_dir = tmp_path / "cur"
    ev.filter((F.col("ts") >= cut) & F.col("value").isNotNull()).write.parquet(
        str(cur_dir / "events.parquet")
    )
    stream = stream_events(spark, str(cur_dir / "events.parquet"))
    out = drift_stream(stream, "event_type", "value", ref, LO, HI, BINS)
    rows = run_to_memory(out, "drift_sink", "update").collect()
    latest = {}
    for r in rows:
        if r["key"] not in latest or r["n_seen"] > latest[r["key"]]["n_seen"]:
            latest[r["key"]] = r
    batch = {
        r["event_type"]: r["psi"]
        for r in QUERIES["feature_drift_psi"].spark(spark, SF_SMOKE).collect()
    }
    assert set(latest) == set(batch)
    for k, r in latest.items():
        assert abs(r["psi"] - batch[k]) < 1e-9, (k, r["psi"], batch[k])


def test_state_accumulates_across_batches(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE).filter(F.col("value").isNotNull())
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    d = tmp_path / "src"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(d / "a.parquet")
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(d / "b.parquet")
    )
    ref = _bin_counts(ev)
    stream = stream_events(spark, str(d) + "/*/", max_files_per_trigger=1)
    out = drift_stream(stream, "event_type", "value", ref, LO, HI, BINS)
    rows = run_to_memory(out, "drift_acc_sink", "update").collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["key"], []).append(r)
    total = ev.groupBy("event_type").count().collect()
    expect = {r["event_type"]: r["count"] for r in total}
    for k, rs in per_key.items():
        assert len(rs) >= 2, k  # one emission per micro-batch
        assert max(r["n_seen"] for r in rs) == expect[k]
        # current == reference distribution once drained -> tiny PSI
        final = max(rs, key=lambda r: r["n_seen"])
        assert abs(final["psi"]) < 0.01, (k, final["psi"])


def test_unknown_key_falls_back_to_uniform_reference():
    # pure-python path: no reference counts -> smoothing-only reference
    cur = [100, 0, 0, 0, 0, 0, 0, 0]
    psi = psi_from_counts([0] * 8, cur)
    assert psi > 1.0  # concentrated vs uniform = severe drift
    assert psi_from_counts(cur, cur) == 0.0


def test_null_values_do_not_crash_the_stream(spark, tmp_path):
    """Regression: NaN survived np.clip, cast to INT64_MIN, and
    bincount raised — killing the long-running query. Nulls must be
    skipped like the batch query's IS NOT NULL filter."""
    rows = [
        (1, "2024-01-20 00:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-20 00:00:01", 1, "view", None, "{}"),
    ]
    d = tmp_path / "nulls"
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))
    stream = stream_events(spark, str(d / "events.parquet"))
    out = drift_stream(stream, "event_type", "value", {}, LO, HI, BINS)
    rows_out = run_to_memory(out, "drift_null_sink", "update").collect()
    assert len(rows_out) == 1 and rows_out[0]["n_seen"] == 1
