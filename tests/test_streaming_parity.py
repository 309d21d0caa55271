"""Streaming/batch parity sweep (round-4 verdict item 6): EVERY
streaming pipeline must equal its batch twin on one shared multi-
micro-batch fixture — tumbling, keyed tumbling, sliding, session,
dedup, upsert, heavy-hitters top-k, count-trigger, quantiles, drift.

The fixture replays 150 in-order events in 5 micro-batches
(maxFilesPerTrigger=1), so watermarks never drop anything and parity
is EXACT for the window/dedup/upsert/count-trigger families; the
bounded-state sketches run under their exactness conditions
(heavy-hitters capacity >= distinct items -> zero error bound) or
assert their declared guarantee (quantile bucket encloses the exact
batch quantile at equal n_seen; PSI equal to the batch formula on the
same histograms). Ad-hoc parity tests for drift/quantiles/
count-trigger predate this sweep and stay as deeper checks; this
module is the one place that breaks when EITHER path drifts.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from flink_start_spark.operators import windows as W
from flink_start_spark.streaming import (
    count_trigger_stream,
    keyed_tumbling_counts_stream,
    run_to_memory,
    session_window_stream,
    sliding_signup_counts_stream,
    stream_dedup,
    tumbling_signup_counts_stream,
)
from flink_start_spark.streaming.drift import drift_stream, psi_from_counts
from flink_start_spark.streaming.heavy_hitters import heavy_hitters_stream
from flink_start_spark.streaming.quantiles import quantile_stream
from flink_start_spark.streaming.upsert import latest_per_key, upsert_parquet_sink

BASE = 1754226000  # 2025-08-03T13:00:00Z
ACTS = ["register", "login", "click", "logout"]


def _rows():
    t, out = 0, []
    for i in range(1, 151):
        t += 12 if i % 25 == 0 else 1  # 12 s jumps break sessions
        out.append(
            {
                "arrival": i,
                "user_id": f"u{i % 7}",
                "activity": ACTS[(i * i) % 4],
                "ts": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime(BASE + t)
                ),
                "value": float((i * 37) % 100),
            }
        )
    # watermark-advancing sentinel (final micro-batch): pushes the
    # watermark an hour past every real session so append-mode session
    # aggregation finalizes them all. Present in BOTH the stream and
    # the batch twin, so every other parity stays exact including it;
    # only the session test excludes the sentinel user (its own session
    # never finalizes — the established zz-sentinel pattern).
    out.append(
        {
            "arrival": 151,
            "user_id": "_zz",
            "activity": "login",
            "ts": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(BASE + t + 3600)
            ),
            "value": 1.0,
        }
    )
    return out


@pytest.fixture(scope="module")
def src_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    rows = _rows()
    t0 = time.time() - 10
    for b in range(6):  # 5 micro-batches of 30 + the sentinel batch
        p = d / f"batch_{b:03d}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows[b * 30:(b + 1) * 30]))
        os.utime(p, (t0 + b, t0 + b))
    return str(d)


SCHEMA = "arrival long, user_id string, activity string, ts string, value double"


def _stream(spark, src_dir):
    df = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .json(src_dir)
    )
    return df.withColumn("ts", F.try_to_timestamp(F.col("ts")))


@pytest.fixture(scope="module")
def batch(spark):
    df = spark.createDataFrame(
        [tuple(r.values()) for r in _rows()], SCHEMA
    ).withColumn("ts", F.try_to_timestamp(F.col("ts")))
    df.cache()
    df.count()
    yield df
    df.unpersist()


def _final_counts(rows, key_fields, cnt_field):
    """Update-mode sink: counts only grow -> max per group is final."""
    final = {}
    for r in rows:
        k = tuple(r[f] for f in key_fields)
        final[k] = max(final.get(k, 0), r[cnt_field])
    return final


def _latest_by_nseen(rows, key_fields):
    out = {}
    for r in rows:
        k = tuple(r[f] for f in key_fields)
        if k not in out or r["n_seen"] > out[k]["n_seen"]:
            out[k] = r
    return out


# ------------------------------------------------------------- windows
def test_parity_tumbling(spark, src_dir, batch):
    table = run_to_memory(
        tumbling_signup_counts_stream(_stream(spark, src_dir)),
        "par_tumb", "update",
    )
    got = _final_counts(table.collect(), ["window_start"], "cnt")
    want = {
        (r["window_start"],): r["cnt"]
        for r in W.tumbling_window_agg(
            batch, "3 seconds",
            W.conditional_count(F.col("activity") == "register"),
        ).collect()
    }
    assert got == want and len(want) > 10


def test_parity_keyed_tumbling(spark, src_dir, batch):
    table = run_to_memory(
        keyed_tumbling_counts_stream(_stream(spark, src_dir)),
        "par_keyed", "update",
    )
    got = _final_counts(table.collect(), ["window_start", "activity"], "cnt")
    want = {
        (r["window_start"], r["activity"]): r["cnt"]
        for r in W.tumbling_window_agg(
            batch, "3 seconds", F.count("*").alias("cnt"), keys=["activity"]
        ).collect()
    }
    assert got == want and len(want) > 20


def test_parity_sliding(spark, src_dir, batch):
    table = run_to_memory(
        sliding_signup_counts_stream(_stream(spark, src_dir)),
        "par_slide", "update",
    )
    got = _final_counts(table.collect(), ["window_start"], "cnt")
    want = {
        (r["window_start"],): r["cnt"]
        for r in W.sliding_window_agg(
            batch, "3 seconds", "1 second",
            W.conditional_count(F.col("activity") == "register"),
        ).collect()
    }
    assert got == want and len(want) > 30


def test_parity_session(spark, src_dir, batch):
    # session aggregation is append-only: a session emits once the
    # watermark passes its end — the sentinel batch finalizes every
    # real session, so the sink holds EXACTLY the batch result (minus
    # the sentinel's own never-finalized session)
    table = run_to_memory(
        session_window_stream(_stream(spark, src_dir), gap="15 seconds"),
        "par_sess", "append",
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in table.collect()
    }
    want = {
        (r["user_id"], r["window_start"], r["window_end"], r["n_events"])
        for r in W.session_window_agg(
            batch.filter(F.col("user_id") != "_zz"),
            "15 seconds", F.count("*").alias("n_events"), keys=["user_id"],
        ).collect()
    }
    assert got == want and len(want) > 20


# ------------------------------------------------------ dedup / upsert
def test_parity_dedup(spark, src_dir, batch):
    table = run_to_memory(
        stream_dedup(
            _stream(spark, src_dir), ["user_id", "activity"],
            watermark="600 seconds",
        ),
        "par_dedup", "append",
    )
    rows = table.collect()
    got = {(r["user_id"], r["activity"]) for r in rows}
    want = {
        (r["user_id"], r["activity"])
        for r in batch.select("user_id", "activity").distinct().collect()
    }
    assert got == want
    assert len(rows) == len(want)  # exactly one survivor per key


def test_parity_upsert(spark, src_dir, batch, tmp_path):
    q = upsert_parquet_sink(
        _stream(spark, src_dir),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        ["user_id"],
        ["arrival"],
    )
    q.awaitTermination()
    got = {
        tuple(r) for r in spark.read.parquet(str(tmp_path / "store")).collect()
    }
    want = {
        tuple(r) for r in latest_per_key(batch, ["user_id"], ["arrival"]).collect()
    }
    assert got == want and len(want) == 8  # 7 users + sentinel


# ------------------------------------------- bounded-state stateful ops
def test_parity_heavy_hitters_exact_regime(spark, src_dir, batch):
    table = run_to_memory(
        heavy_hitters_stream(
            _stream(spark, src_dir), "activity", "user_id", capacity=64, k=10
        ),
        "par_hh", "update",
    )
    finals = _latest_by_nseen(table.collect(), ["key", "rank"])
    # capacity (64) >= distinct items (7): SpaceSaving is exact
    assert all(r["err_bound"] == 0 for r in finals.values())
    got = {
        (k[0], k[1]): (r["item"], r["count_est"])
        for k, r in finals.items()
    }
    counts = batch.groupBy("activity", "user_id").count().collect()
    want = {}
    per_key: dict[str, list] = {}
    for r in counts:
        per_key.setdefault(r["activity"], []).append((r["user_id"], r["count"]))
    for key, items in per_key.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for rank, (item, c) in enumerate(items[:10], start=1):
            want[(key, rank)] = (item, c)
    assert got == want


def test_parity_count_trigger(spark, src_dir, batch):
    table = run_to_memory(
        count_trigger_stream(
            _stream(spark, src_dir), every=7,
            pred_col="activity", pred_value="register",
        ),
        "par_ct", "append",
    )
    got = {(r["fire_seq"], r["arrival"], r["cnt"]) for r in table.collect()}
    want = {
        (r["fire_seq"], r["arrival"], r["cnt"])
        for r in W.count_trigger_cumulative(
            batch, F.col("activity") == "register", every=7,
            order_col="arrival",
        ).collect()
    }
    assert got == want and len(want) == 151 // 7


def test_parity_quantiles_enclosure(spark, src_dir, batch):
    lo, hi, nb = 0.0, 100.0, 200
    table = run_to_memory(
        quantile_stream(
            _stream(spark, src_dir), "activity", "value",
            probs=(0.5, 0.9), lo=lo, hi=hi, n_buckets=nb,
        ),
        "par_q", "update",
    )
    finals = _latest_by_nseen(table.collect(), ["key", "prob"])
    # batch exact lower quantile per (activity, prob)
    from pyspark.sql import Window as Wnd

    wo = Wnd.partitionBy("activity").orderBy("value", "arrival")
    wc = Wnd.partitionBy("activity")
    exact = {}
    for p in (0.5, 0.9):
        for r in (
            batch.withColumn("_rn", F.row_number().over(wo))
            .withColumn("_cnt", F.count("*").over(wc))
            .filter(
                F.col("_rn")
                == F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("_cnt")).cast("long"))
            )
            .collect()
        ):
            exact[(r["activity"], p)] = (r["value"], r["_cnt"])
    assert set(finals) == set(exact)
    for k, r in finals.items():
        val, cnt = exact[k]
        assert r["n_seen"] == cnt, k
        assert r["q_lo"] <= val < r["q_hi"] + 1e-9, (k, val, r)


def test_parity_drift_psi(spark, src_dir, batch):
    lo, hi, nb = 0.0, 100.0, 8
    bin_col = F.least(
        F.lit(nb - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - lo) / (hi - lo) * nb)),
    ).cast("long")
    # reference = the register rows; stream monitors the whole fixture
    ref: dict[str, list[int]] = {}
    for r in (
        batch.filter(F.col("activity") == "register")
        .groupBy("user_id", bin_col.alias("b")).count().collect()
    ):
        ref.setdefault(r["user_id"], [0] * nb)[r["b"]] = r["count"]
    table = run_to_memory(
        drift_stream(
            _stream(spark, src_dir), "user_id", "value", ref, lo, hi, nb
        ),
        "par_psi", "update",
    )
    finals = _latest_by_nseen(table.collect(), ["key"])
    cur: dict[str, list[int]] = {}
    for r in batch.groupBy("user_id", bin_col.alias("b")).count().collect():
        cur.setdefault(r["user_id"], [0] * nb)[r["b"]] = r["count"]
    assert set(f[0] for f in finals) == set(cur)
    for (k,), r in finals.items():
        want = psi_from_counts(ref.get(k, [0] * nb), cur[k])
        assert r["psi"] == pytest.approx(want, abs=1e-9), k
        assert r["n_seen"] == sum(cur[k])


@pytest.fixture(scope="module")
def src_dir_shuffled(tmp_path_factory):
    """Same fixture, but rows REVERSED within each micro-batch file and
    Arrow-chunked smaller than the batch: the applyInPandasWithState
    iterator then yields multiple chunks per key per micro-batch whose
    arrival ranges interleave — the shape that catches per-chunk (vs
    per-micro-batch) sorting in arrival-ordered stateful operators."""
    d = tmp_path_factory.mktemp("parity_shuffled")
    rows = _rows()
    t0 = time.time() - 10
    for b in range(6):
        p = d / f"batch_{b:03d}.json"
        p.write_text(
            "\n".join(json.dumps(r) for r in reversed(rows[b * 30:(b + 1) * 30]))
        )
        os.utime(p, (t0 + b, t0 + b))
    return str(d)


def test_parity_count_trigger_multichunk_out_of_order(
    spark, src_dir_shuffled, batch
):
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "7")  # 30-row micro-batch -> 5 chunks per key
    try:
        table = run_to_memory(
            count_trigger_stream(
                _stream(spark, src_dir_shuffled), every=7,
                pred_col="activity", pred_value="register",
            ),
            "par_ct_chunked", "append",
        )
    finally:
        spark.conf.set(conf, prev)
    got = {(r["fire_seq"], r["arrival"], r["cnt"]) for r in table.collect()}
    want = {
        (r["fire_seq"], r["arrival"], r["cnt"])
        for r in W.count_trigger_cumulative(
            batch, F.col("activity") == "register", every=7,
            order_col="arrival",
        ).collect()
    }
    assert got == want and len(want) == 151 // 7


def test_count_trigger_stream_rejects_nonpositive_every(spark, src_dir):
    with pytest.raises(ValueError, match="every"):
        count_trigger_stream(
            _stream(spark, src_dir), every=0,
            pred_col="activity", pred_value="register",
        )


def test_quantile_stream_rejects_inverted_range(spark, src_dir):
    with pytest.raises(ValueError, match="hi must exceed lo"):
        quantile_stream(
            _stream(spark, src_dir), "activity", "value", lo=100.0, hi=0.0
        )
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_stream(
            _stream(spark, src_dir), "activity", "value", n_buckets=0
        )


def test_parity_heavy_hitters_drops_null_items(spark, tmp_path):
    """Null items must not surface as the literal string 'None' (the
    astype(str) trap) nor count toward n_seen."""
    d = tmp_path / "hh_nulls"
    d.mkdir()
    rows = [{"activity": "a", "user_id": None}] * 4 + [
        {"activity": "a", "user_id": "u1"},
        {"activity": "a", "user_id": "u1"},
        {"activity": "a", "user_id": "u2"},
    ]
    (d / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("activity string, user_id string")
        .json(str(d))
    )
    table = run_to_memory(
        heavy_hitters_stream(stream, "activity", "user_id", capacity=8, k=5),
        "par_hh_nulls", "update",
    )
    out = table.collect()
    assert {r["item"] for r in out} == {"u1", "u2"}
    assert all(r["n_seen"] == 3 for r in out)


def test_drift_stream_coerces_int_reference_keys(spark, tmp_path):
    """A reference dict keyed by raw ints (natural for an int key
    column) must match the stream's string-cast keys instead of
    silently falling back to the uniform reference for every key."""
    d = tmp_path / "drift_int_keys"
    d.mkdir()
    rows = [{"k": 7, "value": v} for v in (5.0, 15.0, 25.0, 35.0)]
    (d / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("k long, value double")
        .json(str(d))
    )
    ref = {7: [1, 1, 1, 1]}  # int key, same shape as the stream's bins
    table = run_to_memory(
        drift_stream(stream, "k", "value", ref, lo=0.0, hi=40.0, n_bins=4),
        "par_drift_int", "update",
    )
    finals = _latest_by_nseen(table.collect(), ["key"])
    # identical histograms -> PSI exactly 0 IF the reference matched;
    # the uniform fallback would give a large smoothing-only PSI
    assert finals[("7",)]["psi"] == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError, match="collide"):
        drift_stream(
            stream, "k", "value", {7: [1] * 4, "7": [2] * 4},
            lo=0.0, hi=40.0, n_bins=4,
        )
