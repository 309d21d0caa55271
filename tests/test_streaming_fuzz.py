"""Seeded streaming/batch parity fuzz: random degenerate-mix event
streams (duplicate timestamps, exact window-boundary times, NULL
user_ids, empty activities, a hot key, fractional seconds) replayed
in micro-batches must produce EXACTLY the batch twin's result for the
stateful families whose parity is exact by construction — tumbling,
keyed tumbling, session windows, dedup, count-trigger.

Rows are globally ts-sorted before chunking so the 500 ms watermark
never drops anything (the parity precondition the handcrafted fixture
also relies on); what varies is everything the state stores key on.
test_streaming_parity.py pins the handcrafted shapes; this module
searches the combination space around them.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_start_spark.operators import windows as W
from flink_start_spark.streaming import (
    count_trigger_stream,
    keyed_tumbling_counts_stream,
    run_to_memory,
    session_window_stream,
    stream_dedup,
    tumbling_signup_counts_stream,
)

SCHEMA = "arrival long, user_id string, activity string, ts string, value double"
ACTS = ["register", "login", "click", "logout", ""]
BASE = dt.datetime(2025, 8, 3, 13, 0, 0)


def _fuzz_rows(seed: int, n: int = 120):
    rng = np.random.RandomState(seed)
    stamps = []
    t = 0.0
    for _ in range(n):
        r = rng.random_sample()
        if r < 0.15:  # duplicate the previous instant exactly
            pass
        elif r < 0.35:  # land exactly on a 1 s (and often 3 s) boundary
            t = float(int(t) + int(rng.randint(1, 5)))
        else:
            t += float(rng.randint(0, 20)) + (
                round(float(rng.random_sample()), 3)
                if rng.random_sample() < 0.4 else 0.0
            )
        stamps.append(t)
    stamps.sort()
    rows = []
    for i, s in enumerate(stamps):
        ts = BASE + dt.timedelta(seconds=s)
        frac = ts.microsecond
        txt = ts.strftime("%Y-%m-%dT%H:%M:%S") + (
            f".{frac:06d}Z" if frac else "Z"
        )
        r = rng.random_sample()
        uid = (
            None if r < 0.08
            else "hot" if r < 0.55  # one skewed key holds ~half the rows
            else f"u{int(rng.randint(0, 6))}"
        )
        rows.append({
            "arrival": i + 1,
            "user_id": uid,
            "activity": ACTS[int(rng.randint(len(ACTS)))],
            "ts": txt,
            "value": [0.0, -5.5, 1e12, 42.0][int(rng.randint(4))],
        })
    rows.append({  # watermark-advancing sentinel (own final batch)
        "arrival": n + 1, "user_id": "_zz", "activity": "login",
        "ts": (BASE + dt.timedelta(seconds=stamps[-1] + 3600)
               ).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "value": 1.0,
    })
    return rows


# default two seeds in the gate; FUZZ_STREAM_SEEDS="1,2,3" widens a
# local sweep without editing the module
SEEDS = [
    int(s) for s in os.environ.get("FUZZ_STREAM_SEEDS", "101,202").split(",")
]


@pytest.fixture(scope="module", params=SEEDS)
def fuzz_case(request, spark, tmp_path_factory):
    seed = request.param
    rows = _fuzz_rows(seed)
    d = tmp_path_factory.mktemp(f"sparity_{seed}")
    per = (len(rows) - 1 + 3) // 4  # 4 data batches + sentinel batch
    chunks = [rows[i:i + per] for i in range(0, len(rows) - 1, per)]
    chunks.append(rows[-1:])
    t0 = time.time() - 10
    for b, chunk in enumerate(chunks):
        p = d / f"batch_{b:03d}.json"
        p.write_text("\n".join(json.dumps(r) for r in chunk))
        os.utime(p, (t0 + b, t0 + b))
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows], SCHEMA
    ).withColumn("ts", F.try_to_timestamp(F.col("ts")))
    batch.cache()
    batch.count()
    yield seed, str(d), batch
    batch.unpersist()


def _stream(spark, src_dir):
    df = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .json(src_dir)
    )
    return df.withColumn("ts", F.try_to_timestamp(F.col("ts")))


def _final_counts(rows, key_fields, cnt_field):
    final = {}
    for r in rows:
        k = tuple(r[f] for f in key_fields)
        final[k] = max(final.get(k, 0), r[cnt_field])
    return final


def test_fuzz_parity_tumbling(spark, fuzz_case):
    seed, src, batch = fuzz_case
    table = run_to_memory(
        tumbling_signup_counts_stream(_stream(spark, src)),
        f"fz_tumb_{seed}", "update",
    )
    got = _final_counts(table.collect(), ["window_start"], "cnt")
    want = {
        (r["window_start"],): r["cnt"]
        for r in W.tumbling_window_agg(
            batch, "3 seconds",
            W.conditional_count(F.col("activity") == "register"),
        ).collect()
    }
    assert got == want and len(want) > 5


def test_fuzz_parity_keyed_tumbling(spark, fuzz_case):
    seed, src, batch = fuzz_case
    table = run_to_memory(
        keyed_tumbling_counts_stream(_stream(spark, src)),
        f"fz_keyed_{seed}", "update",
    )
    got = _final_counts(table.collect(), ["window_start", "activity"], "cnt")
    want = {
        (r["window_start"], r["activity"]): r["cnt"]
        for r in W.tumbling_window_agg(
            batch, "3 seconds", F.count("*").alias("cnt"), keys=["activity"]
        ).collect()
    }
    assert got == want and len(want) > 10


def test_fuzz_parity_session(spark, fuzz_case):
    seed, src, batch = fuzz_case
    table = run_to_memory(
        session_window_stream(_stream(spark, src), gap="15 seconds"),
        f"fz_sess_{seed}", "append",
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in table.collect()
    }
    want = {
        (r["user_id"], r["window_start"], r["window_end"], r["n_events"])
        for r in W.session_window_agg(
            batch.filter(
                F.col("user_id").isNull() | (F.col("user_id") != "_zz")
            ),
            "15 seconds", F.count("*").alias("n_events"), keys=["user_id"],
        ).collect()
    }
    assert got == want and len(want) > 5


def test_fuzz_parity_dedup(spark, fuzz_case):
    seed, src, batch = fuzz_case
    table = run_to_memory(
        stream_dedup(
            _stream(spark, src), ["user_id", "activity"],
            watermark="7200 seconds",
        ),
        f"fz_dedup_{seed}", "append",
    )
    rows = table.collect()
    got = {(r["user_id"], r["activity"]) for r in rows}
    want = {
        (r["user_id"], r["activity"])
        for r in batch.select("user_id", "activity").distinct().collect()
    }
    assert got == want
    assert len(rows) == len(want)


def test_fuzz_parity_count_trigger(spark, fuzz_case):
    seed, src, batch = fuzz_case
    table = run_to_memory(
        count_trigger_stream(
            _stream(spark, src), every=7,
            pred_col="activity", pred_value="register",
        ),
        f"fz_ct_{seed}", "append",
    )
    got = {(r["fire_seq"], r["arrival"], r["cnt"]) for r in table.collect()}
    want = {
        (r["fire_seq"], r["arrival"], r["cnt"])
        for r in W.count_trigger_cumulative(
            batch, F.col("activity") == "register", every=7,
            order_col="arrival",
        ).collect()
    }
    assert got == want
