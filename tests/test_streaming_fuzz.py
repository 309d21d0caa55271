"""Seeded streaming/batch parity fuzz: random degenerate-mix event
streams (duplicate timestamps, exact window-boundary times, NULL
user_ids, empty activities, a hot key, fractional seconds) replayed
in micro-batches must produce EXACTLY the batch twin's result for the
stateful families whose parity is exact by construction — tumbling,
keyed tumbling, session windows, dedup, count-trigger — and must
satisfy the documented sketch invariants for the bounded-state
families whose emission is a summary, not a row-for-row twin:

- heavy hitters (SpaceSaving): ``true <= est``, ``est - err <= true``,
  ``err <= n/capacity``, and every item above the ``n/capacity``
  frequency threshold present (Metwally '05);
- quantiles: the true rank-``ceil(p*n)`` value's bucket equals the
  emitted bucket (enclosure is exact, not approximate), ``n_seen``
  exact;
- drift (PSI): bit-equal to ``psi_from_counts`` over the exact
  histogram of everything seen (the batch query's convergence
  contract);
- upsert sink: the final store equals ``latest_per_key`` of the whole
  stream (idempotent-merge contract).

Rows are globally ts-sorted before chunking so the 500 ms watermark
never drops anything (the parity precondition the handcrafted fixture
also relies on); what varies is everything the state stores key on.
test_streaming_parity.py and the per-operator modules pin handcrafted
shapes; this module searches the combination space around them — the
round-6 heavy-hitters NULL-item bug lived exactly in that space.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_start_spark.operators import windows as W
from flink_start_spark.streaming import (
    count_trigger_stream,
    drift_stream,
    heavy_hitters_stream,
    keyed_tumbling_counts_stream,
    latest_per_key,
    psi_from_counts,
    quantile_stream,
    run_to_memory,
    session_window_stream,
    stream_dedup,
    tumbling_signup_counts_stream,
    upsert_parquet_sink,
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


def _final_rows(rows, key_field):
    """Last emission per key from an update-mode memory sink: the rows
    carrying that key's maximum n_seen (n_seen is monotone per key and
    only advances when the summary changes, so equal-n_seen re-emits
    are byte-identical and a set() dedups them)."""
    mx = {}
    for r in rows:
        k = r[key_field]
        mx[k] = max(mx.get(k, -1), r["n_seen"])
    return [r for r in rows if r["n_seen"] == mx[r[key_field]]]


def test_fuzz_invariants_heavy_hitters(spark, fuzz_case):
    seed, src, batch = fuzz_case
    cap = 4  # far below item cardinality so takeovers actually happen
    table = run_to_memory(
        heavy_hitters_stream(
            _stream(spark, src), "activity", "user_id", capacity=cap, k=10
        ),
        f"fz_hh_{seed}", "update",
    )
    final = _final_rows(table.collect(), "key")
    true = {}
    for r in batch.select("activity", "user_id").collect():
        if r["user_id"] is not None:
            k = (r["activity"], r["user_id"])
            true[k] = true.get(k, 0) + 1
    n_per_key = {}
    for (act, _uid), c in true.items():
        n_per_key[act] = n_per_key.get(act, 0) + c
    assert final, f"seed {seed}: no heavy-hitter emissions"
    emitted_by_key = {}
    for r in final:
        k, item = r["key"], r["item"]
        t = true.get((k, item), 0)
        # SpaceSaving invariants (Metwally '05): never an undercount,
        # certified lower bound correct, error within n/capacity
        assert r["count_est"] >= t, (seed, k, item)
        assert r["count_est"] - r["err_bound"] <= t, (seed, k, item)
        assert r["err_bound"] <= r["n_seen"] / cap, (seed, k, item)
        assert r["n_seen"] == n_per_key[k], (seed, k)
        emitted_by_key.setdefault(k, set()).add(item)
    # guaranteed-presence: any item above the n/capacity frequency
    # threshold must be tracked (k=10 > capacity=4 => emitted)
    for (k, item), t in true.items():
        if t > n_per_key[k] / cap:
            assert item in emitted_by_key.get(k, set()), (seed, k, item)


def test_fuzz_invariants_quantiles(spark, fuzz_case):
    seed, src, batch = fuzz_case
    lo, hi, nb = 0.0, 50.0, 64  # -5.5 clamps to bucket 0, 1e12 to 63
    width = (hi - lo) / nb
    table = run_to_memory(
        quantile_stream(
            _stream(spark, src), "activity", "value",
            probs=(0.25, 0.5, 0.9), lo=lo, hi=hi, n_buckets=nb,
        ),
        f"fz_qs_{seed}", "update",
    )
    final = _final_rows(table.collect(), "key")
    assert final, f"seed {seed}: no quantile emissions"
    vals = {}
    for r in batch.select("activity", "value").collect():
        vals.setdefault(r["activity"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    for r in final:
        v = vals[r["key"]]
        assert r["n_seen"] == len(v), (seed, r["key"])
        rank = max(1, math.ceil(r["prob"] * len(v)))
        true_val = v[rank - 1]
        bkt = int(min(max(math.floor((true_val - lo) / (hi - lo) * nb), 0), nb - 1))
        # enclosure is exact: the true rank value's bucket IS the
        # emitted bucket (same clamp + floor formula both sides)
        assert r["q_lo"] == lo + bkt * width, (seed, r["key"], r["prob"])
        assert r["q_hi"] == lo + (bkt + 1) * width
        assert r["q_lo"] <= r["q_mid"] < r["q_hi"]


def test_fuzz_parity_drift_psi(spark, fuzz_case):
    seed, src, batch = fuzz_case
    lo, hi, nb = 0.0, 50.0, 8
    # reference histograms for SOME keys (hot + two spares) so both the
    # matched-reference and uniform-fallback paths run; user_id key
    # exercises the NULL-key state path the keyed families group on
    ref = {"hot": [5, 4, 3, 2, 1, 1, 1, 1], "u0": [1] * 8, "u3": [9, 0, 0, 0, 0, 0, 0, 1]}
    table = run_to_memory(
        drift_stream(
            _stream(spark, src), "user_id", "value",
            ref_counts_by_key=ref, lo=lo, hi=hi, n_bins=nb,
        ),
        f"fz_dr_{seed}", "update",
    )
    final = _final_rows(table.collect(), "key")
    assert final, f"seed {seed}: no drift emissions"
    hists = {}
    counts = {}
    for r in batch.select("user_id", "value").collect():
        k = None if r["user_id"] is None else str(r["user_id"])
        h = hists.setdefault(k, [0] * nb)
        b = int(min(max(math.floor((r["value"] - lo) / (hi - lo) * nb), 0), nb - 1))
        h[b] += 1
        counts[k] = counts.get(k, 0) + 1
    seen_keys = set()
    for r in final:
        k = r["key"]
        assert r["n_seen"] == counts[k], (seed, k)
        want = psi_from_counts(ref.get(k, [0] * nb), hists[k])
        assert r["psi"] == want, (seed, k)  # bit-equal, not approximate
        seen_keys.add(k)
    assert seen_keys == set(counts), (seed, "missing keys")


def test_fuzz_parity_upsert(spark, fuzz_case, tmp_path):
    seed, src, batch = fuzz_case
    store = str(tmp_path / "store.parquet")
    q = upsert_parquet_sink(
        _stream(spark, src), store, str(tmp_path / "ckpt"),
        key_cols=["user_id"], order_cols=["arrival"],
    )
    assert q.awaitTermination(120), "upsert sink did not finish in 120s"
    got = {
        (r["user_id"], r["arrival"], r["activity"], r["ts"], r["value"])
        for r in spark.read.parquet(store).collect()
    }
    want = {
        (r["user_id"], r["arrival"], r["activity"], r["ts"], r["value"])
        for r in latest_per_key(batch, ["user_id"], ["arrival"]).collect()
    }
    assert got == want and len(want) > 3


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
