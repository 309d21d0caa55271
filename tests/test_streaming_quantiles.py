"""Streaming bounded-state quantiles: the enclosing-bucket guarantee
against the batch exact median, and cross-batch state accumulation."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_start_spark.sources.catalog import load_table
from flink_start_spark.streaming import run_to_memory, stream_events
from flink_start_spark.streaming.quantiles import quantile_stream

from tests.conftest import SF_SMOKE

LO, HI, B = 0.0, 1100.0, 512


def _latest(rows):
    out = {}
    for r in rows:
        k = (r["key"], r["prob"])
        if k not in out or r["n_seen"] > out[k]["n_seen"]:
            out[k] = r
    return out


def test_stream_median_bucket_encloses_exact(spark):
    import os

    stream = stream_events(spark, os.path.join(SF_SMOKE, "events.parquet"))
    q = quantile_stream(
        stream, "event_type", "value", probs=(0.5, 0.9), lo=LO, hi=HI, n_buckets=B
    )
    got = _latest(run_to_memory(q, "sq_sink", "update").collect())

    ev = load_table(spark, "events", SF_SMOKE).select("event_type", "value")
    wo = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    exact = {}
    for p in (0.5, 0.9):
        rows = (
            ev.withColumn("_rn", F.row_number().over(wo))
            .withColumn("_cnt", F.count("*").over(wc))
            .filter(
                F.col("_rn")
                == F.greatest(
                    F.lit(1), F.ceil(F.lit(p) * F.col("_cnt")).cast("long")
                )
            )
            .collect()
        )
        for r in rows:
            exact[(r["event_type"], p)] = (r["value"], r["_cnt"])
    assert set(got) == set(exact)
    for k, r in got.items():
        val, cnt = exact[k]
        clamped = min(max(val, LO), HI - 1e-9)
        assert r["n_seen"] == cnt, k
        assert r["q_lo"] <= clamped < r["q_hi"] + 1e-9, (k, val, r)
        assert r["q_hi"] - r["q_lo"] == pytest.approx((HI - LO) / B)


def test_state_accumulates_across_batches(spark, tmp_path):
    import json as _json
    import os
    import time

    d = tmp_path / "qbatches"
    d.mkdir()
    # two files -> two micro-batches with maxFilesPerTrigger=1
    for i, vals in enumerate([[1.0, 2.0, 3.0], [100.0, 200.0, 300.0]]):
        p = d / f"b{i}.json"
        p.write_text(
            "\n".join(_json.dumps({"k": "a", "v": float(x)}) for x in vals)
        )
        os.utime(p, (time.time() - 5 + i, time.time() - 5 + i))
    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = quantile_stream(stream, "k", "v", probs=(0.5,), lo=0.0, hi=400.0, n_buckets=400)
    rows = run_to_memory(q, "sq2_sink", "update").collect()
    by_n = {r["n_seen"]: r for r in rows}
    # after all 6 values the lower median is the rank-3 value (3.0)
    final = by_n[max(by_n)]
    assert final["n_seen"] == 6
    assert final["q_lo"] <= 3.0 < final["q_hi"]
    # and some earlier emission saw only the first batch
    if len(by_n) > 1:
        first = by_n[min(by_n)]
        assert first["n_seen"] == 3 and first["q_lo"] <= 2.0 < first["q_hi"]


def test_classifier_is_stateless_streaming_compatible(spark, tmp_path):
    """quality_classifier_score is a pure projection (zero-shuffle
    fold), so the SAME operator function runs on a streaming DataFrame
    with no aggregation mode or watermark — the docstring's claim,
    pinned."""
    import json as _json
    import os
    import time

    from flink_start_spark.operators.text import quality_classifier_score

    d = tmp_path / "clsdocs"
    d.mkdir()
    p = d / "b0.json"
    p.write_text(
        "\n".join(
            _json.dumps({"doc_id": i, "text": t})
            for i, t in enumerate(["the cat sat on the mat", "xyzzy plugh"])
        )
    )
    os.utime(p, (time.time() - 5, time.time() - 5))
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    scored = quality_classifier_score(stream, "text", "doc_id")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logodds_q"], r["kept"])
        for r in run_to_memory(scored, "cls_sink", "append").collect()
    }
    # batch twin on identical rows must agree exactly
    batch = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "xyzzy plugh")],
        "doc_id long, text string",
    )
    expect = {
        r["doc_id"]: (r["n_tokens"], r["logodds_q"], r["kept"])
        for r in quality_classifier_score(batch, "text", "doc_id").collect()
    }
    assert got == expect and set(got) == {0, 1}


def test_null_values_and_bigint_key_do_not_crash(spark, tmp_path):
    """Regression pair: (a) NaN survived np.clip and killed bincount;
    (b) a non-string key column died at Arrow conversion because
    OUTPUT_SCHEMA declares a string key."""
    rows = [
        (1, "2024-01-20 00:00:00", 7, "view", 10.0, "{}"),
        (2, "2024-01-20 00:00:01", 7, "view", None, "{}"),
        (3, "2024-01-20 00:00:02", 9, "view", 20.0, "{}"),
    ]
    d = tmp_path / "nk"
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(d / "events.parquet"))
    stream = stream_events(spark, str(d / "events.parquet"))
    # key on the BIGINT user_id column
    q = quantile_stream(stream, "user_id", "value", probs=(0.5,), lo=LO, hi=HI)
    got = {r["key"]: r for r in run_to_memory(q, "sq_nk", "update").collect()}
    assert got["7"]["n_seen"] == 1  # null dropped, key stringified
    assert got["9"]["n_seen"] == 1
