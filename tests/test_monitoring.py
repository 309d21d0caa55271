"""Monitoring family semantics on handcrafted fixtures: PSI reacts to
injected drift (and not to its absence), the rolling z flags a spike
day, the A/B split is deterministic (plans/monitoring.py)."""

from __future__ import annotations

from datetime import datetime

from flink_start_spark.plans import QUERIES


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_psi_zero_without_drift_positive_with(spark, tmp_path):
    j = lambda day: datetime(2024, 1, day)  # noqa: E731
    rows = []
    eid = 0
    # 'view': identical value distribution in both halves -> psi ~ 0
    # 'click': low values in ref, high values in cur -> psi >> 0
    for day, half in [(3, "ref"), (20, "cur")]:
        for i in range(50):
            eid += 1
            rows.append((eid, j(day), i, "view", float(i % 8) * 75.0, "{}"))
            drifted = 10.0 if half == "ref" else 590.0
            eid += 1
            rows.append((eid, j(day), i, "click", drifted, "{}"))
    sf = _events(spark, tmp_path, rows)
    out = {r["event_type"]: r["psi"] for r in
           QUERIES["feature_drift_psi"].spark(spark, sf).collect()}
    assert abs(out["view"]) < 0.01
    assert out["click"] > 1.0  # total mass moved bins: severe drift


def test_rolling_z_flags_spike_day(spark, tmp_path):
    rows = []
    # 14 steady days of one 100.00 order, then a 10x spike day
    for day in range(1, 15):
        rows.append((day, 1, "O", 100.0 + (day % 2), datetime(1995, 1, day), "P"))
    rows.append((15, 1, "O", 1000.0, datetime(1995, 1, 15), "P"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["day_epoch"]: (r["z_score"], r["is_anomaly"]) for r in
           QUERIES["revenue_anomaly_days"].spark(spark, str(tmp_path)).collect()}
    spike = int(datetime(1995, 1, 15).timestamp())
    steady = int(datetime(1995, 1, 10).timestamp())
    assert out[spike][1] is True and out[spike][0] > 2
    assert out[steady][1] is False
    # warm-up days (fewer than 7 trailing) emit null z
    assert out[int(datetime(1995, 1, 3).timestamp())][0] is None


def test_ab_split_is_deterministic_and_counts_all_users(spark, tmp_path):
    j = datetime(2024, 1, 5)
    rows = []
    eid = 0
    for u in range(40):
        # users 0..19 convert (12 purchases); 20..39 do not (1 purchase)
        n = 12 if u < 20 else 1
        for _ in range(n):
            eid += 1
            rows.append((eid, j, u, "purchase", 1.0, "{}"))
    sf = _events(spark, tmp_path, rows)
    r1 = QUERIES["ab_test_zscore"].spark(spark, sf).collect()[0]
    r2 = QUERIES["ab_test_zscore"].spark(spark, sf).collect()[0]
    assert r1 == r2
    assert r1["n_a"] + r1["n_b"] == 40
    assert r1["conv_a"] + r1["conv_b"] == 20
    assert r1["z_score"] is not None


def test_psi_clamps_negative_values_into_bottom_bin(spark, tmp_path):
    """Regression: a one-sided clamp dropped negative values from the
    bin spine while counting them in the totals, deflating every
    probability (and diverging from the streaming twin's np.clip)."""
    j = lambda day: datetime(2024, 1, day)  # noqa: E731
    rows = []
    eid = 0
    for day in (3, 20):  # identical distribution in both halves
        for i in range(20):
            eid += 1
            rows.append((eid, j(day), i, "view", -5.0 if i % 2 else 700.0, "{}"))
    sf = _events(spark, tmp_path, rows)
    out = {r["event_type"]: (r["psi"], r["n_ref"], r["n_cur"]) for r in
           QUERIES["feature_drift_psi"].spark(spark, sf).collect()}
    psi, n_ref, n_cur = out["view"]
    assert n_ref == 20 and n_cur == 20  # negatives counted, not dropped
    assert abs(psi) < 1e-6  # identical halves -> zero drift, exactly


def test_similar_weeks_finds_exact_shape_repeat(spark, tmp_path):
    """A historical week with the exact same (z-normalized) shape as
    the latest week ranks first with distance 0; windows overlapping
    the pattern are excluded."""
    shape = [10.0, 20.0, 80.0, 40.0, 50.0, 30.0, 70.0]
    rows = []
    ok = 0
    # days 1-7: the shape; days 8-14: flat filler; days 15-21: the
    # shape again scaled 3x (z-normalization makes it identical);
    # days 22-28: the query week = the shape scaled 2x
    for day, v in enumerate(shape, start=1):
        ok += 1
        rows.append((ok, 1, "O", v, datetime(1995, 1, day), "P"))
    for day in range(8, 15):
        ok += 1
        rows.append((ok, 1, "O", 100.0 + (day % 3), datetime(1995, 1, day), "P"))
    for day, v in enumerate(shape, start=15):
        ok += 1
        rows.append((ok, 1, "O", v * 3, datetime(1995, 1, day), "P"))
    for day, v in enumerate(shape, start=22):
        ok += 1
        rows.append((ok, 1, "O", v * 2, datetime(1995, 1, day), "P"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = QUERIES["similar_revenue_weeks"].spark(spark, str(tmp_path)).collect()
    by_rank = {r["rank"]: r for r in out}
    # both shape repeats are exact z-matches (distance 0); the tie
    # breaks on the earlier day, so day 7 ranks 1 and day 21 ranks 2
    assert by_rank[1]["window_end_epoch"] == int(datetime(1995, 1, 7).timestamp())
    assert by_rank[1]["zdist"] == 0.0
    assert by_rank[2]["window_end_epoch"] == int(datetime(1995, 1, 21).timestamp())
    assert by_rank[2]["zdist"] == 0.0
    # no returned window may overlap the pattern (ends after day 21)
    assert all(
        r["window_end_epoch"] <= int(datetime(1995, 1, 21).timestamp())
        for r in out
    )
