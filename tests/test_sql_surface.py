"""SQL-surface smoke + physical-plan shape tests.

Value-level correctness is covered by the DuckDB oracle gate
(scripts/crosscheck.py replicates it). These tests assert the *physical*
properties that matter at 100 TB: filters reach the parquet scan,
dimension joins broadcast, aggregation is whole-stage codegen'd.
"""

from __future__ import annotations

from flink_start_spark.plans import QUERIES

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    df = QUERIES["pricing_summary"].spark(spark, SF_SMOKE)
    formatted = df._jdf.queryExecution().simpleString()
    # the l_shipdate predicate must appear as a parquet PushedFilters entry
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in explained and "l_shipdate" in explained.split("PushedFilters")[1][:200]


def test_regional_revenue_broadcasts_dimensions(spark):
    df = QUERIES["regional_revenue"].spark(spark, SF_SMOKE)
    plan = _plan(df)
    # nation + region are hinted (fixed-size dims); supplier carries no
    # hint (SF-scaled) but auto-broadcasts at this SF via size stats
    assert plan.count("BroadcastHashJoin") >= 3


def test_windowed_agg_is_codegen(spark):
    df = QUERIES["tumbling_signup_count"].spark(spark, SF_SMOKE)
    df.collect()  # AQE finalizes the plan (and codegen stages) on execution
    plan = _plan(df)
    # '*(n) ' prefixes mark whole-stage-codegen'd operators
    assert "*(1)" in plan
    assert "HashAggregate" in plan
    # partial before the exchange, final after — the reference's
    # "incremental aggregation" (Approach 2) is Spark's only shape
    assert "partial_count" in plan


def test_topk_returns_exactly_k(spark):
    df = QUERIES["top_revenue_orders"].spark(spark, SF_SMOKE)
    assert df.count() == 10


def test_rollup_has_grand_total(spark):
    rows = QUERIES["order_priority_rollup"].spark(spark, SF_SMOKE).collect()
    grand = [r for r in rows if r["o_orderstatus"] == "ALL" and r["o_orderpriority"] == "ALL"]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(
        r["n_orders"] for r in rows if r["o_orderstatus"] != "ALL" and r["o_orderpriority"] != "ALL"
    )


# ---------------------------------------------------------------------
# event analytics: funnel / cohort / MAD outliers
# ---------------------------------------------------------------------

def _events(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [(i, datetime.fromtimestamp(ts), uid, et, float(v)) for i, (ts, uid, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_purchase_before_signup_does_not_convert(spark, tmp_path):
    import os

    from flink_start_spark.plans import QUERIES

    df = _events(
        spark,
        [
            (1000, 1, "purchase", 0),  # before signup: must not count
            (2000, 1, "signup", 0),
            (1000, 2, "signup", 0),
            (1500, 2, "purchase", 0),  # converts in 500 s
            (1000, 3, "view", 0),      # never signed up: absent
        ],
    )
    sf = str(tmp_path)
    df.write.parquet(os.path.join(sf, "events.parquet"))
    rows = QUERIES["signup_purchase_funnel"].spark(spark, sf).collect()
    out = {r["user_id"]: r for r in rows}
    assert set(out) == {1, 2}
    assert out[1]["converted"] is False
    assert out[1]["purchase_epoch"] is None
    assert out[2]["converted"] is True
    assert out[2]["secs_to_convert"] == 500


def test_mad_outliers_hand_values(spark, tmp_path):
    """values [1,2,3,4,100]: lower median 3, deviations [2,1,0,1,97],
    MAD (lower median of deviations) = 1, one 3-MAD outlier (97)."""
    import os

    from flink_start_spark.plans import QUERIES

    df = _events(
        spark,
        [(1000 + i, 7, "click", v) for i, v in enumerate([1, 2, 3, 4, 100])],
    )
    sf = str(tmp_path)
    df.write.parquet(os.path.join(sf, "events.parquet"))
    out = QUERIES["value_outliers_mad"].spark(spark, sf).collect()
    row = {r["event_type"]: r for r in out}["click"]
    assert row["n_events"] == 5
    assert row["median_value"] == 3.0
    assert row["mad"] == 1.0
    assert row["n_outliers"] == 1


def test_cohort_offsets(spark, tmp_path):
    """User active in their cohort week and two weeks later produces
    offsets 0 and 2 for that cohort."""
    import os

    from flink_start_spark.plans import QUERIES

    week = 604800
    df = _events(
        spark,
        [
            (10 * week + 100, 1, "view", 0),
            (12 * week + 5, 1, "click", 0),
            (10 * week + 200, 2, "view", 0),
        ],
    )
    sf = str(tmp_path)
    df.write.parquet(os.path.join(sf, "events.parquet"))
    rows = QUERIES["weekly_cohort_retention"].spark(spark, sf).collect()
    got = {(r["cohort_week"], r["week_offset"]): r["n_active"] for r in rows}
    assert got == {(10, 0): 2, (10, 2): 1}


def test_gapfill_zero_counts_and_locf(spark, tmp_path):
    """A missing calendar day appears in the spine with 0 orders, 0
    revenue, and the PREVIOUS day's revenue carried forward."""
    import os
    from datetime import datetime

    from flink_start_spark.plans import QUERIES

    rows = [
        (1, 10, "O", 100.0, datetime(2024, 1, 1), "1-URGENT"),
        (2, 11, "O", 50.0, datetime(2024, 1, 1), "1-URGENT"),
        # Jan 2 missing entirely
        (3, 12, "O", 70.0, datetime(2024, 1, 3), "1-URGENT"),
    ]
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(sf, "orders.parquet")
    )
    out = sorted(
        QUERIES["daily_revenue_gapfill"].spark(spark, sf).collect(),
        key=lambda r: r["date_epoch"],
    )
    assert [r["n_orders"] for r in out] == [2, 0, 1]
    assert [r["revenue"] for r in out] == [150.0, 0.0, 70.0]
    assert [r["revenue_locf"] for r in out] == [150.0, 150.0, 70.0]


def test_trend_slope_hand_values(spark, tmp_path):
    """Three days of linearly increasing revenue give exactly the step
    as the slope; a single-day month yields a null slope."""
    import os
    from datetime import datetime

    from flink_start_spark.plans import QUERIES

    rows = [
        (1, 1, "O", 10.0, datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 20.0, datetime(2024, 1, 2), "1-URGENT"),
        (3, 1, "O", 30.0, datetime(2024, 1, 3), "1-URGENT"),
        (4, 1, "O", 99.0, datetime(2024, 2, 10), "1-URGENT"),  # lone day
    ]
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(sf, "orders.parquet")
    )
    out = {
        r["order_month"]: r
        for r in QUERIES["monthly_revenue_trend"].spark(spark, sf).collect()
    }
    assert out[202401]["n_days"] == 3
    assert out[202401]["slope_cents_per_day"] == 1000.0  # +10.00/day in cents
    assert out[202402]["slope_cents_per_day"] is None


def test_last_touch_attribution_semantics(spark, tmp_path):
    """A purchase attributes to the most recent PRIOR non-purchase
    event; a purchase with no prior events attributes to 'none'; a
    prior purchase is skipped over."""
    import os

    from flink_start_spark.plans import QUERIES

    df = _events(
        spark,
        [
            (100, 1, "view", 0),
            (200, 1, "click", 0),
            (300, 1, "purchase", 0),   # -> click
            (400, 1, "purchase", 0),   # prior purchase skipped -> click
            (100, 2, "purchase", 0),   # first event -> none
            (150, 2, "error", 0),
            (250, 2, "purchase", 0),   # -> error
        ],
    )
    sf = str(tmp_path)
    df.write.parquet(os.path.join(sf, "events.parquet"))
    got = {
        r["attributed_type"]: r["n_purchases"]
        for r in QUERIES["last_touch_attribution"].spark(spark, sf).collect()
    }
    assert got == {"click": 2, "none": 1, "error": 1}


def test_three_step_funnel_ordering_constraint(spark, tmp_path):
    """A view BEFORE signup does not advance the funnel; each step must
    follow the previous one."""
    import os

    from flink_start_spark.plans import QUERIES

    df = _events(
        spark,
        [
            # u1: full ordered path
            (100, 1, "signup", 0), (200, 1, "view", 0), (300, 1, "purchase", 0),
            # u2: view happened BEFORE signup -> signup_only
            (100, 2, "view", 0), (200, 2, "signup", 0),
            # u3: purchase before the post-signup view -> viewed only
            (100, 3, "signup", 0), (150, 3, "purchase", 0), (200, 3, "view", 0),
            # u4: never signed up -> absent
            (100, 4, "view", 0), (200, 4, "purchase", 0),
        ],
    )
    sf = str(tmp_path)
    df.write.parquet(os.path.join(sf, "events.parquet"))
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["three_step_funnel"].spark(spark, sf).collect()
    }
    assert got == {"purchased": 1, "signup_only": 1, "viewed": 1}


def test_session_gap_compares_at_microsecond_precision(spark, tmp_path):
    """Regression: a whole-second gap cast floored sub-second fractions,
    so a 24h+0.4s gap (a new session at full precision) was missed."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 0, 0, 500000)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        # 24h + 0.4s later: strictly more than 24h -> new session
        (2, t0 + timedelta(hours=24, microseconds=400000), 1, "view", 1.0, "{}"),
        # 24h - 0.4s after THAT: same session
        (3, t0 + timedelta(hours=48), 1, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["user_session_stats"].spark(spark, str(tmp_path)).collect()
    assert out[0]["n_sessions"] == 2 and out[0]["n_events"] == 3


def test_words_tokenizer_matches_oracle_split_on_messy_whitespace(spark):
    """Regression class: Spark's \\s+ split diverged from every oracle's
    literal string_split(trim(text), ' ') on tabs / double spaces —
    the pairing must hold on arbitrary input, not just the single-
    spaced generated corpus."""
    import duckdb

    from pyspark.sql import functions as F

    from flink_start_spark.functions import texthash as TH

    texts = ["a  b", "x\ty", " lead trail ", "a b  c\t d", "solo", ""]
    got = [
        r["w"]
        for r in spark.createDataFrame([(t,) for t in texts], "t string")
        .select(TH.words(F.col("t")).alias("w"))
        .collect()
    ]
    con = duckdb.connect()
    for t, w in zip(texts, got):
        exp = con.execute("SELECT string_split(trim(?), ' ')", [t]).fetchone()[0]
        assert w == exp, (t, w, exp)
