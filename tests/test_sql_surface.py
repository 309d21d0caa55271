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
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


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
