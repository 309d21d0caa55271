"""AQE skew-join splitting: SCALING.md's fact-fact join story says hot
keys "rely on AQE skew splitting" — this pins that the mechanism
actually engages on this engine's session config (adaptive enabled),
and that it changes the plan, not the answer.

The full-size measurement lives in scripts/skew_join_demo.py
(8M rows: 1.8x, 32M rows: 4.7x, recorded in SCALING.md); this test
scales the skew thresholds down with the fixture so it runs in
seconds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    # keep the second fact out of broadcast range so the join stays SMJ
    # (a broadcast join has no skewed shuffle to split)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_conf(spark):
    old = {}
    for k, v in _CONF.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _fixture(spark, n_fact=300_000, n_dim=50_000):
    keys = F.when(
        (F.crc32(F.col("id").cast("string")) % 10) < 9, F.lit(0).cast("long")
    ).otherwise(F.col("id") % n_dim)
    fact = spark.range(n_fact).select(
        keys.alias("k"), (F.col("id") % 1000).cast("double").alias("v")
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("p")
    )
    return fact, dim


def _run(spark, enabled: bool):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
    fact, dim = _fixture(spark)
    out = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    row = out.collect()[0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    return row, plan


def test_aqe_skew_join_splits_hot_partition(spark, skew_conf):
    row_on, plan_on = _run(spark, True)
    row_off, plan_off = _run(spark, False)
    # the split is a physical rewrite only: answers identical
    assert row_on == row_off
    assert row_on["n"] == 300_000  # unique dim keys: join preserves fact
    assert "SortMergeJoin" in plan_on
    assert "skew=true" in plan_on, plan_on[:800]
    assert "skew=true" not in plan_off
