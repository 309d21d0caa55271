"""Demonstrate (and measure) AQE skew-join splitting on a fact-fact
join — the evidence behind SCALING.md's "fact-fact joins shuffle on
their natural keys and rely on AQE skew splitting".

    python scripts/skew_join_demo.py [n_fact] [n_dim] [hot_frac]

Generates a fact table of n_fact rows (default 8M) with hot_frac
(default 0.9) of rows on ONE join key, and a non-broadcastable second
fact of n_dim distinct keys (default 4M, wide payload so AQE cannot
flip it to broadcast). Times the sort-merge join + aggregate with
`spark.sql.adaptive.skewJoin.enabled` off vs on, and verifies the
skew-split actually happened by checking the AQE final plan for
`skew=true` on the SortMergeJoin.

The skew thresholds are scaled DOWN to the fixture
(skewedPartitionThresholdInBytes=32m, advisoryPartitionSizeInBytes=16m;
cluster defaults are 256m/64m): locally a 90%-hot 8M-row partition is
~200 MB, below the production threshold by design — the same ratio of
hot-partition to advisory size a 100 TB run would present at defaults.
Results recorded in SCALING.md; this script reproduces them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_start_spark.session import get_spark

SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


def build(spark, n_fact: int, n_dim: int, hot: float):
    keys = F.when(
        (F.crc32(F.col("id").cast("string")) % 1000) < int(hot * 1000),
        F.lit(0).cast("long"),
    ).otherwise(F.col("id") % n_dim)
    fact = (
        spark.range(n_fact)
        .select(
            keys.alias("k"),
            (F.crc32(F.concat(F.lit("v"), F.col("id").cast("string"))) % 100000)
            .cast("double")
            .alias("v"),
        )
        .persist()
    )
    # distinct-key second fact, wide enough that AQE keeps the SMJ
    # (a broadcast would hide the skew question entirely)
    dim = (
        spark.range(n_dim)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))).alias("p"),
        )
        .persist()
    )
    fact.count(), dim.count()
    return fact, dim


def run_once(spark, fact, dim, skew_enabled: bool):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
    joined = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    t0 = time.perf_counter()
    row = joined.collect()[0]
    dt = time.perf_counter() - t0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return dt, row, ("skew=true" in plan)


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    hot = float(sys.argv[3]) if len(sys.argv) > 3 else 0.9
    spark = get_spark("skew-join-demo")
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    fact, dim = build(spark, n_fact, n_dim, hot)

    results = {}
    for enabled in (False, True, False, True):  # interleave, keep min
        dt, row, split = run_once(spark, fact, dim, enabled)
        key = "skew_on" if enabled else "skew_off"
        if key not in results or dt < results[key][0]:
            results[key] = (dt, row, split)
        print(f"skewJoin={enabled}: {dt:.2f}s skew-split-in-plan={split} {row}")

    off, on = results["skew_off"], results["skew_on"]
    assert off[1] == on[1], "answers must match"  # same (n, sum)
    assert not off[2], "split must not appear with the flag off"
    assert on[2], "AQE must mark the SMJ skew=true with the flag on"
    print(
        f"\nmin skew_off={off[0]:.2f}s  min skew_on={on[0]:.2f}s  "
        f"speedup={off[0] / on[0]:.2f}x  rows={on[1]['n']}"
    )


if __name__ == "__main__":
    main()
