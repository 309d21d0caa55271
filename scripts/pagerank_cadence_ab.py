"""Round-11 A/B: PageRank materialization cadence (verdict item 1).

Times q_pagerank_copurchase's pipeline at sf0.1 with checkpoint_every
in {1 per-round, 2 every-other, 0 lazy chain}, interleaved A/B/C so
host drift cancels, through the same noop sink as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_start_spark import cache
from flink_start_spark.operators.graph import copurchase_edges, pagerank
from flink_start_spark.plans.catalog import QUERIES
from flink_start_spark.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, k: int) -> float:
    from flink_start_spark.plans.tpch import load_table

    t0 = time.perf_counter()
    li = load_table(spark, "lineitem", SF_DIR)
    ranks = pagerank(
        copurchase_edges(li), n_iter=5, all_nodes_receive=True,
        checkpoint_every=k,
    ).select(F.col("id").alias("part_id"), F.col("rank").alias("rank_scaled"))
    ranks.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    cache.release()
    spark.catalog.clearCache()
    return dt


def main() -> None:
    spark = get_spark("pagerank_cadence_ab")
    # warm-up (codegen, python pool not needed here)
    run_once(spark, 1)
    res: dict[str, list[float]] = {"k1": [], "k2": [], "k0": []}
    for _ in range(3):
        res["k1"].append(run_once(spark, 1))
        res["k2"].append(run_once(spark, 2))
        res["k0"].append(run_once(spark, 0))
    out = {
        name: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]}
        for name, v in res.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
