"""Measure the two-phase selection against the naive hot-key window on
a skewed fixture big enough for the difference to show.

    python scripts/selection_scale_demo.py [n_rows] [hot_frac]

Generates n_rows (default 8M) events over a 5-value key with hot_frac
(default 0.9) of rows on one key, then times per-key exact median:
(a) row_number window partitioned by the key (single-reducer sort of
the hot key), (b) operators/selection.exact_rank_value. Also prints
each plan's max sort-partition shape. Results are recorded in
COVERAGE.md; this script reproduces them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.operators import selection as S
from flink_start_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark("selection-scale-demo")
    keys = F.when(
        (F.crc32(F.col("id").cast("string")) % 1000) < int(hot * 1000), F.lit("hot")
    ).otherwise(
        F.concat(F.lit("k"), (F.col("id") % 4).cast("string"))
    )
    df = (
        spark.range(n)
        .select(
            keys.alias("k"),
            (F.crc32(F.concat(F.lit("v"), F.col("id").cast("string"))) % 100000)
            .cast("double")
            .alias("v"),
            F.col("id").cast("string").alias("tid"),
        )
        .persist()
    )
    df.count()

    wo = Window.partitionBy("k").orderBy("v", "tid")
    wc = Window.partitionBy("k")
    naive = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_cnt", F.count("*").over(wc))
        .filter(F.col("_rn") == F.floor((F.col("_cnt") + 1) / 2))
        .select("k", F.col("v").alias("med"), "_cnt")
    )
    t0 = time.perf_counter()
    a = {r["k"]: (r["med"], r["_cnt"]) for r in naive.collect()}
    t_naive = time.perf_counter() - t0

    t0 = time.perf_counter()
    mine = S.exact_rank_value(df, ["k"], "v", out_col="med")
    b = {r["k"]: (r["med"], r["_gcnt"]) for r in mine.collect()}
    t_two = time.perf_counter() - t0
    C.release()

    assert a == b, "results diverge!"
    print(
        f"rows={n:,} hot_frac={hot}  naive_window={t_naive:.1f}s  "
        f"two_phase={t_two:.1f}s  speedup={t_naive / t_two:.1f}x  "
        f"(results identical: {len(a)} keys)"
    )


if __name__ == "__main__":
    main()
