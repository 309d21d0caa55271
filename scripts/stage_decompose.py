"""Stage-level decomposition of the heaviest catalog queries (round-10
optimization measurement, guide §1): time each pipeline stage through
the same noop sink the bench uses, so the optimization targets the
stage that actually dominates, not the one that looks expensive.

    python scripts/stage_decompose.py [sf_dir]

Each stage is labelled with setJobDescription; timings are min-of-N
like bench.py. Caches released between stages (cache-ownership
contract).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.functions import vector as V
from flink_start_spark.operators import similarity as S
from flink_start_spark.session import get_spark
from flink_start_spark.sources.catalog import load_table

RUNS = 3


def timed(spark, label, build):
    best = None
    for _ in range(RUNS):
        C.release()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    C.release()
    spark.catalog.clearCache()
    print(f"{label:55s} {best:7.3f}s")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stage_decompose")
    # warm-up: one full query + python worker pool
    from flink_start_spark.plans import QUERIES

    QUERIES["semdedup_flags"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    C.release()
    spark.catalog.clearCache()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from flink_start_spark.plans.extensions import (
        CATALOG_PER_CELL,
        SEMDEDUP_AUDIT_SAMPLE,
        _two_level_assign_fn,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    print(f"embeddings rows: {n}")

    # --- semdedup family ------------------------------------------------
    def assign_only():
        assigned, _ = S.precompute_cells(
            emb, None, "vec_id", "embedding", CATALOG_PER_CELL,
            _two_level_assign_fn(),
        )
        return assigned

    timed(spark, "semdedup: two-level assignment only", assign_only)

    def flags_full():
        return S.semdedup_flags(
            emb, threshold=0.8, per_cell=CATALOG_PER_CELL,
            assign_fn=_two_level_assign_fn(),
        )

    timed(spark, "semdedup_flags full (0.8)", flags_full)

    def audit_exact_only():
        smp = (
            emb.select(
                F.md5(F.concat(F.lit("sda|"), F.col("vec_id").cast("string"))).alias("_h"),
                "vec_id",
                "embedding",
            )
            .orderBy("_h", "vec_id")
            .limit(SEMDEDUP_AUDIT_SAMPLE)
            .select(F.col("vec_id").alias("s_id"), F.col("embedding").alias("s_vec"))
        )
        smp = C.track(smp)
        return (
            emb.join(F.broadcast(smp), F.col("vec_id") < F.col("s_id"))
            .groupBy("s_id")
            .agg(F.max(F.round(V.cosine(F.col("s_vec"), F.col("embedding")), 6)).alias("_mx"))
        )

    timed(spark, "audit exact stage (V.cosine per pair)", audit_exact_only)

    def audit_exact_prenorm():
        smp = (
            emb.select(
                F.md5(F.concat(F.lit("sda|"), F.col("vec_id").cast("string"))).alias("_h"),
                "vec_id",
                "embedding",
            )
            .orderBy("_h", "vec_id")
            .limit(SEMDEDUP_AUDIT_SAMPLE)
            .select(
                F.col("vec_id").alias("s_id"),
                F.col("embedding").alias("s_vec"),
                V.norm(F.col("embedding")).alias("s_n"),
            )
        )
        smp = C.track(smp)
        big = emb.select("vec_id", "embedding", V.norm(F.col("embedding")).alias("e_n"))
        den = F.col("s_n") * F.col("e_n")
        cosv = F.when(den != 0.0, V.dot(F.col("s_vec"), F.col("embedding")) / den)
        return (
            big.join(F.broadcast(smp), F.col("vec_id") < F.col("s_id"))
            .groupBy("s_id")
            .agg(F.max(F.round(cosv, 6)).alias("_mx"))
        )

    timed(spark, "audit exact stage (precomputed norms)", audit_exact_prenorm)

    def audit_exact_packed():
        # pack the sample into ONE broadcast row; per corpus row compute
        # the (s_id, cos) list in a transform lambda (prenormed dot),
        # keep only s_id > vec_id, explode, partial-max aggregate.
        smp = (
            emb.select(
                F.md5(F.concat(F.lit("sda|"), F.col("vec_id").cast("string"))).alias("_h"),
                "vec_id",
                "embedding",
            )
            .orderBy("_h", "vec_id")
            .limit(SEMDEDUP_AUDIT_SAMPLE)
            .select(
                F.col("vec_id").alias("s_id"),
                F.col("embedding").alias("s_vec"),
                V.norm(F.col("embedding")).alias("s_n"),
            )
        )
        packed = smp.agg(
            F.array_sort(F.collect_list(F.struct("s_id", "s_vec", "s_n"))).alias("_smp")
        )
        big = emb.select("vec_id", "embedding", V.norm(F.col("embedding")).alias("e_n"))
        scored = F.filter(
            F.transform(
                F.col("_smp"),
                lambda s: F.struct(
                    s["s_id"].alias("s_id"),
                    F.when(
                        (s["s_n"] * F.col("e_n")) != 0.0,
                        V.dot(s["s_vec"], F.col("embedding")) / (s["s_n"] * F.col("e_n")),
                    ).alias("cos"),
                ),
            ),
            lambda st: st["s_id"] > F.col("vec_id"),
        )
        return (
            big.crossJoin(F.broadcast(packed))
            .select(F.explode(scored).alias("_p"))
            .groupBy(F.col("_p")["s_id"].alias("s_id"))
            .agg(F.max(F.round(F.col("_p")["cos"], 6)).alias("_mx"))
        )

    timed(spark, "audit exact stage (packed transform)", audit_exact_packed)

    # --- embedding_lsh_recall_audit exact stage ---------------------------
    from flink_start_spark.plans.extensions import (
        EMB_LSH_AUDIT_SAMPLE,
        EMB_LSH_AUDIT_THRESHOLD,
    )

    thr = EMB_LSH_AUDIT_THRESHOLD

    def ela_smp():
        return (
            emb.select(
                F.md5(F.concat(F.lit("ela|"), F.col("vec_id").cast("string"))).alias("_h"),
                "vec_id",
                "embedding",
            )
            .orderBy("_h", "vec_id")
            .limit(EMB_LSH_AUDIT_SAMPLE)
            .select(F.col("vec_id").alias("s_id"), F.col("embedding").alias("s_vec"))
        )

    def ela_exact_current():
        smp = C.track(ela_smp())
        return (
            emb.join(F.broadcast(smp), F.col("vec_id") != F.col("s_id"))
            .select(
                F.least("vec_id", "s_id").alias("id_a"),
                F.greatest("vec_id", "s_id").alias("id_b"),
                F.round(V.cosine(F.col("s_vec"), F.col("embedding")), 6).alias("cos"),
            )
            .filter(F.col("cos") >= thr)
            .distinct()
        )

    timed(spark, "ela exact stage (current V.cosine)", ela_exact_current)

    def ela_exact_packed():
        smp = ela_smp().select(
            "s_id", "s_vec", V.norm(F.col("s_vec")).alias("s_n")
        )
        packed = smp.agg(
            F.array_sort(F.collect_list(F.struct("s_id", "s_vec", "s_n"))).alias("_smp")
        )
        big = emb.select("vec_id", "embedding", V.norm(F.col("embedding")).alias("e_n"))
        scored = F.filter(
            F.transform(
                F.col("_smp"),
                lambda s: F.struct(
                    s["s_id"].alias("s_id"),
                    F.round(
                        F.when(
                            (s["s_n"] * F.col("e_n")) != 0.0,
                            V.dot(s["s_vec"], F.col("embedding"))
                            / (s["s_n"] * F.col("e_n")),
                        ),
                        6,
                    ).alias("cos"),
                ),
            ),
            lambda st: (st["s_id"] != F.col("vec_id")) & (st["cos"] >= thr),
        )
        return (
            big.crossJoin(F.broadcast(packed))
            .select(F.col("vec_id"), F.explode(scored).alias("_p"))
            .select(
                F.least(F.col("vec_id"), F.col("_p")["s_id"]).alias("id_a"),
                F.greatest(F.col("vec_id"), F.col("_p")["s_id"]).alias("id_b"),
                F.col("_p")["cos"].alias("cos"),
            )
            .distinct()
        )

    timed(spark, "ela exact stage (packed transform)", ela_exact_packed)

    # --- knn_label_purity -----------------------------------------------
    def knn_full():
        return S.knn_label_purity(
            emb, per_cell=CATALOG_PER_CELL, assign_fn=_two_level_assign_fn(),
        )

    timed(spark, "knn_label_purity full", knn_full)

    # --- embedding_near_dup_lsh (pipeline inside ela audit) ---------------
    from flink_start_spark.plans import QUERIES

    timed(
        spark,
        "embedding_near_dup_lsh full",
        lambda: QUERIES["embedding_near_dup_lsh"].spark(spark, sf_dir),
    )

    spark.stop()


if __name__ == "__main__":
    main()
