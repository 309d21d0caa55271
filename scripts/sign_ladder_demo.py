"""Measure the sign-LSH ladder's random-projection handoff at a corpus
size where the round-9 coordinate terminal (5, 12) saturates.

    python scripts/sign_ladder_demo.py [n_vectors] [n_planted] [--baseline-prev]

``--baseline-prev`` compares the fired level against the PREVIOUS
ladder level instead of the (5, 12) coordinate terminal and writes
SIGN_LADDER_DEMO_DEEP.json — the level-over-level proof that each rp
step stays sub-quadratic where the prior width saturates (e.g. at
600k vectors the fired (11, 18) vs the one-step-short (9, 16)).

Round-9 verdict item 1: past bands*bits <= dim the coordinate basis is
exhausted — at 200k vectors the terminal (5, 12) width reads expected
occupancy ~49/bucket and the candidate join re-saturates (candidates
~ bands * N * occ / 2, the quadratic shape the ladder exists to kill).
Round 10 coded the handoff: lsh_scale.sign_schedule_full continues on
random-projection sign bits (quantized int64 matmul keys against
md5-derived hyperplanes, operators/similarity._rp_keyed), band counts
holding the cos-0.95 design recall at ~0.8 per level.

This demo builds a 200k x 64 corpus (seeded numpy, persisted under
.localdata/rp_demo so reruns are stable) with n_planted cos~0.95
near-dup pairs, then for BOTH configurations —

(a) forced coordinate (5, 12): the round-9 clamp terminal;
(b) the fired ladder level at n (auto: (9, 16) rp at 200k) —

measures candidate-pair count, end-to-end wall time through the noop
sink (never count(): Catalyst eliminates unreferenced left joins), and
planted-pair recall. Writes one JSON line + SIGN_LADDER_DEMO.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.functions import lsh_scale as LS
from flink_start_spark.functions import vector as V
from flink_start_spark.operators import similarity as S
from flink_start_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(spark, n: int, n_planted: int):
    """Seeded 64-dim unit vectors; ids [n, n + n_planted) are cos~0.95
    near-dups of ids [0, n_planted). Persisted parquet so the demo is
    rerunnable without regeneration cost."""
    path = os.path.join(REPO, ".localdata", f"rp_demo_{n}_{n_planted}")
    if not os.path.isdir(path):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(191)
        X = rng.standard_normal((n, 64))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        Y = X[:n_planted] + 0.041 * rng.standard_normal((n_planted, 64))
        Y /= np.linalg.norm(Y, axis=1, keepdims=True)
        A = np.vstack([X, Y])
        pdf = pd.DataFrame(
            {"vec_id": range(len(A)), "embedding": [x.tolist() for x in A]}
        )
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _candidates(keyed, bands: int) -> int:
    """Candidate-pair count for a keyed (id, band0..) relation — the
    same stack + self-join the operator plans."""
    pairs = ", ".join(f"{b}, band{b}" for b in range(bands))
    stacked = keyed.selectExpr("vec_id", f"stack({bands}, {pairs}) AS (band, key)")
    a, b = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )


def _run(df, n: int, n_planted: int, bands: int, bits: int, key: str) -> dict:
    t0 = time.time()
    out = S.lsh_near_dup_pairs(df, threshold=0.4, bands=bands, bits=bits, key=key)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # planted recall: pair (i, n+i) present with cosine >= threshold
    hits = (
        out.filter((F.col("id_b") >= n) & (F.col("id_a") == F.col("id_b") - n))
        .count()
    )
    keyed = (
        S._rp_keyed(df, bands, bits, 64, "vec_id", "embedding")
        if key == "rp"
        else df.select(
            "vec_id",
            *[
                V.sign_bits(F.col("embedding"), bits, offset=b * bits).alias(f"band{b}")
                for b in range(bands)
            ],
        )
    )
    keyed = C.track(keyed)
    cand = _candidates(keyed, bands)
    C.release()
    return {
        "bands": bands,
        "bits": bits,
        "key": key,
        "wall_sec": round(wall, 2),
        "candidates": cand,
        "planted_recall": round(hits / n_planted, 4),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    baseline = "prev" if "--baseline-prev" in sys.argv[1:] else "coord"
    n = int(args[0]) if args else 200_000
    n_planted = int(args[1]) if len(args) > 1 else 1_000
    spark = get_spark("sign-ladder-demo")
    df = _corpus(spark, n, n_planted)
    total = n + n_planted

    lvl = LS.sign_level(total)
    sched = LS.sign_schedule_full()
    ab, abits, arp = sched[lvl]
    if baseline == "prev":
        # level-over-level proof: the PREVIOUS ladder level is the
        # counterfactual "staircase stopped one step short" — shows each
        # rp step keeps candidates ~linear where the prior width's
        # occupancy has passed the target (vs the coord baseline, which
        # only proves the handoff point itself)
        pb, pbits, prp = sched[max(lvl - 1, 0)]
        base_run = _run(df, n, n_planted, pb, pbits, "rp" if prp else "coord")
        base_key, out_name = "prev_level", "SIGN_LADDER_DEMO_DEEP.json"
    else:
        base_run = _run(df, n, n_planted, 5, 12, "coord")
        base_key, out_name = "coord_terminal", "SIGN_LADDER_DEMO.json"
    results = {
        "n_vectors": total,
        base_key: base_run,
        "fired_ladder": _run(df, n, n_planted, ab, abits, "rp" if arp else "coord"),
    }
    results["candidate_ratio"] = round(
        results[base_key]["candidates"]
        / max(results["fired_ladder"]["candidates"], 1),
        2,
    )
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
