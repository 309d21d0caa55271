"""Measure flat vs two-level IVF assignment at a corpus size where the
O(n * n_cells) flat scan is the bill.

    python scripts/assign_scale_demo.py [n_vectors] [dim] [per_cell]

Generates n deterministic unit-ish vectors (xxhash-derived components,
no RNG state), builds the md5-ranked quantizer at the auto cell count
max(16, n // per_cell), then times:

(a) operators/similarity.assign_cells_maponly — flat argmin over all
    n_cells centroids (O(n * n_cells) distance work);
(b) operators/similarity.assign_cells_two_level — nearest of
    ~sqrt(n_cells) super-centroids, then argmin within that super-cell
    (O(n * 2*sqrt(n_cells)) work, approximate near super boundaries).

Also reports the assignment agreement fraction (the recall face of the
dial). Results are recorded in SCALING.md; this script reproduces
them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_start_spark.operators import similarity as S
from flink_start_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    per_cell = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    spark = get_spark("assign-scale-demo")

    n_cells = max(16, n // per_cell)
    # CLUSTERED fixture (the regime IVF exists for — and the fair one
    # for the agreement number, since isotropic-random vectors sit on
    # cell boundaries by construction): each vector = one of ~n_cells
    # xxhash-derived anchors + 10% amplitude noise.
    anchor = F.pmod(F.xxhash64(F.col("id")), F.lit(n_cells))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            (F.pmod(F.xxhash64(anchor, d), F.lit(2001)) - F.lit(1000))
            / F.lit(1000.0)
            + (F.pmod(F.xxhash64(F.col("id"), d, F.lit(1)), F.lit(2001)) - F.lit(1000))
            / F.lit(10000.0)
        ),
    )
    emb = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint()  # freeze the fixture out of both timings
    )
    cents = S.deterministic_centroids(emb, n_cells=n_cells)
    cents = cents.localCheckpoint()  # quantizer build excluded too

    def timed(label, build):
        # time the MATERIALIZATION (localCheckpoint is eager) — a
        # count() of an already-checkpointed frame times nothing
        t0 = time.monotonic()
        df = build().localCheckpoint()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.2f}s ({df.count()} rows)")
        return dt, df

    t_flat, flat = timed(
        f"flat argmin over {n_cells} cells",
        lambda: S.assign_cells_maponly(emb, cents),
    )
    t_two, two = timed(
        "two-level (sqrt supers + members)",
        lambda: S.assign_cells_two_level(emb, cents),
    )
    t_p2, two_p2 = timed(
        "two-level super_probe=2",
        lambda: S.assign_cells_two_level(emb, cents, super_probe=2),
    )

    def agreement(df):
        return (
            flat.select("vec_id", F.col("cell").alias("a"))
            .join(df.select("vec_id", F.col("cell").alias("b")), "vec_id")
            .select(F.avg((F.col("a") == F.col("b")).cast("double")).alias("x"))
            .first()["x"]
        )

    print(
        f"n={n} dim={dim} n_cells={n_cells}: flat {t_flat:.2f}s; "
        f"two-level p=1 {t_two:.2f}s ({t_flat / max(t_two, 1e-9):.1f}x, "
        f"agreement {agreement(two):.4f}); "
        f"p=2 {t_p2:.2f}s ({t_flat / max(t_p2, 1e-9):.1f}x, "
        f"agreement {agreement(two_p2):.4f})"
    )


if __name__ == "__main__":
    main()
