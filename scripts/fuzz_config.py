"""Seeded CONFIG fuzz for the IVF-family knobs (round-7 verdict item 5).

The corpus fuzzer (fuzz_corpus.py) randomizes data shape; this lane
randomizes CONFIGURATION shape — the knobs the round-7/8 surface added:
``per_cell`` (the cell-density budget behind auto_n_cells) and
``super_probe`` (the two-level coarse quantizer's nprobe). Per seed it
draws independent knobs per query and runs BOTH engines at the same
literals:

  - semdedup_flags       per_cell in [32, 4000] log-uniform, super_probe in [1, 4],
                         cell_probe in [1, 3] (multi-assignment recall dial, round 8)
  - semdedup_flags_flat  per_cell in [32, 4000] log-uniform, cell_probe in [1, 3]
                         (flat assignment path: assign_fn=None + cell_probe)
  - knn_label_purity     per_cell in [32, 4000] log-uniform, super_probe in [1, 4],
                         cell_probe in [1, 3]
  - ann_topk_ivf         per_cell in [32, 4000] log-uniform (flat assignment)

Spark runs the operator with the drawn knobs (two-level assign_fn for
the pair-stage instances, exactly like the shipped catalog entries);
DuckDB runs the corresponding SQL builder (semdedup_flags_sql /
knn_label_purity_sql / ann_topk_ivf_sql) at the same literals. Compare
= crosscheck's order-insensitive frame equality.

Usage:
    python scripts/fuzz_config.py SEED [SEED ...] [--sf-dir DIR]

Default sf dir is sf0.1 (2000 vectors) — at sf0.01's 500 vectors every
per_cell >= 32 collapses to the same 16-cell layout and the knob sweep
would exercise nothing.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import pandas as pd

from crosscheck import _normalize
from flink_start_spark import cache
from flink_start_spark.operators import similarity as S
from flink_start_spark.plans.extensions import (
    _two_level_assign_fn,
    ann_topk_ivf_sql,
    knn_label_purity_sql,
    semdedup_flags_flat_sql,
    semdedup_flags_sql,
)
from flink_start_spark.session import get_spark
from flink_start_spark.sources.catalog import load_table


def _draw_per_cell(rng: random.Random) -> int:
    # log-uniform over [32, 4000]: half the draws land below ~360, so
    # small-cell (many-cell) layouts — where the two-level tree has
    # real depth — get as much coverage as the large-cell tail
    import math

    return int(round(math.exp(rng.uniform(math.log(32), math.log(4000)))))


def _cases(seed: int):
    rng = random.Random(seed)
    yield (
        "semdedup_flags",
        {
            "per_cell": _draw_per_cell(rng),
            "super_probe": rng.randint(1, 4),
            "cell_probe": rng.randint(1, 3),
        },
    )
    yield (
        "semdedup_flags_flat",
        {"per_cell": _draw_per_cell(rng), "cell_probe": rng.randint(1, 3)},
    )
    yield (
        "knn_label_purity",
        {
            "per_cell": _draw_per_cell(rng),
            "super_probe": rng.randint(1, 4),
            "cell_probe": rng.randint(1, 3),
        },
    )
    yield ("ann_topk_ivf", {"per_cell": _draw_per_cell(rng)})


def _run_spark(spark, sf_dir: str, name: str, knobs: dict) -> pd.DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    try:
        if name == "semdedup_flags":
            df = S.semdedup_flags(
                emb,
                threshold=0.99,
                per_cell=knobs["per_cell"],
                assign_fn=_two_level_assign_fn(
                    knobs["super_probe"], knobs["cell_probe"]
                ),
            )
        elif name == "semdedup_flags_flat":
            df = S.semdedup_flags(
                emb,
                threshold=0.99,
                per_cell=knobs["per_cell"],
                cell_probe=knobs["cell_probe"],
            )
        elif name == "knn_label_purity":
            df = S.knn_label_purity(
                emb,
                k=5,
                per_cell=knobs["per_cell"],
                assign_fn=_two_level_assign_fn(
                    knobs["super_probe"], knobs["cell_probe"]
                ),
            )
        else:
            df = S.ivf_topk(
                emb,
                emb.filter("vec_id < 10"),
                k=3,
                n_probe=2,
                per_cell=knobs["per_cell"],
            )
        return df.toPandas()
    finally:
        cache.release()


def _oracle_sql(name: str, knobs: dict) -> str:
    if name == "semdedup_flags":
        return semdedup_flags_sql(
            knobs["per_cell"], knobs["super_probe"], knobs["cell_probe"]
        )
    if name == "semdedup_flags_flat":
        return semdedup_flags_flat_sql(knobs["per_cell"], knobs["cell_probe"])
    if name == "knn_label_purity":
        return knn_label_purity_sql(
            knobs["per_cell"], knobs["super_probe"], knobs["cell_probe"]
        )
    return ann_topk_ivf_sql(knobs["per_cell"])


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    seeds = [int(a) for a in argv] or [1]
    spark = get_spark("fuzz_config")
    con = duckdb.connect()
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(emb_path):
        # Spark-written table (the synthesized sf1 corpus): a directory
        # of part files rather than one parquet file — same handling as
        # crosscheck.py
        emb_path = os.path.join(emb_path, "*.parquet")
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{emb_path}')"
    )
    failures = 0
    n = 0
    for seed in seeds:
        for name, knobs in _cases(seed):
            n += 1
            label = f"seed={seed} {name} {knobs}"
            try:
                sdf = _run_spark(spark, sf_dir, name, knobs)
                odf = con.execute(_oracle_sql(name, knobs)).df()
                s, o = _normalize(sdf), _normalize(odf)
                assert list(s.columns) == list(o.columns), (
                    f"columns {list(s.columns)} vs {list(o.columns)}"
                )
                assert len(s) == len(o), f"rows {len(s)} vs {len(o)}"
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
                )
                print(f"OK   {label}: {len(s)} rows")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {label}: {str(e)[:400]}")
                failures += 1
    print(f"\n{n - failures}/{n} config cases passed over seeds {seeds}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
