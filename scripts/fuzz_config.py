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

Round 9 adds the LSH corpus-size ladders (functions/lsh_scale.py) —
base/step/target_occ overridden so small corpora hit levels > 0, the
branches the driver SFs never reach:

  - minhash_lsh_scaled   word-family MinHash over a 1-in-5 doc_id sample
                         (keeps level-2 signature cost bounded); step in
                         {2, 4, 8}, base drawn to land the sampled count
                         on ladder level 1 (p=0.8) or 2 (p=0.2)
  - char_lsh_scaled      char-gram family, same sampling and level draw
  - sign_lsh_scaled      embedding sign-LSH; target_occ in [1, 64]
                         log-uniform sweeps levels (2,8) .. (5,12)

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
from pyspark.sql import functions as F

from crosscheck import _normalize
from flink_start_spark import cache
from flink_start_spark.functions import lsh_scale as LS
from flink_start_spark.operators import dedup as D
from flink_start_spark.operators import similarity as S
from flink_start_spark.plans.extensions import (
    _two_level_assign_fn,
    ann_topk_ivf_sql,
    embedding_near_dup_sql,
    knn_label_purity_sql,
    semdedup_flags_flat_sql,
    semdedup_flags_sql,
)
from flink_start_spark.session import get_spark
from flink_start_spark.sources.catalog import load_table

#: 1-in-N doc_id sample for the md5-ladder cases: level-2 word params
#: are 8 rows x 16 bands = 128 hashes, and running that over the full
#: 5k-doc sf0.1 corpus per fuzz case would dominate the lane's budget.
_DOC_SAMPLE_MOD = 5


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
    for fam in ("minhash_lsh_scaled", "char_lsh_scaled"):
        step = rng.choice([2, 4, 8])
        yield (
            fam,
            {
                "step": step,
                "lvl_target": 2 if rng.random() < 0.2 else 1,
                "k_div": rng.randint(1, step),  # base = n // (step^lvl * k_div)
                "rem": rng.randrange(_DOC_SAMPLE_MOD),
            },
        )
    import math

    yield (
        "sign_lsh_scaled",
        {
            "target_occ": int(round(math.exp(rng.uniform(0.0, math.log(64))))),
            "dim": 64,
            "min_bits": 8,
        },
    )
    # rp-region draw: a small coordinate budget (dim) + narrow min_bits
    # makes the ladder exhaust its coordinate levels well under the
    # sf0.01 corpus size, so the RANDOM-PROJECTION levels (rp=1 branch
    # of the staircase, md5-weight keys) fire and get Spark/DuckDB
    # hash-checked — unreachable at the shipped dim=64 below ~32k
    # vectors (round-10 ladder handoff).
    yield (
        "sign_lsh_scaled",
        {
            "target_occ": rng.randint(1, 4),
            "dim": rng.choice([8, 16]),
            "min_bits": 2,
        },
    )


def _md5_case_params(spark, sf_dir: str, name: str, knobs: dict):
    """Resolve a md5-ladder case: sampled doc relation, the base that
    lands its count on the drawn ladder level, and the (num_hashes,
    bands) the Python rule yields there. The oracle recomputes the
    level from its own count(*) scalar subquery at the same base —
    staircase parity is the thing under test."""
    docs = load_table(spark, "documents", sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(_DOC_SAMPLE_MOD)) == knobs["rem"]
    )
    n_s = docs.count()
    step, lvl = knobs["step"], knobs["lvl_target"]
    base = max(1, n_s // (step ** lvl * knobs["k_div"]))
    fam = "word" if name == "minhash_lsh_scaled" else "char"
    params = LS.minhash_params if fam == "word" else LS.char_minhash_params
    nh, nb = params(n_s, base=base, step=step)
    return docs, base, step, fam, nh, nb


def _md5_case_oracle(name: str, knobs: dict, base: int, step: int) -> str:
    fam = "word" if name == "minhash_lsh_scaled" else "char"
    where = f"doc_id % {_DOC_SAMPLE_MOD} = {knobs['rem']}"
    cnt = f"SELECT count(*) FROM documents WHERE {where}"
    bcte = LS.minhash_band_ctes(
        cnt, family=fam, src=("shd" if fam == "word" else "cg"),
        elem_col=("shingles" if fam == "word" else "grams"),
        base=base, step=step,
    )
    if fam == "word":
        src_ctes = f"""
    docs AS (SELECT doc_id, string_split(trim(text), ' ') AS w
             FROM documents WHERE {where}),
    sh AS (SELECT doc_id,
      CASE WHEN len(w) >= 3
           THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]
           ELSE [array_to_string(w, ' ')] END AS shingles
      FROM docs),
    shd AS (SELECT doc_id, list_distinct(shingles) AS sh, shingles FROM sh)"""
        confirm = """
    SELECT id_a, id_b,
           round(len(list_intersect(x.sh, y.sh))::DOUBLE /
                 (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))::DOUBLE, 6) AS jaccard
    FROM cand JOIN shd x ON x.doc_id = id_a JOIN shd y ON y.doc_id = id_b
    WHERE jaccard >= 0.5"""
    else:
        src_ctes = f"""
    cg AS (SELECT doc_id,
             list_distinct([substr(text, i, 8) FOR i IN range(1, length(text) - 6)]) AS grams
           FROM documents WHERE length(text) >= 8 AND {where})"""
        confirm = """
    SELECT id_a, id_b,
           round(len(list_intersect(x.grams, y.grams))::DOUBLE /
                 (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams)))::DOUBLE, 6) AS jaccard
    FROM cand JOIN cg x ON x.doc_id = id_a JOIN cg y ON y.doc_id = id_b
    WHERE jaccard >= 0.5"""
    return f"""
    WITH {src_ctes.strip()},
    {bcte},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
    {confirm}"""


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


def _run_scaled_case(spark, sf_dir: str, name: str, knobs: dict):
    """Round-9 ladder cases: returns (spark_frame, oracle_sql) — the
    two sides share the derived base/step/target_occ literals while
    each recomputes the LEVEL independently (Python rule vs SQL
    staircase over count(*))."""
    try:
        if name == "sign_lsh_scaled":
            emb = load_table(spark, "embeddings", sf_dir)
            dim, min_bits = knobs.get("dim", 64), knobs.get("min_bits", 8)
            bands, bits, rp = LS.sign_params(
                emb.count(), dim=dim, target_occ=knobs["target_occ"], min_bits=min_bits
            )
            sdf = S.lsh_near_dup_pairs(
                emb,
                threshold=0.4,
                bands=bands,
                bits=bits,
                dim=dim,
                key="rp" if rp else "coord",
            ).toPandas()
            return sdf, embedding_near_dup_sql(
                target_occ=knobs["target_occ"], dim=dim, min_bits=min_bits
            )
        docs, base, step, fam, nh, nb = _md5_case_params(spark, sf_dir, name, knobs)
        if fam == "word":
            sdf = D.minhash_near_dups(
                docs, "text", "doc_id", threshold=0.5, num_hashes=nh, bands=nb
            ).toPandas()
        else:
            sdf = D.char_ngram_near_dups(
                docs, "text", "doc_id", threshold=0.5, num_hashes=nh, bands=nb
            ).toPandas()
        return sdf, _md5_case_oracle(name, knobs, base, step)
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
    doc_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(doc_path):
        doc_path = os.path.join(doc_path, "*.parquet")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{doc_path}')"
    )
    failures = 0
    n = 0
    for seed in seeds:
        for name, knobs in _cases(seed):
            n += 1
            label = f"seed={seed} {name} {knobs}"
            try:
                if name.endswith("_lsh_scaled"):
                    sdf, osql = _run_scaled_case(spark, sf_dir, name, knobs)
                else:
                    sdf, osql = _run_spark(spark, sf_dir, name, knobs), _oracle_sql(name, knobs)
                odf = con.execute(osql).df()
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
