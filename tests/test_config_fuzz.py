"""Config-fuzz gate subset: the IVF-family knob sweep in the default
pytest run (round-7 verdict item 5).

The full lane is `python scripts/fuzz_config.py SEED...` (sf0.1, 3
queries x random per_cell/super_probe per seed; seeds 1-8 = 24/24 at
round-8 HEAD). This pytest pins two fixed knob combinations per query
at sf0.01 so a regression in the knob plumbing (Spark operator arg vs
oracle-SQL literal drifting apart) fails the default gate — the knob
coverage breadth stays in the seeded script.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from crosscheck import _normalize  # noqa: E402

from flink_start_spark import cache  # noqa: E402
from flink_start_spark.operators import similarity as S  # noqa: E402
from flink_start_spark.plans.extensions import (  # noqa: E402
    _two_level_assign_fn,
    ann_topk_ivf_sql,
    knn_label_purity_sql,
    semdedup_flags_flat_sql,
    semdedup_flags_sql,
)
from flink_start_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'embeddings.parquet')}')"
    )
    return c


def _check(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o)
    pd.testing.assert_frame_equal(
        s, o, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("per_cell,super_probe", [(32, 1), (96, 3)])
def test_semdedup_knobs_mirror(spark, con, per_cell, super_probe):
    emb = load_table(spark, "embeddings", SF_DIR)
    try:
        sdf = S.semdedup_flags(
            emb,
            threshold=0.99,
            per_cell=per_cell,
            assign_fn=_two_level_assign_fn(super_probe),
        ).toPandas()
    finally:
        cache.release()
    _check(sdf, con.execute(semdedup_flags_sql(per_cell, super_probe)).df())


@pytest.mark.parametrize(
    "per_cell,super_probe,cell_probe", [(32, 1, 2), (96, 2, 3)]
)
def test_semdedup_cell_probe_knobs_mirror(
    spark, con, per_cell, super_probe, cell_probe
):
    # the round-8 recall dial through the TWO-LEVEL path: multi-probe
    # member ranking on the Spark side vs rk <= cell_probe in the
    # oracle's assigned CTE
    emb = load_table(spark, "embeddings", SF_DIR)
    try:
        sdf = S.semdedup_flags(
            emb,
            threshold=0.99,
            per_cell=per_cell,
            assign_fn=_two_level_assign_fn(super_probe, cell_probe),
        ).toPandas()
    finally:
        cache.release()
    _check(
        sdf,
        con.execute(
            semdedup_flags_sql(per_cell, super_probe, cell_probe)
        ).df(),
    )


@pytest.mark.parametrize("per_cell,cell_probe", [(32, 2), (128, 3)])
def test_semdedup_flat_cell_probe_knobs_mirror(spark, con, per_cell, cell_probe):
    # the same dial through the FLAT assignment path (assign_fn=None)
    emb = load_table(spark, "embeddings", SF_DIR)
    try:
        sdf = S.semdedup_flags(
            emb, threshold=0.99, per_cell=per_cell, cell_probe=cell_probe
        ).toPandas()
    finally:
        cache.release()
    _check(sdf, con.execute(semdedup_flags_flat_sql(per_cell, cell_probe)).df())


@pytest.mark.parametrize("per_cell,super_probe", [(32, 2), (128, 4)])
def test_knn_purity_knobs_mirror(spark, con, per_cell, super_probe):
    emb = load_table(spark, "embeddings", SF_DIR)
    try:
        sdf = S.knn_label_purity(
            emb,
            k=5,
            per_cell=per_cell,
            assign_fn=_two_level_assign_fn(super_probe),
        ).toPandas()
    finally:
        cache.release()
    _check(sdf, con.execute(knn_label_purity_sql(per_cell, super_probe)).df())


@pytest.mark.parametrize("per_cell,super_probe,cell_probe", [(48, 2, 2)])
def test_knn_purity_cell_probe_knobs_mirror(
    spark, con, per_cell, super_probe, cell_probe
):
    # multi-probe neighbor pool: pair dedup before top-k on both engines
    emb = load_table(spark, "embeddings", SF_DIR)
    try:
        sdf = S.knn_label_purity(
            emb,
            k=5,
            per_cell=per_cell,
            assign_fn=_two_level_assign_fn(super_probe, cell_probe),
        ).toPandas()
    finally:
        cache.release()
    _check(
        sdf,
        con.execute(
            knn_label_purity_sql(per_cell, super_probe, cell_probe)
        ).df(),
    )


@pytest.mark.parametrize("per_cell", [32, 250])
def test_ann_ivf_knobs_mirror(spark, con, per_cell):
    emb = load_table(spark, "embeddings", SF_DIR)
    try:
        sdf = S.ivf_topk(
            emb, emb.filter("vec_id < 10"), k=3, n_probe=2, per_cell=per_cell
        ).toPandas()
    finally:
        cache.release()
    _check(sdf, con.execute(ann_topk_ivf_sql(per_cell)).df())
