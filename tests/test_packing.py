"""Per-document sequence-pack layout: exact python mirror (the operator
is pure integer arithmetic, so the mirror is the spec), degenerate
inputs, the scale-shape guarantee that the prefix sum never plans a
global sort task, and the catalog's duplicate-name guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.operators import packing as P

from tests.test_plan_quality import _window_specs

WINDOW = 100


def py_pack(lens: dict[int, int], window: int):
    out, start = {}, 0
    for i in sorted(lens):
        n = lens[i]
        pack = start // window
        end_pack = (start + n - 1) // window if n > 0 else pack
        out[i] = (n, start, pack, start % window, end_pack)
        start += n
    return out


def test_sequence_pack_mirrors_python(spark):
    lens = {i: (i * 37) % 90 for i in range(1, 200)}
    lens[50] = 0  # zero-length doc pins to its offset's pack
    lens[51] = 250  # longer than the window: spans >= 3 packs
    df = spark.createDataFrame(
        [(k, v) for k, v in lens.items()], "doc_id long, n long"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["pack_id"],
            r["offset_in_pack"], r["end_pack_id"],
        )
        for r in P.sequence_pack(df, "doc_id", "n", WINDOW).collect()
    }
    C.release()
    assert got == py_pack(lens, WINDOW)
    # the straddler really spans
    n, s, p, _, ep = got[51]
    assert ep - p >= 2 and ep == (s + n - 1) // WINDOW


def test_sequence_pack_empty_and_single(spark):
    empty = spark.createDataFrame([], "doc_id long, n long")
    assert P.sequence_pack(empty, "doc_id", "n", WINDOW).count() == 0
    C.release()
    one = spark.createDataFrame([(7, 42)], "doc_id long, n long")
    row = P.sequence_pack(one, "doc_id", "n", WINDOW).collect()[0]
    C.release()
    assert (row["start_offset"], row["pack_id"], row["offset_in_pack"]) == (0, 0, 0)


def test_sequence_pack_plans_no_global_sort(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50).alias("n")
    )
    out = P.sequence_pack(df, "doc_id", "n", WINDOW)
    plan = out._jdf.queryExecution().executedPlan().toString()
    C.release()
    empty_part = [
        cols for kind, cols, _ in _window_specs(plan)
        if kind == "Window" and not cols
    ]
    assert not empty_part, plan[:600]


def test_register_rejects_duplicate_names():
    """Round-5 incident: a new registration silently shadowed the
    existing same-named query (import-order-dependent winner, the
    loser's oracle gone). The catalog now refuses duplicates."""
    import pytest

    from flink_start_spark.plans.catalog import QUERIES, _register

    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate catalog query"):
        @_register(existing, None, description="dup")
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError
