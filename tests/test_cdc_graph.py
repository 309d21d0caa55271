"""Round-4 CDC/graph family: SCD2 history build, snapshot-diff
changeset, and integer-exact PageRank — semantics pinned on handcrafted
fixtures (the catalog oracle already hash-checks them on real tables;
these tests pin the EDGE semantics the oracle data may not exercise).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_start_spark.operators.graph import SCALE, copurchase_edges, pagerank
from flink_start_spark.plans import QUERIES


# ---------------------------------------------------------------------
# PageRank: exact fixed-point mirror in pure python
# ---------------------------------------------------------------------


def py_pagerank(edges: list[tuple[int, int]], n_iter: int) -> dict[int, int]:
    """Bit-exact mirror of operators/graph.py: BIGINT fixed-point, the
    same (rank div outdeg) and ((85*sum) div 100) integral steps."""
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted(outdeg)
    rank = {v: SCALE for v in nodes}
    base = 15 * SCALE // 100
    for _ in range(n_iter):
        contrib: dict[int, int] = {v: 0 for v in nodes}
        for s, d in edges:
            if d in contrib:
                contrib[d] += rank[s] // outdeg[s]
        rank = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    return rank


def test_pagerank_mirrors_pure_python(spark):
    # asymmetric directed graph: a hub (1) pointed at by everyone, a
    # chain, and a node with out-edges only (4) — its rank decays to
    # base while it still feeds the hub
    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (2, 3), (3, 2), (4, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(e, n_iter=4).collect()}
    assert got == py_pagerank(edges, 4)


def test_pagerank_hub_outranks_leaf(spark):
    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (3, 2), (1, 3), (2, 3), (4, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(e, n_iter=5).collect()}
    assert got[1] > got[4]  # 3 in-edges vs 0 in-edges
    # rank of the no-inlink node converges to the damping base exactly
    assert got[4] == 15 * SCALE // 100


def test_copurchase_edges_symmetric_and_deduped(spark):
    li = spark.createDataFrame(
        # order 10: parts 1,2,2 (dup line) ; order 11: parts 1,3
        [(10, 1), (10, 2), (10, 2), (11, 1), (11, 3)],
        "l_orderkey long, l_partkey long",
    )
    got = {(r["src"], r["dst"]) for r in copurchase_edges(li).collect()}
    assert got == {(1, 2), (2, 1), (1, 3), (3, 1)}


def test_pagerank_is_partitioning_invariant(spark):
    """The fixed-point-integer claim in operators/graph.py: identical
    ranks no matter how the edge relation is partitioned (float
    PageRank fails this in the last ulp; integer PageRank cannot)."""
    import random

    rng = random.Random(7)
    edges = list({(rng.randint(1, 40), rng.randint(1, 40)) for _ in range(200)})
    edges = [(s, d) for s, d in edges if s != d]
    a = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(13, "dst")
    ra = sorted(map(tuple, pagerank(a, 4).collect()))
    rb = sorted(map(tuple, pagerank(b, 4).collect()))
    assert ra == rb
    assert ra == sorted(py_pagerank(edges, 4).items())


def test_contrastive_triplets_invariants(spark):
    """Negative picks: never the anchor, never a confirmed positive of
    that anchor, deterministic across partitionings."""
    from flink_start_spark import cache
    from flink_start_spark.operators.dedup import contrastive_triplets
    from flink_start_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    t1 = contrastive_triplets(docs, "text", "doc_id").collect()
    cache.release()
    t2 = contrastive_triplets(docs.repartition(11), "text", "doc_id").collect()
    cache.release()
    assert sorted(map(tuple, t1)) == sorted(map(tuple, t2))
    assert len(t1) > 0
    pos = {(r["anchor_id"], r["positive_id"]) for r in t1}
    for r in t1:
        assert r["negative_id"] != r["anchor_id"]
        assert (r["anchor_id"], r["negative_id"]) not in pos
        assert (r["negative_id"], r["anchor_id"]) not in pos


# ---------------------------------------------------------------------
# SCD2: change-collapse, interval chaining, is_current, tie-break
# ---------------------------------------------------------------------


def _ts(day: int) -> datetime:
    return datetime(1995, 1, day)


def test_scd2_collapses_runs_and_chains_intervals(spark, tmp_path):
    rows = [
        # custkey 1: O O F F O  -> intervals O[d1,d3) F[d3,d5) O[d5,∞)
        (1, 1, "O", _ts(1)),
        (2, 1, "O", _ts(2)),
        (3, 1, "F", _ts(3)),
        (4, 1, "F", _ts(4)),
        (5, 1, "O", _ts(5)),
        # custkey 2: single order -> one open interval
        (6, 2, "P", _ts(2)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        (r["custkey"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in QUERIES["scd2_order_status_history"].spark(
            spark, str(tmp_path)
        ).collect()
    }

    def ep(day: int) -> int:
        return int(_ts(day).timestamp())

    assert out == {
        (1, "O", ep(1), ep(3), False),
        (1, "F", ep(3), ep(5), False),
        (1, "O", ep(5), None, True),
        (2, "P", ep(2), None, True),
    }


def test_scd2_same_day_ties_break_on_orderkey(spark, tmp_path):
    rows = [
        (2, 1, "F", _ts(1)),  # higher orderkey, same day
        (1, 1, "O", _ts(1)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = sorted(
        (r["status"], r["is_current"])
        for r in QUERIES["scd2_order_status_history"].spark(
            spark, str(tmp_path)
        ).collect()
    )
    # orderkey 1 (O) precedes orderkey 2 (F): O closes, F stays current
    assert out == [("F", True), ("O", False)]


# ---------------------------------------------------------------------
# Snapshot diff: all four actions from a handcrafted event stream
# ---------------------------------------------------------------------


def test_snapshot_diff_emits_all_four_actions(spark, tmp_path):
    j = lambda day, hour=0: datetime(2024, 1, day, hour)  # noqa: E731
    rows = [
        # user 1: both windows, same profile (1 event, value 5.0) -> unchanged
        (1, j(2), 1, "view", 5.0, "{}"),
        (2, j(20), 1, "view", 5.0, "{}"),
        # user 2: both windows, drifted value -> update
        (3, j(3), 2, "view", 1.0, "{}"),
        (4, j(21), 2, "view", 9.0, "{}"),
        # user 3: only window 1 -> delete
        (5, j(4), 3, "view", 2.0, "{}"),
        # user 4: only window 2 -> insert
        (6, j(22), 4, "view", 3.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["user_id"]: r["action"]
        for r in QUERIES["snapshot_diff_changeset"].spark(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: "unchanged", 2: "update", 3: "delete", 4: "insert"}
