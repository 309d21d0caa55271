"""Plan-quality sweep: every catalog query must have a scale-safe
physical plan — no nested-loop/cartesian joins, bounded shuffle count.

This is the 100 TB gate in test form: a correct-but-quadratic plan
passes the oracle at sf0.01 and dies on a cluster; this sweep fails it
in CI instead.
"""

from __future__ import annotations

import re

import pytest

from flink_start_spark.plans import QUERIES

from tests.conftest import SF_SMOKE

# Queries where a small broadcast nested-loop is expected and bounded:
# brute-force ANN does an intentional broadcast cross join of a FIXED
# 10-query set against candidates (|Q| x |N|, linear in N); IVF crosses
# the query set with the 16 broadcast centroids (|Q| x n_cells), as do
# the IVF-based SemDeDup clustering step and every k-means assignment
# round (the k-row centroid table is the broadcast side by design —
# linear in N, collapsed map-side by the follow-up min_by aggregate).
_ALLOWED_NESTED_LOOP = {
    "ann_cosine_topk",
    "ann_topk_ivf",
    "semdedup_flags",
    "kmeans_clusters",
    # 1-row corpus-total broadcasts (crossJoin of global count rows)
    "unigram_logprob_score",
    "pmi_collocations",
}

# Shuffle budget per query (hash exchanges). Multi-join pipelines
# legitimately need one per non-broadcast join + aggregation.
_MAX_EXCHANGES = 8

# Iterative queries (driver-controlled rounds) print the whole multi-
# round lineage in one plan; their per-ROUND cost is the bounded
# quantity (one join + one agg for components, one assignment + one
# quantized-mean recompute for Lloyd's — asserted by the operators'
# design), so the single-plan exchange budget doesn't apply.
_ITERATIVE = {"dedup_clusters", "kmeans_clusters", "cluster_cap_sample"}


# Queries whose operators persist their base projection: the optimized
# plan must read the input ONLY through InMemoryRelation leaves — a bare
# parquet `Relation` means some DataFrame reference re-evaluates the
# projection (and re-scans the file) instead of hitting the cache.
_SINGLE_SCAN = {"ann_topk_lsh", "embedding_near_dup_lsh", "char_ngram_jaccard_pairs"}


@pytest.mark.parametrize("name", sorted(_SINGLE_SCAN))
def test_persisted_projection_single_scan(spark, name):
    df = QUERIES[name].spark(spark, SF_SMOKE)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    uncached = [
        line
        for line in opt.splitlines()
        if "Relation" in line and "InMemoryRelation" not in line
    ]
    assert not uncached and opt.count("InMemoryRelation") > 0, (name, uncached)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_is_scale_safe(spark, name):
    df = QUERIES[name].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in _ALLOWED_NESTED_LOOP:
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # count DISTINCT exchanges: a persisted subtree's plan is printed
    # once under every InMemoryTableScan that reads it, so raw substring
    # counts double-charge cached pipelines; plan_id identifies the node
    exchange_ids = set(
        re.findall(r"Exchange hashpartitioning[^\n]*plan_id=(\d+)", plan)
    )
    if name not in _ITERATIVE:
        assert len(exchange_ids) <= _MAX_EXCHANGES, (name, len(exchange_ids))
    # every parquet scan must prune columns: reading all 5+ columns of a
    # table for a 2-column query is a bug; allow scans that genuinely
    # need wide rows (documents text pipelines read doc_id+text of 5).
    for line in plan.splitlines():
        if "FileScan parquet" in line and "ReadSchema" in line:
            schema = line.split("ReadSchema:")[1]
            n_cols = schema.count(":")
            assert n_cols <= 8, f"{name}: unpruned scan {schema[:120]}"
