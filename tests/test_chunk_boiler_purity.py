"""Hand-derived semantics tests for the round-4 pipeline additions:
RAG chunking offsets, per-source boilerplate stripping, and the k-NN
label-purity audit. Value-level parity with DuckDB is covered by the
oracle gate; these pin the semantics on fixtures small enough to check
by hand."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from flink_start_spark.operators.dedup import boilerplate_removal
from flink_start_spark.operators.similarity import knn_label_purity
from flink_start_spark.operators.text import doc_chunks


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_doc_chunks_offsets_and_hashes(spark):
    words = [f"w{i}" for i in range(80)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    rows = {r.chunk_idx: r for r in doc_chunks(df, "text", "doc_id", 32, 24).collect()}
    # starts advance by the stride until start+size covers the tail:
    # ceil((80-32)/24)+1 = 3 chunks, the last one ending exactly at 80
    assert sorted(rows) == [0, 1, 2]
    assert [rows[i].start_word for i in range(3)] == [0, 24, 48]
    assert [rows[i].n_words for i in range(3)] == [32, 32, 32]
    assert rows[0].chunk_md5 == _md5(" ".join(words[0:32]))
    assert rows[2].chunk_md5 == _md5(" ".join(words[48:80]))


def test_doc_chunks_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=7, text="only three words")])
    rows = doc_chunks(df, "text", "doc_id", 32, 24).collect()
    assert len(rows) == 1
    assert rows[0].start_word == 0 and rows[0].n_words == 3
    assert rows[0].chunk_md5 == _md5("only three words")


def test_boilerplate_removed_per_source_only(spark):
    tpl = "header nav menu login footer"  # one 5-word template passage
    df = spark.createDataFrame(
        [
            # srcA: template present in TWO docs -> stripped from both
            Row(doc_id=1, source="srcA", text=tpl + " alpha beta gamma delta one"),
            Row(doc_id=2, source="srcA", text=tpl + " epsilon zeta eta theta two"),
            # srcB: same passage but only ONE doc -> kept (per-source DF)
            Row(doc_id=3, source="srcB", text=tpl + " iota kappa lambda mu three"),
        ]
    )
    out = {
        r.doc_id: r
        for r in boilerplate_removal(
            df, "text", "doc_id", "source", passage_words=5, min_docs=2
        ).collect()
    }
    assert out[1].n_passages == 2 and out[1].n_boiler == 1
    assert out[1].stripped_md5 == _md5("alpha beta gamma delta one")
    assert out[2].stripped_md5 == _md5("epsilon zeta eta theta two")
    # srcB doc keeps everything, including the passage srcA stripped
    assert out[3].n_boiler == 0
    assert out[3].stripped_md5 == _md5(tpl + " iota kappa lambda mu three")
    assert abs(out[1].boiler_frac - 0.5) < 1e-9


def test_knn_label_purity_separated_clusters(spark):
    # two well-separated clusters; n_cells=1 makes the cell the whole
    # set, so neighbors are the exact k-NN. With k=2, each vector's two
    # nearest are its own cluster-mates -> purity 1.0 when labels align.
    def v(base, eps):
        out = [0.0] * 8
        out[base] = 1.0
        out[(base + 1) % 8] = eps
        return out

    rows = [
        Row(vec_id=i, embedding=v(0, 0.01 * i), label=0) for i in range(3)
    ] + [
        Row(vec_id=10 + i, embedding=v(4, 0.01 * i), label=1) for i in range(3)
    ]
    df = spark.createDataFrame(rows)
    out = {r.vec_id: r for r in knn_label_purity(df, k=2, n_cells=1).collect()}
    assert len(out) == 6
    assert all(r.n_neighbors == 2 for r in out.values())
    assert all(abs(r.same_label_frac - 1.0) < 1e-9 for r in out.values())


def test_knn_label_purity_flags_mislabeled_vector(spark):
    # vector 99 sits in cluster 0's geometry but carries label 1:
    # its own purity is 0, and it poisons one neighbor slot of the
    # true cluster-0 members that pick it up.
    def v(base, eps):
        out = [0.0] * 8
        out[base] = 1.0
        out[(base + 1) % 8] = eps
        return out

    rows = (
        [Row(vec_id=i, embedding=v(0, 0.01 * i), label=0) for i in range(3)]
        + [Row(vec_id=99, embedding=v(0, 0.05), label=1)]
        + [Row(vec_id=10 + i, embedding=v(4, 0.01 * i), label=1) for i in range(2)]
    )
    df = spark.createDataFrame(rows)
    out = {r.vec_id: r for r in knn_label_purity(df, k=2, n_cells=1).collect()}
    assert out[99].same_label_frac == 0.0  # both neighbors are label 0
    # the far cluster (label 1) never sees 99 among its top-2? with only
    # 2 members each picks the other (cos ~1) and then the closest of
    # cluster 0 / 99; either way at most half its neighbors share labels
    assert out[10].n_neighbors == 2 and out[10].same_label_frac <= 0.5


def test_knn_label_purity_singleton_cell_null_purity(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0], label=0)]
    )
    rows = knn_label_purity(df, k=3, n_cells=1).collect()
    assert len(rows) == 1
    assert rows[0].n_neighbors == 0 and rows[0].same_label_frac is None


def test_leakage_safe_split_cluster_invariant(spark):
    """Every near-dup cluster lands wholly on one side of the split —
    the invariant that makes the split leakage-safe."""
    from pyspark.sql import functions as F

    from flink_start_spark.plans import QUERIES
    from tests.conftest import SF_SMOKE

    out = QUERIES["leakage_safe_split"].spark(spark, SF_SMOKE)
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count("*").alias("n_docs"),
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    # the smoke corpus has real near-dup clusters, so the invariant is
    # exercised on multi-doc clusters, not vacuously on singletons
    assert per_cluster.filter(F.col("n_docs") > 1).count() > 0
    # and every document appears exactly once
    total = out.count()
    assert total == out.select("doc_id").distinct().count()
