"""repeated_ngram_flags semantics: the boundary-straddle case that
motivates the operator (a repeat invisible to non-overlapping passage
chunks), within-doc repeat counting, and the no-repeat baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.operators.dedup import passage_dedup, repeated_ngram_flags


def _doc(words):
    return " ".join(words)


def test_boundary_straddling_repeat_caught(spark):
    """Two documents share a 10-word run that straddles the 20-word
    passage boundary in BOTH docs (placed at different offsets, so no
    20-word chunk is ever byte-equal): passage_dedup keeps everything,
    repeated_ngram_flags flags both."""
    shared = [f"s{i}" for i in range(10)]
    # doc a: 15 unique words, the shared run spans positions 16-25
    # (chunk 1 holds its first 5 words, chunk 2 the rest)
    a = [f"a{i}" for i in range(15)] + shared + [f"a{i}" for i in range(15, 25)]
    # doc b: shared run at positions 11-20 (different split point)
    b = [f"b{i}" for i in range(10)] + shared + [f"b{i}" for i in range(10, 25)]
    df = spark.createDataFrame(
        [(1, _doc(a)), (2, _doc(b))], "doc_id long, text string"
    )
    pd_out = {
        r["doc_id"]: r["kept_frac"]
        for r in passage_dedup(df, "text", "doc_id", passage_words=20).collect()
    }
    C.release()
    assert pd_out == {1: 1.0, 2: 1.0}  # passage stage sees nothing
    rn = {
        r["doc_id"]: (r["flagged"], r["n_repeated"])
        for r in repeated_ngram_flags(df, "text", "doc_id", n=10).collect()
    }
    C.release()
    # the shared 10-word run contributes exactly one repeated 10-gram
    # per doc (the run itself); flanking grams mix unique words
    assert rn[1] == (True, 1) and rn[2] == (True, 1)


def test_within_doc_repeat_counts_like_suffix_array(spark):
    """A doc repeating its own 10-gram flags itself — occurrence count
    is total occurrences, not distinct documents (Lee '21 counts a
    substring's corpus occurrences the same way)."""
    run = [f"r{i}" for i in range(10)]
    text = _doc(run + [f"x{i}" for i in range(10)] + run)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = repeated_ngram_flags(df, "text", "doc_id", n=10).collect()[0]
    C.release()
    assert bool(got["flagged"]) and got["n_repeated"] == 2


def test_no_repeats_all_clean(spark):
    df = spark.createDataFrame(
        [(i, _doc([f"w{i}_{j}" for j in range(30)])) for i in range(4)],
        "doc_id long, text string",
    )
    out = repeated_ngram_flags(df, "text", "doc_id", n=10).collect()
    C.release()
    assert all(not r["flagged"] and r["n_repeated"] == 0 for r in out)
    assert all(r["n_grams"] == 21 for r in out)  # 30 - 10 + 1
