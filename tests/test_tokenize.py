"""BPE induction: the distributed merge learner must EXACTLY mirror a
pure-python reference BPE (same tie-breaks, same greedy application) —
the determinism contract that substitutes for a SQL oracle (iterative
list-building folds have no DuckDB twin; the driver records the
catalog entry rows-only, this test is the exact check)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.operators import tokenize as TK


# ---------------------------------------------------------------- mirror
def py_words(t: str) -> list[str]:
    # the declared tokenization: literal-space split, empties dropped
    # (mirrors TH.words + the word != '' filter; python's bare split()
    # would ALSO split tabs, which the engine deliberately does not)
    return [w for w in t.strip().split(" ") if w]


def py_bpe_train(texts: list[str], n_merges: int):
    wc = Counter()
    for t in texts:
        for w in py_words(t):
            wc[w] += 1
    syms = {w: [*w, TK.EOW] for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # (count desc, left asc, right asc)
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, left + right, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms, wc


def py_bpe_encode(texts_by_id, merges):
    out = {}
    for doc_id, t in texts_by_id.items():
        n, chars = 0, 0
        for w in py_words(t):
            s = [*w, TK.EOW]
            for _, left, right, _, _ in merges:
                i, ns = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        ns.append(left + right)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                s = ns
            n += len(s)
            chars += sum(len(x) for x in s)
        out[doc_id] = (n, round(chars / n, 6))
    return out


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that hat is the hat the cat had",
    "matter chatter hatter",
    "the the the thee them theme",
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    df.cache()
    df.count()
    yield df
    df.unpersist()


def test_bpe_train_mirrors_pure_python(spark, docs):
    expect, _, _ = py_bpe_train(TEXTS, 8)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in TK.bpe_train(docs, "text", n_merges=8)
        .orderBy("step")
        .collect()
    ]
    C.release()
    assert got == expect
    # sanity: the corpus is saturated with -at words (cat/sat/mat/hat/
    # that/matter...), so the first merge is (a, t)
    assert got[0][1:4] == ("a", "t", "at")
    # counts never increase across steps within a greedy run's frontier
    assert all(g[4] > 0 for g in got)


def test_bpe_apply_merge_greedy_left(spark):
    # "aaa</w>" + (a,a) -> ["aa", "a", "</w>"]: greedy left, no overlap
    df = spark.createDataFrame([("aaa",)], "w string")
    out = df.select(
        TK.bpe_apply_merge(
            TK._initial_symbols(F.col("w")), F.lit("a"), F.lit("a")
        ).alias("s")
    ).collect()[0]["s"]
    assert out == ["aa", "a", TK.EOW]


def test_bpe_encode_mirrors_pure_python(spark, docs):
    merges_df = TK.bpe_train(docs, "text", n_merges=6)
    merges, _, _ = py_bpe_train(TEXTS, 6)
    expect = py_bpe_encode({i: t for i, t in enumerate(TEXTS)}, merges)
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["mean_token_len"])
        for r in TK.bpe_encode(docs, merges_df, 6, "text", "doc_id").collect()
    }
    C.release()
    assert got == expect
    # compression sanity: BPE tokens are fewer than characters
    n_chars = sum(len(w) + 1 for t in TEXTS for w in t.split())
    assert sum(n for n, _ in got.values()) < n_chars


def test_bpe_handles_whitespace_runs(spark):
    """Round-4 ADVICE regression: consecutive spaces make the literal-
    space split emit empty words; unguarded, sequence(1,0) fabricated
    two phantom '' symbols per empty word and train/encode diverged
    from the python mirror. Declared fix: empty words are dropped
    everywhere (and _initial_symbols is total: '' -> [EOW])."""
    texts = ["a  b  ab", "ab ab  a   b"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df = TK.bpe_train(docs, "text", n_merges=1)
    merges, _, _ = py_bpe_train(texts, 1)
    got_m = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("step").collect()
    ]
    assert got_m == merges
    expect = py_bpe_encode({i: t for i, t in enumerate(texts)}, merges)
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["mean_token_len"])
        for r in TK.bpe_encode(docs, merges_df, 1, "text", "doc_id").collect()
    }
    C.release()
    assert got == expect
    # the degenerate guard itself: '' -> exactly [EOW], like [*w, EOW]
    one = (
        spark.range(1)
        .select(TK._initial_symbols(F.lit("")).alias("s"))
        .collect()[0]["s"]
    )
    assert one == [TK.EOW]


def test_bpe_train_stops_when_pair_vocab_exhausts(spark):
    """Regression: an empty round's crossJoin silently annihilated the
    vocab; now training stops with the learned prefix and bpe_encode
    validates the count."""
    import pytest

    docs = spark.createDataFrame([(0, "a a a")], "doc_id long, text string")
    merges = TK.bpe_train(docs, "text", n_merges=5)
    n = merges.count()
    assert 1 <= n < 5  # vocabulary 'a' exhausts after the first merges
    out = TK.bpe_encode(docs, merges, n, "text", "doc_id").collect()
    assert len(out) == 1 and out[0]["n_bpe_tokens"] >= 1
    with pytest.raises(ValueError, match="merge table has"):
        TK.bpe_encode(docs, merges, 5, "text", "doc_id")


def test_bpe_oracle_survives_early_vocab_exhaustion(spark):
    """Round-5 review catch: the unrolled-CTE oracle's per-round merge
    application used a CROSS join to the 1-row winner — an EMPTY round
    (pair vocabulary exhausted before n_merges) annihilated the vocab
    and the encode oracle returned 0 rows while Spark froze the vocab
    and returned per-doc stats. The LEFT JOIN ON TRUE form must agree
    with Spark on a corpus that exhausts after ~2 merges."""
    import duckdb

    from flink_start_spark.plans import QUERIES

    texts = [(0, "a a aa"), (1, "a aa aa a")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    merges = TK.bpe_train(docs, "text", n_merges=6)
    n_learned = merges.count()
    assert n_learned < 6  # the fixture really exhausts early
    got_spark = {
        r["doc_id"]: (r["n_bpe_tokens"], r["mean_token_len"])
        for r in TK.bpe_encode(docs, merges, n_learned).collect()
    }
    got_merges = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges.orderBy("step").collect()
    ]
    C.release()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (0, 'a a aa'), "
        "(1, 'a aa aa a')) t(doc_id, text)"
    )
    oracle_stats = {
        r[0]: (r[1], r[2])
        for r in con.execute(QUERIES["bpe_token_stats"].oracle).fetchall()
    }
    oracle_merges = sorted(
        con.execute(QUERIES["bpe_merges"].oracle).fetchall()
    )
    assert oracle_stats == got_spark and len(oracle_stats) == 2
    # bpe_merges trains 8 rounds vs the 6 above: compare the shared
    # learned prefix (both stop at the same exhaustion point)
    assert oracle_merges == got_merges
