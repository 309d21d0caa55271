"""Distributed BPE tokenizer induction (Sennrich '16, "Neural Machine
Translation of Rare Words with Subword Units") — learning the merge
table a training pipeline's tokenizer ships with, as a Spark job over
the corpus.

Reference parity note: the reference (mainul098/flink-start) has no
tokenizer surface; SURVEY §2b's floor is BPE-ESTIMATE token counting
(ceil(len/4), implemented in plans/extensions.py sequence_packing /
token_counts). This module is the real thing: character-level BPE
merge learning over word counts, plus the encode pass that applies a
learned merge table.

Determinism (the property that makes the pure-python mirror in
tests/test_tokenize.py an EXACT twin): pair counts are integer sums of
integer word counts (associative, partitioning-independent); each
round's winning pair is picked by (count desc, left asc, right asc) —
a total order — via a distributed TakeOrderedAndProject; merge
application is a greedy left-to-right fold, the standard BPE rule.

Scale shape:
- the corpus is touched ONCE (word-count aggregation with map-side
  combine; hot words collapse pre-shuffle). Everything after runs on
  the VOCABULARY relation (distinct words x counts) — bounded by
  vocabulary growth, not corpus size;
- each round is: one explode+groupBy over the vocab for pair counts,
  one TakeOrdered(1), one broadcast of the single winning pair, one
  O(word-length) fold per word to apply it. K rounds = K bounded
  plans, checkpointed round-over-round like connected_components
  (operators/dedup.py) — self-managed, released in-function (kmeans
  by contrast registers its caches via C.track for caller release);
- no collect(): the winner flows back as a 1-row broadcast crossJoin
  (the bounded nested-loop class test_plan_quality allowlists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_start_spark.functions import texthash as TH

__all__ = ["word_counts", "bpe_train", "bpe_apply_merge", "bpe_encode"]

#: end-of-word marker (standard BPE; lets merges distinguish suffixes
#: from in-word sequences). Single reserved symbol, never split.
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, count)`` over whitespace-split words — the ONE corpus
    scan of BPE training; everything else runs on this relation.

    Empty words (the literal-space ``words()`` split emits them on runs
    of spaces) are dropped: the declared tokenization is "non-empty
    literal-space tokens", mirrored by the pure-python reference's
    filtered split and the oracle's ``list_filter(..., w -> w <> '')``."""
    return (
        df.select(F.explode(TH.words(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """Characters of the word plus the end-of-word marker. substring in
    the lambda references a plain attribute (cheap), not a computed
    expression — the O(n^2) re-evaluation hazard does not apply.

    The empty word (reachable via the literal-space ``words()`` split on
    runs of whitespace) must yield exactly ``[EOW]`` like the pure-python
    mirror ``[*w, EOW]``; unguarded, ``sequence(1, 0)`` would yield the
    DESCENDING ``[1, 0]`` and fabricate two phantom '' symbols."""
    chars = F.when(
        F.length(word) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        )
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def bpe_apply_merge(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right application of one merge ``(left, right) ->
    left||right`` to a symbol array — the standard BPE replace rule
    ("aaa" + (a,a) -> ["aa","a"]) as a single O(n) fold."""
    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        emit_prev = F.struct(
            F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
            s.alias("prev"),
        )
        merged = F.struct(
            F.concat(acc["out"], F.array(F.concat(left, right))).alias("out"),
            F.lit(None).cast("string").alias("prev"),
        )
        return F.when(
            acc["prev"].isNull(), F.struct(acc["out"].alias("out"), s.alias("prev"))
        ).otherwise(
            F.when((acc["prev"] == left) & (s == right), merged).otherwise(
                emit_prev
            )
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(syms, zero, step, finish)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(step, left, right, merged, pair_count)`` with ``step``
    1-based in learning order — the artifact a tokenizer ships.

    Driver-controlled rounds like connected components
    (operators/dedup.py): every round's vocab relation (carrying that
    round's winner as constant columns) is
    ``localCheckpoint(eager=True)``-ed. The checkpoint does
    double duty — materialization AND lineage cut. The cut is
    load-bearing for more than re-execution cost: without it,
    CollapseProject inlines round r-1's merge-application fold into
    round r's fold during optimization, and because the fold's
    ``when`` branches each embed the accumulator subtree, the inlined
    expression TREE grows exponentially in rounds (measured: 2 rounds
    analyze in seconds, 8 rounds hang the optimizer for minutes).
    """
    if n_merges < 1:
        # the loop would never run and the function would return None,
        # crashing callers at the documented bpe_encode(merges, ...)
        # follow-up — fail the misconfiguration loudly instead
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    import functools

    wc = (
        word_counts(df, text_col)
        .select("cnt", _initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    # One eager job per round, not three (round-10 optimization, guide
    # §1.2 "the distributed algorithm" — the per-round relations are
    # vocabulary-sized, so wall-clock here is JOB COUNT, not data;
    # measured 33 -> 28 Spark jobs for a 6-round train at sf0.1, with
    # the two per-round auxiliary actions — the winner checkpoint and
    # its isEmpty() probe — gone entirely). The winner is
    # NOT checkpointed separately: it rides the round's vocab
    # checkpoint as five constant columns (the broadcast crossJoin the
    # fold already needs), and the merge table is assembled at the END
    # as a lazy union of limit(1) slices over those checkpoints — zero
    # extra jobs until a caller acts on it. The per-round isEmpty()
    # probe is gone too: an exhausted round's crossJoin with the empty
    # winner annihilates the vocab, which now simply yields empty
    # checkpoints whose limit(1) contributes no merge row — the
    # returned table is the learned prefix, exactly as the explicit
    # early break produced (pinned by
    # test_bpe_train_stops_when_pair_vocab_exhausts).
    rounds: list[DataFrame] = []
    for step in range(1, n_merges + 1):
        pair = F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice("syms", 2, F.size("syms") - 1),
        )
        pairs = (
            wc.filter(F.size("syms") >= 2)
            .select(F.col("cnt"), F.explode(pair).alias("p"))
            .select(
                F.col("p")["0"].alias("left"),
                F.col("p")["1"].alias("right"),
                "cnt",
            )
            .groupBy("left", "right")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .select(
                F.lit(step).cast("int").alias("step"),
                "left",
                "right",
                F.concat("left", "right").alias("merged"),
                "pair_count",
            )
        )
        wc = (
            wc.crossJoin(F.broadcast(best))
            .select(
                "cnt",
                bpe_apply_merge(
                    F.col("syms"), F.col("left"), F.col("right")
                ).alias("syms"),
                "step",
                "left",
                "right",
                "merged",
                "pair_count",
            )
            .localCheckpoint(eager=True)
        )
        rounds.append(wc)
        wc = wc.select("cnt", "syms")
    merge_cols = ["step", "left", "right", "merged", "pair_count"]
    lazy = functools.reduce(
        lambda a, b: a.unionByName(b),
        [r.select(*merge_cols).limit(1) for r in rounds],
    )
    # ONE materialization of the (<= n_merges)-row table: consumers
    # (bpe_encode's count + K filter(step=k) broadcasts, the catalog's
    # noop sink) would otherwise re-scan all K round checkpoints per
    # read.
    return lazy.localCheckpoint(eager=True)


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to documents: per document, the BPE
    token count and mean token length under the learned vocab — the
    compression curve a tokenizer evaluation reads.

    The K merges are applied as K CHAINED single-merge folds, each
    fed by a 1-row broadcast of that step's pair (``filter(step=k)``
    — no driver collect). Chaining keeps the expression tree LINEAR in
    K; nesting the per-merge fold inside a fold over the merge array
    blows up the optimizer exponentially (each ``when`` branch embeds
    the accumulator subtree — measured as a multi-minute analysis
    hang at K=6). ``n_merges`` must match the merge table's row count
    (an empty step's crossJoin would annihilate the relation).

    The folds run over the DISTINCT-WORD vocabulary, not word
    instances — BPE encoding is a pure function of the word, and the
    higher-order-function fold is interpreted (no codegen), so folding
    per instance pays the interpreter Zipf-many times for the same
    answer (measured at sf0.1: 270k instances / 31 distinct words →
    ~40x wall-clock). The per-word (token count, char count) relation
    is vocabulary-sized (Zipf-bounded even at 100 TB) and broadcasts
    back onto the single instance scan; per-document totals then
    collapse map-side in one groupBy.
    """
    n_actual = merges.count()
    if n_actual != n_merges:
        # an empty step's crossJoin would annihilate the encode relation
        # and silently return 0 rows for the whole corpus — fail loudly
        # instead (count() is a cheap job over 1-row checkpoint leaves)
        raise ValueError(
            f"merge table has {n_actual} steps but n_merges={n_merges}; "
            "pass the table's actual row count (bpe_train may learn "
            "fewer merges than requested on a small vocabulary)"
        )
    inst = df.select(
        F.col(id_col), F.explode(TH.words(F.col(text_col))).alias("word")
    ).where(F.col("word") != "")
    enc = inst.select("word").distinct().select(
        "word", _initial_symbols(F.col("word")).alias("toks")
    )
    for k in range(1, n_merges + 1):
        mk = merges.filter(F.col("step") == k).select("left", "right")
        enc = enc.crossJoin(F.broadcast(mk)).select(
            "word",
            bpe_apply_merge(F.col("toks"), F.col("left"), F.col("right")).alias(
                "toks"
            ),
        )
    per_word = enc.select(
        "word",
        F.size("toks").alias("n"),
        F.aggregate(
            F.transform("toks", lambda t: F.length(t)),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("chars"),
    )
    joined = inst.join(F.broadcast(per_word), "word")
    return joined.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_bpe_tokens"),
        F.round(
            F.sum("chars").cast("double") / F.sum("n"), 6
        ).alias("mean_token_len"),
    )
