"""Text analysis operators (SURVEY §2b): language-ID, quality scoring,
token counting, fingerprinting.

All pure Catalyst expressions over the ``documents`` table — string/array
functions inside whole-stage codegen, zero Python on the hot path. Each
has an exact DuckDB-oracle twin (plans/extensions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_start_spark.functions import texthash as TH

#: Marker stopwords per language for the n-gram/stopword heuristic.
#: Deterministic tie order = list order (first match wins on equal score).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and"]),
    ("es", ["el", "la", "de", "que"]),
    ("de", ["der", "die", "und", "das"]),
    ("fr", ["le", "la", "et", "les"]),
    ("zh", ["的", "是", "了", "在"]),
]

#: Stopword set for quality scoring (generic English-ish fillers).
STOPWORDS = ["the", "a", "an", "of", "and", "or", "to", "in"]


def _marker_score(words_col: Column, markers: list[str]) -> Column:
    """Fraction of tokens that are in the marker list."""
    hits = F.size(F.filter(words_col, lambda w: w.isin(*markers)))
    return hits.cast("double") / F.greatest(F.size(words_col), F.lit(1)).cast("double")


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-stopword frequency.

    A deliberately simple, deterministic n-gram/stopword classifier (the
    public fastText/CLD approach reduced to its SQL-expressible core).
    Emits 'und' (undetermined) when no marker occurs at all.
    """
    ws = TH.words(F.col(text_col))
    scores = [
        (lang, _marker_score(ws, markers)) for lang, markers in LANG_MARKERS
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reversed: earlier entries win ties (last when() evaluated first wins)
    for lang, score in reversed(scores):
        pred = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.withColumn("pred_lang", pred)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics + a composite quality score.

    Quality = 0.4 * min(1, n_tokens/64)            (length credit)
            + 0.4 * distinct_ratio                  (repetition penalty)
            + 0.2 * (1 - |stopword_ratio - 0.4|)    (natural-prose prior)
    — the length/punctuation/stopword-ratio family of heuristic filters
    used by public LLM-corpus pipelines (C4/Gopher-style rules), reduced
    to the columns available here.
    """
    ws = TH.words(F.col(text_col))
    n_tokens = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    distinct_ratio = n_distinct.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    avg_word_len = (
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / F.greatest(n_tokens, F.lit(1)).cast("double")
    )
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(64.0))
        + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)))
    )
    return df.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(quality, 6).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate.

    The subword estimate charges ceil(len(word)/4) tokens per word — the
    "~4 chars per BPE token" rule of thumb for English-like text; exact
    BPE requires a vocabulary (a Pandas-UDF job, out of SQL scope).
    """
    ws = TH.words(F.col(text_col))
    subword = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int")
    )
    return df.select(
        "doc_id",
        F.size(ws).cast("long").alias("ws_tokens"),
        subword.cast("long").alias("bpe_est_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_measured"),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: bag-of-words md5 (see texthash)."""
    return df.select("doc_id", TH.bag_fingerprint(F.col(text_col)).alias("fingerprint"))


def clean_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style normalization + keep/drop rules — the first stage
    of every LLM-corpus pipeline.

    Normalization: collapse whitespace runs, trim, lowercase (one
    codegen'd projection; Spark's regexp_replace is global by default —
    the DuckDB twin needs the explicit 'g' flag).

    Keep rules (Gopher-reduced to available columns): >= 16 tokens,
    mean word length in [2, 12], distinct-token ratio > 0.3. Emitted as
    a ``kept`` flag rather than a filter so downstream stages can audit
    drop rates per source — at 100 TB you never discard silently.
    """
    clean = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    ws = F.split(clean, " ")
    n_tokens = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    avg_len = (
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / F.greatest(n_tokens, F.lit(1)).cast("double")
    )
    kept = (
        (n_tokens >= 16)
        & (avg_len >= 2.0)
        & (avg_len <= 12.0)
        & (n_distinct.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double") > 0.3)
    )
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        n_tokens.cast("long").alias("n_tokens"),
        kept.alias("kept"),
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 95,
    val_pct: int = 4,
) -> DataFrame:
    """Deterministic train/val/test assignment: first two md5 bytes of
    the id, mod 100 — stable across runs, machines, and engines (no
    RNG, no sampling order dependence), which is what makes dataset
    splits reproducible and join-free to recompute anywhere.
    """
    bucket = F.conv(F.md5(F.col(id_col).cast("string")).substr(1, 4), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)
