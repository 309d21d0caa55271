"""curation_audit: stage-precedence semantics pinned on a synthetic fixture.

A doc failing multiple stages must get the FIRST failing status in
curation.STATUSES order. The fixture crafts docs that fail 2+ stages
(bench+short, dup+short, dup+contaminated, low-quality+unsampled, ...)
and compares the full Spark output against an independent pure-Python
reference implementation of every stage (same md5 buckets, clean rules,
quality formula, shingle overlap, rank median).
"""

from __future__ import annotations

import hashlib
import re

import pytest

from flink_start_spark.operators import curation as CU
from flink_start_spark.plans import QUERIES

STOP = {"the", "a", "an", "of", "and", "or", "to", "in"}
RATES = {"en": 25}
BENCH_PCT = 5


# ---------------------------------------------------------------------
# Pure-Python reference (independent of both Spark and DuckDB)
# ---------------------------------------------------------------------

def _bucket(doc_id: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:4], 16) % 100


def _words(t: str) -> list[str]:
    return re.split(r"\s+", t.strip())


def _shingles5(t: str) -> list[str]:
    w = _words(t)
    if len(w) >= 5:
        return [" ".join(w[i : i + 5]) for i in range(len(w) - 4)]
    return [t.strip()]


def _quality(t: str) -> float:
    w = _words(t)
    n, den = len(w), max(len(w), 1)
    d = len(set(w))
    s = sum(1 for x in w if x in STOP)
    return round(
        0.4 * min(1.0, n / 64.0)
        + 0.4 * (d / den)
        + 0.2 * (1.0 - abs(s / den - 0.4)),
        6,
    )


def _clean_kept(t: str) -> bool:
    cw = re.sub(r"\s+", " ", t).strip().lower().split(" ")
    den = max(len(cw), 1)
    avg = sum(len(x) for x in cw) / den
    return len(cw) >= 16 and 2.0 <= avg <= 12.0 and len(set(cw)) / den > 0.3


def _reference(docs: list[tuple[int, str, str]]) -> dict[int, str]:
    """(doc_id, lang, text) -> {doc_id: status}, recomputing every stage."""
    min_id_per_text: dict[str, int] = {}
    for doc_id, _, text in docs:
        min_id_per_text[text] = min(min_id_per_text.get(text, doc_id), doc_id)
    bench_shingles: set[str] = set()
    for doc_id, _, text in docs:
        if _bucket(doc_id, "bench|") < BENCH_PCT:
            bench_shingles |= set(_shingles5(text))
    # per-lang lower median of rounded quality over ALL docs
    by_lang: dict[str, list[tuple[float, int]]] = {}
    for doc_id, lang, text in docs:
        by_lang.setdefault(lang, []).append((_quality(text), doc_id))
    median = {
        lang: sorted(qs)[(len(qs) + 1) // 2 - 1][0] for lang, qs in by_lang.items()
    }
    out: dict[int, str] = {}
    for doc_id, lang, text in docs:
        is_bench = _bucket(doc_id, "bench|") < BENCH_PCT
        sh = set(_shingles5(text))
        contaminated = (
            not is_bench and len(sh & bench_shingles) / len(sh) >= 0.2
        )
        if is_bench:
            st = "benchmark"
        elif not _clean_kept(text):
            st = "failed_clean"
        elif doc_id != min_id_per_text[text]:
            st = "duplicate"
        elif contaminated:
            st = "contaminated"
        elif _quality(text) < median[lang]:
            st = "low_quality"
        elif _bucket(doc_id, "sample|") >= RATES.get(lang, 50):
            st = "not_sampled"
        else:
            st = "kept"
        out[doc_id] = st
    return out


# ---------------------------------------------------------------------
# Fixture construction: pick ids by their (deterministic) buckets so
# every stage AND every precedence collision is guaranteed present.
# ---------------------------------------------------------------------

def _uniq_text(doc_id: int, n: int = 30) -> str:
    return " ".join(f"t{doc_id}w{j}" for j in range(n))


def _lowq_text(doc_id: int) -> str:
    # 12 repeats + 8 unique: distinct ratio .45 passes clean, quality low
    return " ".join(["rep%d" % doc_id] * 12 + [f"u{doc_id}x{j}" for j in range(8)])


def _build_docs() -> list[tuple[int, str, str]]:
    bench_ids = [i for i in range(2000) if _bucket(i, "bench|") < BENCH_PCT]
    nb = [i for i in range(2000) if _bucket(i, "bench|") >= BENCH_PCT]
    sampled = [i for i in nb if _bucket(i, "sample|") < RATES["en"]]
    unsampled = [i for i in nb if _bucket(i, "sample|") >= RATES["en"]]
    assert len(bench_ids) >= 2 and len(sampled) >= 6 and len(unsampled) >= 6
    b1, b2 = bench_ids[:2]
    s = iter(sampled)
    u = iter(unsampled)
    t_bench = _uniq_text(b2)
    docs = [
        # benchmark beats failed_clean (short text)
        (b1, "en", "too short"),
        (b2, "en", t_bench),
        # failed_clean beats duplicate (identical short texts)
        (next(s), "en", "tiny tiny doc"),
        (next(u), "en", "tiny tiny doc"),
        # contaminated beats low_quality/not_sampled; duplicate beats
        # contaminated (identical bench-overlapping texts)
    ]
    e1, e2 = sorted([next(s), next(u)])
    t_contam = "x0 x1 " + " ".join(t_bench.split(" ")[2:])
    docs += [(e1, "en", t_contam), (e2, "en", t_contam)]
    # contaminated while UNSAMPLED (pins contaminated > not_sampled)
    docs += [(next(u), "en", "y0 y1 " + " ".join(t_bench.split(" ")[2:]))]
    # duplicate of a clean high-quality text; the min-id twin is kept
    d1, d2 = sorted([next(s), next(s)])
    t_dup = _uniq_text(9999)
    docs += [(d1, "en", t_dup), (d2, "en", t_dup)]
    # low_quality both sampled and unsampled (pins low_quality > not_sampled)
    docs += [(next(s), "en", _lowq_text(1)), (next(u), "en", _lowq_text(2))]
    # plain kept / not_sampled high-quality docs (also anchor the median)
    docs += [(next(s), "en", _uniq_text(7001)), (next(u), "en", _uniq_text(7002))]
    docs += [(i, "en", _uniq_text(i)) for i in nb[1000:1006]]
    assert len({d for d, _, _ in docs}) == len(docs)
    return docs


def test_curation_precedence_vs_reference(spark):
    docs = _build_docs()
    expected = _reference(docs)
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r["status"]
        for r in CU.curation_audit(df, RATES, bench_pct=BENCH_PCT).collect()
    }
    assert got == expected
    # the fixture must actually exercise every disposition
    assert set(got.values()) == set(CU.STATUSES)


def test_curation_multi_fail_docs_get_first_status(spark):
    """Spot-pin the collisions directly (independent of _reference)."""
    docs = _build_docs()
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r["status"]
        for r in CU.curation_audit(df, RATES, bench_pct=BENCH_PCT).collect()
    }
    by_text: dict[str, list[int]] = {}
    for doc_id, _, text in docs:
        by_text.setdefault(text, []).append(doc_id)
    # bench doc with a clean-failing text -> benchmark, not failed_clean
    b1 = next(d for d, _, t in docs if t == "too short")
    assert got[b1] == "benchmark"
    # identical short texts -> failed_clean on BOTH (beats duplicate)
    for d in by_text["tiny tiny doc"]:
        assert got[d] == "failed_clean"
    # identical contaminated texts -> min id contaminated, max id duplicate
    contam_pair = next(
        ids for t, ids in by_text.items() if t.startswith("x0 x1 ") and len(ids) == 2
    )
    lo, hi = sorted(contam_pair)
    assert got[lo] == "contaminated"
    assert got[hi] == "duplicate"


def test_curation_registered_with_oracle():
    q = QUERIES["curation_audit"]
    assert q.oracle is not None
    assert "curation" in q.tags
