"""Seeded randomized oracle-gate fuzzing: generate a corpus whose every
value is drawn from a MIX of normal and degenerate pools, then run the
full catalog-wide (136-query at round 9) Spark-vs-DuckDB hash gate over it.

    python scripts/fuzz_corpus.py <seed> [out_dir]      # build only
    python scripts/fuzz_corpus.py <seed> --check        # build + gate

The handpicked adversarial corpus (make_adversarial.py) pins known bug
classes; this fuzzer searches the COMBINATION space those rows miss —
e.g. a duplicate-name customer whose only order has a full-discount
line on a leap day. Both engines read the same parquet, so randomness
never breaks comparability; a failing seed is a reproducible artifact
(same seed -> byte-identical corpus).

Corpus contracts honored (same as the generated + adversarial dirs):
text/n_chars/lang/source non-null, event ts non-null, order/ship dates
non-null, embeddings non-null with fixed dim 64, NO NaN anywhere.
user_id / o_custkey / props stay nullable.
"""

from __future__ import annotations

import datetime as dt
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_WORDS = (
    "the quick brown fox jumps over lazy dog data spark query engine "
    "window join filter aggregate stream batch shuffle partition key "
    "value count sum mean text token corpus model train split"
).split()
_DEGEN_WORDS = [
    "日本語", "🚀", "naïve", "\x01mark\x02", "a.b(c)*+?", "it's", '"q"',
    "عربي", "é", "ß", "x" * 300,
]
_LANGS = ["en", "de", "fr", "es", "zh"]
_SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE", ""]
_TYPES = ["STANDARD", "PROMO", "ECONOMY", "MEDIUM", "SMALL", "LARGE", ""]
_EVENT_TYPES = ["purchase", "signup", "click", "error", "view", "", "点击"]
_STATUSES = ["O", "F", "P", ""]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", ""]
_FLAGS = ["N", "A", "R", ""]
_DIM = 64


def _money(rng) -> float:
    r = rng.random_sample()
    if r < 0.08:
        return 0.0
    if r < 0.12:
        return -round(float(rng.random_sample() * 100), 2)
    if r < 0.16:
        return round(float(rng.random_sample()) * 1e12, 2)
    return round(float(rng.random_sample() * 1000), 2)


def _text(rng, prior: list[str]) -> str:
    r = rng.random_sample()
    if r < 0.04:
        return ""
    if r < 0.07:
        return "  \t "
    if prior and r < 0.20:  # exact duplicate of an earlier doc
        return prior[int(rng.randint(len(prior)))]
    if prior and r < 0.30:  # near-duplicate (append one word)
        base = prior[int(rng.randint(len(prior)))]
        return (base + " extra") if base.strip() else "extra"
    n = int(rng.randint(3, 40))
    words = [
        _DEGEN_WORDS[int(rng.randint(len(_DEGEN_WORDS)))]
        if rng.random_sample() < 0.08
        else _WORDS[int(rng.randint(len(_WORDS)))]
        for _ in range(n)
    ]
    if rng.random_sample() < 0.1:  # pathological repetition
        words = words[:3] * int(rng.randint(2, 40))
    return " ".join(words)


def _vec(rng) -> list[float]:
    r = rng.random_sample()
    if r < 0.06:
        return [0.0] * _DIM
    if r < 0.10:
        return [float(1e18)] * _DIM
    if r < 0.14:
        return [float(1e-30)] * _DIM
    return [round(float(x), 4) for x in rng.standard_normal(_DIM)]


#: the exact date-filter boundaries the catalog's queries use —
#: drawn verbatim (AT the bound) and at ±1µs so >=/</<=/BETWEEN edge
#: semantics are probed on both engines
_BOUNDARY_DATES = [
    dt.datetime(1996, 1, 1), dt.datetime(1996, 4, 1),
    dt.datetime(1996, 7, 1), dt.datetime(1996, 10, 1),
    dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1),
    dt.datetime(1998, 9, 2), dt.datetime(1999, 1, 1),
]


def _ts_1996(rng) -> dt.datetime:
    """Order/ship dates: mostly in the catalog's filter windows, with
    filter-boundary-exact, pre-epoch and fractional-second outliers."""
    r = rng.random_sample()
    if r < 0.12:  # exactly AT (or 1us around) a catalog filter bound
        base = _BOUNDARY_DATES[int(rng.randint(len(_BOUNDARY_DATES)))]
        tweak = int(rng.randint(3))
        if tweak == 1:
            base += dt.timedelta(microseconds=1)
        elif tweak == 2:
            base -= dt.timedelta(microseconds=1)
        return base
    if r < 0.15:
        base = dt.datetime(1969, 12, 31) + dt.timedelta(
            seconds=int(rng.randint(0, 86400))
        )
    elif r < 0.85:
        base = dt.datetime(1996, 1, 1) + dt.timedelta(
            seconds=int(rng.randint(0, 2 * 365 * 86400))
        )
    else:
        base = dt.datetime(1995, 1, 1) + dt.timedelta(
            seconds=int(rng.randint(0, 7 * 365 * 86400))
        )
    if rng.random_sample() < 0.3:
        base += dt.timedelta(microseconds=int(rng.randint(1, 1_000_000)))
    return base


def build(seed: int, out: str, spark=None) -> str:
    # schemas + writer come from make_adversarial: ONE source of truth
    # for the testdata table shapes, so the two generators cannot drift
    from make_adversarial import (
        DOC_SCHEMA,
        EMB_SCHEMA,
        EV_SCHEMA,
        RELATIONAL_SCHEMAS,
        _write_single_file,
    )

    if spark is None:
        from flink_start_spark.session import get_spark

        spark = get_spark(f"fuzz_corpus_{seed}")
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)

    def w(name, rows, schema):
        _write_single_file(
            spark.createDataFrame(rows, schema),
            os.path.join(out, f"{name}.parquet"),
        )

    # ---- documents -------------------------------------------------
    n_docs = int(rng.randint(25, 70))
    texts: list[str] = []
    docs = []
    for i in range(n_docs):
        txt = _text(rng, texts)
        texts.append(txt)
        docs.append((
            i + 1, txt,
            _LANGS[int(rng.randint(len(_LANGS)))],
            f"src{int(rng.randint(0, 10))}",
            len(txt),
        ))
    w("documents", docs, DOC_SCHEMA)

    # ---- embeddings ------------------------------------------------
    n_emb = int(rng.randint(25, 70))
    vecs: list[list[float]] = []
    embs = []
    for i in range(n_emb):
        if vecs and rng.random_sample() < 0.15:  # exact-duplicate vector
            v = vecs[int(rng.randint(len(vecs)))]
        else:
            v = _vec(rng)
        vecs.append(v)
        embs.append((i + 1, v, int(rng.randint(-1, 10))))
    w("embeddings", embs, EMB_SCHEMA)

    # ---- events ----------------------------------------------------
    n_ev = int(rng.randint(80, 250))
    base = dt.datetime(2024, 1, 1)
    evs = []
    prev_ts: list[dt.datetime] = []
    for i in range(n_ev):
        r = rng.random_sample()
        if r < 0.10:  # exactly ON a window boundary (tumbling 3600 /
            # slide 900 / session gap 1800 are all multiples of 900)
            ts = base + dt.timedelta(seconds=900 * int(rng.randint(0, 2880)))
        elif prev_ts and r < 0.18:  # exact-duplicate timestamp (ties)
            ts = prev_ts[int(rng.randint(len(prev_ts)))]
        elif prev_ts and r < 0.24:  # exactly one session gap after
            ts = prev_ts[int(rng.randint(len(prev_ts)))] + dt.timedelta(
                seconds=1800
            )
        else:
            ts = base + dt.timedelta(
                seconds=int(rng.randint(0, 30 * 86400)),
                microseconds=int(rng.randint(0, 1_000_000)),
            )
        if rng.random_sample() < 0.02:  # pre-epoch stragglers
            ts = dt.datetime(1969, 12, 31, 23, 59, 59, 500000)
        prev_ts.append(ts)
        uid = None if rng.random_sample() < 0.1 else int(rng.randint(1, 8))
        r = rng.random_sample()
        props = (
            None if r < 0.1
            else "{not json" if r < 0.18
            else "{}" if r < 0.25
            else '{"k": %d}' % int(rng.randint(-10, 100))
        )
        evs.append((
            i + 1, ts, uid,
            _EVENT_TYPES[int(rng.randint(len(_EVENT_TYPES)))],
            round(abs(float(rng.standard_normal())) * 100, 6)
            if rng.random_sample() > 0.1 else _money(rng),
            props,
        ))
    w("events", evs, EV_SCHEMA)

    # ---- relational ------------------------------------------------
    regions = [(i, nm) for i, nm in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    if rng.random_sample() < 0.5:
        regions.append((5, "ASIA"))  # duplicate name
    if rng.random_sample() < 0.5:
        regions.append((6, ""))
    w("region", regions, RELATIONAL_SCHEMAS["region"])

    n_nat = int(rng.randint(5, 12))
    nations = []
    for i in range(n_nat):
        rk = int(rng.randint(0, len(regions) + 2))  # may dangle
        nm = ("" if rng.random_sample() < 0.1
              else f"NATION_{int(rng.randint(0, max(2, n_nat - 2)))}")  # dups likely
        nations.append((i, nm, rk))
    w("nation", nations, RELATIONAL_SCHEMAS["nation"])

    n_cust = int(rng.randint(8, 25))
    custs = []
    for i in range(n_cust):
        custs.append((
            i + 1,
            "" if rng.random_sample() < 0.08
            else f"Customer#{int(rng.randint(0, max(2, n_cust - 3))):09d}",
            int(rng.randint(0, n_nat + 2)),  # may dangle
            _money(rng),
            _SEGMENTS[int(rng.randint(len(_SEGMENTS)))],
        ))
    w("customer", custs, RELATIONAL_SCHEMAS["customer"])

    n_supp = int(rng.randint(4, 10))
    supps = [(i + 1,
              "" if rng.random_sample() < 0.1 else f"Supplier#{int(rng.randint(0, n_supp)):09d}",
              int(rng.randint(0, n_nat + 2)),
              _money(rng)) for i in range(n_supp)]
    w("supplier", supps, RELATIONAL_SCHEMAS["supplier"])

    n_part = int(rng.randint(6, 16))
    parts = [(i + 1,
              "" if rng.random_sample() < 0.08
              else f"{_WORDS[int(rng.randint(len(_WORDS)))]} widget",
              "" if rng.random_sample() < 0.1
              else f"Brand#{int(rng.randint(1, 10))}",
              _TYPES[int(rng.randint(len(_TYPES)))],
              # include the p_size band bounds (1-15 / 10-30 / 20-50)
              [1, 10, 15, 20, 30, 50][int(rng.randint(6))]
              if rng.random_sample() < 0.4 else int(rng.randint(-1, 60)),
              _money(rng)) for i in range(n_part)]
    w("part", parts, RELATIONAL_SCHEMAS["part"])

    n_ord = int(rng.randint(12, 40))
    orders, lines = [], []
    ln_schema = RELATIONAL_SCHEMAS["lineitem"]
    for i in range(n_ord):
        odate = _ts_1996(rng)
        orders.append((
            i + 1,
            None if rng.random_sample() < 0.05
            else int(rng.randint(1, n_cust + 3)),  # may dangle
            _STATUSES[int(rng.randint(len(_STATUSES)))],
            _money(rng),
            odate,
            _PRIORITIES[int(rng.randint(len(_PRIORITIES)))],
        ))
        for j in range(int(rng.randint(0, 4))):  # 0 lines => orphan order
            ship = odate + dt.timedelta(
                days=int(rng.randint(-10, 120)),
                microseconds=int(rng.randint(0, 1_000_000)),
            )
            # pools include the catalog's exact filter bounds
            # (discount BETWEEN 0.03 AND 0.05, quantity < 24 and the
            # 1-20/10-30/20-40 brand bands, sum > 250 volume cut)
            disc = [0.0, 0.03, 0.05, 0.06, 0.1, 0.5, 1.0][int(rng.randint(7))]
            qty = [0.0, 0.5, 1.0, 10.0, 20.0, 23.0, 24.0, 30.0, 40.0,
                   50.0, 125.0, 250.0, 251.0, 1e6][int(rng.randint(14))]
            lines.append((
                i + 1,
                int(rng.randint(1, n_part + 3)),   # may dangle
                int(rng.randint(1, n_supp + 3)),   # may dangle
                j + 1, qty, _money(rng), disc,
                [0.0, 0.02, 0.08, 0.5][int(rng.randint(4))],
                _FLAGS[int(rng.randint(len(_FLAGS)))],
                ["O", "F"][int(rng.randint(2))],
                ship,
            ))
    # orphan lineitems referencing no order
    for j in range(int(rng.randint(0, 3))):
        lines.append((99990 + j, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O",
                      _ts_1996(rng)))
    if lines and rng.random_sample() < 0.5:  # duplicate a full PK row
        lines.append(lines[int(rng.randint(len(lines)))])
    w("orders", orders, RELATIONAL_SCHEMAS["orders"])
    w("lineitem", lines, ln_schema)
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    seed = int(sys.argv[1])
    check = "--check" in sys.argv[2:]
    rest = [a for a in sys.argv[2:] if a != "--check"]
    names: list[str] = []
    if "--queries" in rest:
        # restrict the gate to named queries (forwarded to crosscheck)
        i = rest.index("--queries")
        names = rest[i + 1 :]
        rest = rest[:i]
    if any(a.startswith("-") for a in rest):
        # an unknown flag would otherwise be swallowed as the OUTPUT
        # DIRECTORY and the corpus written to a junk path like
        # ./--foo (this happened: a tracked ./--queries directory)
        print(f"unknown argument(s): {[a for a in rest if a.startswith('-')]}")
        return 2
    out = rest[0] if rest else f"/tmp/sf_fuzz_{seed}"
    build(seed, out)
    print(f"fuzz corpus (seed={seed}) written to {out}")
    if check:
        # release the corpus-build JVM before the gate spawns its own
        # Spark driver — otherwise two full drivers sit resident for
        # the whole 135-query sweep
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        rc = subprocess.call(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "crosscheck.py"), out, *names]
        )
        return rc
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
