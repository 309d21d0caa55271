"""Build an ADVERSARIAL sf-dir: EVERY table replaced by degenerate-
but-schema-valid rows the generated corpus never produces.

documents / embeddings / events: empty and whitespace-only text,
unicode (CJK / emoji / combining / RTL), regex metacharacters,
quotes, control characters (including the BPE oracle's chr(1)/chr(2)
marker bytes), pathological repetition, exact and near duplicates,
zero-norm / tiny / huge embeddings, NULL user_ids, malformed JSON
props, and fractional-second timestamps straddling window
boundaries. (NULL text is deliberately absent: the corpus contract
pins text/n_chars non-null, enforced at ingest by
operators/text.py::validate_documents — see the _DOCS comment.)

relational (TPC-H-ish) tables: dangling foreign keys in every
direction (nation→region, customer→nation, lineitem→orders/part/
supplier, orders→customer via NULL o_custkey), duplicate names that
merge under name-keyed groupBys, duplicate (l_orderkey,
l_linenumber) rows, empty-string names / segments / statuses /
flags, unicode names, negative / zero / 1e12-scale monetary values,
p_size <= 0, full-discount (revenue-zero) lines, filter-boundary
timestamps exactly AT and just BELOW every date window the catalog
uses (1996 quarters, 1998-09-02, 1999-01-01), fractional-second and
pre-epoch (1969) order dates, ship-before-order lines, customers
with no orders / orders with no lineitems / parts and suppliers
with no lineitems, and exact value TIES at top-k cutoffs (equal
revenue, equal acctbal) so nondeterministic tie-breaks surface as
cross-engine hash mismatches. (NaN is deliberately absent: float
columns carry a no-NaN corpus contract — NaN equality/ordering is
engine-defined and data this engine ingests is NaN-scrubbed at the
source.)

    python scripts/make_adversarial.py [out_dir]

Then the full oracle gate runs against it:

    python scripts/crosscheck.py /tmp/sf_adversarial

A query that crashes or hash-mismatches here has an engine-divergence
or degenerate-input bug that the clean generated corpus cannot see —
the 100 TB-readiness claim includes exactly these rows.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from flink_start_spark.session import get_spark


def _write_single_file(df, out_path: str) -> None:
    """Write as ONE flat .parquet FILE (the testdata layout both the
    crosscheck's read_parquet and load_table expect), via a temp dir."""
    import glob

    tmp = out_path + "._tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    if os.path.isdir(out_path):
        shutil.rmtree(out_path)
    elif os.path.exists(out_path):
        os.remove(out_path)
    shutil.move(part, out_path)
    shutil.rmtree(tmp)


#: (text, lang, source) — doc_id/n_chars derived. Deterministic, no RNG.
_DOCS: list[tuple[str | None, str, str]] = [
    ("", "en", "src0"),                                   # empty
    ("   ", "en", "src0"),                                # spaces only
    (" \t\n ", "en", "src1"),                             # mixed whitespace
    ("x", "en", "src1"),                                  # single char
    ("a" * 5000, "en", "src2"),                           # one huge word
    ("spam ham " * 200, "en", "src2"),                    # pathological repetition
    ("the quick brown fox jumps over the lazy dog", "en", "src3"),
    ("the quick brown fox jumps over the lazy dogs", "en", "src3"),  # near-dup
    ("the quick brown fox jumps over the lazy dog", "en", "src4"),   # exact dup
    ("日本語 の テキスト です 形態素 解析", "zh", "src4"),  # CJK
    ("héllo wörld café naïve résumé", "fr", "src5"),      # accents
    ("é combining acute over e", "fr", "src5"),     # combining char
    ("🚀 🌟 emoji tokens 🎉 in text", "en", "src6"),       # emoji
    ("نص عربي من اليمين إلى اليسار", "es", "src6"),       # RTL
    ("a.b (c) [d] * + ? | \\ $ ^ regex metachars", "en", "src7"),
    ("it's \"quoted\" -- ; 'semi' injection", "en", "src7"),
    ("contact john@example.com 123-45-6789 10.0.0.1 pii", "en", "src8"),
    ("ctrl\x01chars\x02inside\x01text", "en", "src8"),    # BPE marker bytes
    ("a  b\tc   d", "en", "src9"),                        # space runs + tab
    ("word " * 64, "de", "src9"),                         # exactly-repeating
    # NO NULL text: the corpus contract pins text/n_chars non-null —
    # enforced at ingest by operators/text.py::validate_documents (the
    # documents twin of the reference's malformed-record drop). The
    # driver registers raw parquet views for the oracle, so nullness
    # cannot be filtered engine-side without breaking parity.
    ("normal english sentence with several distinct common words here",
     "en", "src1"),
]

_DIM = 64


def _vec(kind: str) -> list[float]:
    if kind == "zero":
        return [0.0] * _DIM
    if kind == "tiny":
        return [1e-30] * _DIM
    if kind == "huge":
        return [1e18] * _DIM
    if kind == "neg":
        return [-1.0] * _DIM
    if kind == "unit0":
        return [1.0] + [0.0] * (_DIM - 1)
    if kind == "ramp":
        return [float(i) / _DIM for i in range(_DIM)]
    if kind == "alt":
        return [1.0 if i % 2 == 0 else -1.0 for i in range(_DIM)]
    raise ValueError(kind)


def _ts(y, mo, d, h=0, mi=0, s=0, us=0):
    import datetime as dt

    return dt.datetime(y, mo, d, h, mi, s, us)


#: relational rows. Names reference the generated corpus's value
#: domains (regions AFRICA..MIDDLE EAST, segments BUILDING..,
#: Brand#N, STANDARD/PROMO types, status O/F/P, flag A/N/R) so the
#: catalog's literal filters all admit rows; everything else is the
#: degenerate complement of what the generator emits.
_REGIONS = [
    (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
    (4, "MIDDLE EAST"),
    (5, ""),          # empty name
    (6, "ASIA"),      # DUPLICATE name on a second key
    (99, "ORPHANLAND"),  # region no nation references
]

_NATIONS = [
    (0, "NATION_A", 0), (1, "NATION_B", 1),
    (2, "NATION_ASIA1", 2),
    (3, "NATION_ASIA2", 6),   # hangs off the duplicate-ASIA region
    (4, "", 3),               # empty name
    (5, "日本", 2),            # unicode name
    (6, "NATION_DUP", 0), (7, "NATION_DUP", 4),  # duplicate names
    (8, "DANGLING_REGION", 77),  # FK violation nation→region
    (9, "LONELY", 4),         # no customers, no suppliers
]

_CUSTOMERS = [
    (1, "Customer#000000001", 0, 100.0, "BUILDING"),
    (2, "", 2, -999.99, "BUILDING"),            # empty name, negative bal
    (3, "Ω'Brien \"quote\"", 5, 0.0, ""),       # quotes, empty segment
    (4, "Customer#000000001", 2, 100.0, "AUTOMOBILE"),  # dup name, tie bal
    (5, "顧客五", 3, 987654321012.34, "MACHINERY"),      # huge bal
    (6, "c6", 8, 55.5, "HOUSEHOLD"),            # nation w/ dangling region
    (7, "c7", 999, 10.0, "FURNITURE"),          # dangling nation FK
    (8, "c8 no orders", 2, 42.0, "BUILDING"),
    (9, "c9", 6, 0.01, "BUILDING"),
    (10, "c10", 7, -0.01, "MACHINERY"),
    (11, "c11 many orders", 2, 7.5, "BUILDING"),
    (12, "c12", 0, 7.5, "AUTOMOBILE"),          # acctbal tie with c11
    (13, "c13 regex .*+?[a]", 1, 3.25, "HOUSEHOLD"),
    (14, "c14", 4, 2.0, "段"),                  # unicode segment
    (15, "c15", 2, 0.0, "BUILDING"),
    (16, "c16 orders-no-lines", 3, 5.0, "MACHINERY"),
]

_SUPPLIERS = [
    (1, "Supplier#000000001", 0, 100.0),
    (2, "", 2, -50.0),
    (3, "供應商", 5, 0.0),
    (4, "Supplier#000000001", 2, 100.0),  # dup name, tie bal
    (5, "s5", 777, 9.9),                  # dangling nation FK
    (6, "s6 no lineitems", 3, 1.0),
    (7, "s7", 2, 1.0e12),
    (8, "s8", 8, 5.0),
]

_PARTS = [
    (1, "cold widget", "Brand#2", "STANDARD", 10, 900.0),
    (2, "small widget", "Brand#4", "PROMO", 0, 0.0),      # size 0, free
    (3, "", "Brand#8", "STANDARD", -1, 100.0),            # empty name, neg size
    (4, "大型部件", "Brand#2", "", 50, 1.0e6),             # empty type
    (5, "regex [p].*rt", "Brand#4", "ECONOMY", 10, 100.0),
    (6, "dup part", "Brand#2", "STANDARD", 10, 100.0),
    (7, "dup part", "Brand#2", "STANDARD", 10, 100.0),    # dup sans key
    (8, "p8 no lineitems", "Brand#19", "LARGE", 29, 500.0),
    (9, "p9", "", "MEDIUM", 17, 250.5),                   # empty brand
    (10, "p10", "Brand#8", "PROMO", 3, 0.01),
    (11, "p11", "Brand#4", "SMALL", 100000, 999999.99),
    (12, "p12", "Brand#2", "PROMO", 5, 100.0),
]

#: o_orderdate values sit exactly AT and just BELOW the catalog's
#: filter boundaries: [1996-01-01,1998-01-01), [1996-07-01,1996-10-01),
#: [1996-01-01,1996-04-01), >=1999-01-01, plus pre-epoch + fractional.
_ORDERS = [
    (1, 1, "O", 100.0, _ts(1996, 1, 15), "1-URGENT"),
    (2, 1, "F", 100.0, _ts(1996, 1, 15), "5-LOW"),       # same cust/date, tie price
    (3, 2, "P", 0.0, _ts(1996, 7, 4, 12, 34, 56, 789000), "3-MEDIUM"),
    (4, 3, "O", -10.0, _ts(1996, 2, 29), "2-HIGH"),      # negative, leap day
    (5, 4, "F", 1.0e12, _ts(1996, 9, 30, 23, 59, 59, 999999), "4-NOT SPECIFIED"),
    (6, 5, "O", 55.5, _ts(1995, 1, 1), "1-URGENT"),
    (7, 5, "F", 55.5, _ts(1999, 1, 1), "1-URGENT"),      # >=1999 boundary, AT
    (8, 6, "O", 3.14, _ts(2001, 8, 1), "5-LOW"),
    (9, 7, "P", 1.0, _ts(1969, 12, 31, 23, 59, 59, 500000), "2-HIGH"),  # pre-epoch
    (10, 9, "O", 20.0, _ts(1996, 3, 31), "3-MEDIUM"),    # just below 1996-04-01
    (11, 9, "F", 20.0, _ts(1996, 4, 1), "3-MEDIUM"),     # AT boundary (excluded)
    (12, 10, "O", 7.0, _ts(1996, 6, 30), "1-URGENT"),
    (13, 11, "O", 5.0, _ts(1996, 7, 1), "1-URGENT"),     # Q3 start, AT (included)
    (14, 11, "F", 5.0, _ts(1996, 12, 31), "5-LOW"),
    (15, 11, "P", 5.0, _ts(1997, 12, 31, 23, 59, 59, 999999), "4-NOT SPECIFIED"),
    (16, 11, "O", 5.0, _ts(1998, 1, 1), "3-MEDIUM"),     # AT boundary (excluded)
    (17, 12, "", 12.0, _ts(1996, 5, 5), ""),             # empty status+priority
    (18, 13, "O", 33.0, _ts(1996, 5, 5), "2-HIGH"),
    (19, 14, "F", 44.0, _ts(1996, 8, 15), "1-URGENT"),
    (20, 15, "O", 0.01, _ts(1996, 11, 11), "5-LOW"),
    (21, None, "O", 9.0, _ts(1996, 10, 10), "1-URGENT"),  # NULL custkey
    (22, 16, "F", 77.0, _ts(1996, 4, 15), "2-HIGH"),      # no lineitems
]

#: (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax,
#:  returnflag, linestatus, shipdate)
_LINEITEMS = [
    # duplicate (orderkey, linenumber) — the PK the generator never violates
    (1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.08, "N", "O", _ts(1996, 1, 20)),
    (1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.08, "N", "O", _ts(1996, 1, 20)),
    (1, 2, 2, 2, 0.0, 0.0, 0.0, 0.0, "A", "F", _ts(1996, 1, 25)),        # zero qty/price
    (2, 3, 3, 1, 0.5, 0.01, 1.0, 0.5, "R", "O", _ts(1996, 2, 1)),        # full discount
    (2, 4, 4, 2, 50.0, 1.0e6, 0.1, 0.08, "N", "F", _ts(1996, 1, 10)),    # ship < order? (order 1996-01-15, ship 01-10: before)
    (3, 5, 5, 1, 1.0e6, 100.0, 0.0, 0.0, "", "O", _ts(1996, 7, 4, 12, 34, 56, 789000)),  # empty flag, huge qty
    (4, 6, 7, 1, 5.0, -100.0, 0.05, 0.0, "A", "O", _ts(1996, 2, 1)),     # negative price, ship<order
    (5, 7, 7, 1, 49.5, 999999.99, 0.02, 0.08, "N", "O", _ts(1998, 9, 2)),  # AT <=1998-09-02 bound
    (5, 7, 7, 2, 49.5, 999999.99, 0.02, 0.08, "N", "O", _ts(1998, 9, 2, 0, 0, 0, 1)),  # just ABOVE
    (6, 9, 2, 1, 3.0, 33.33, 0.04, 0.01, "R", "F", _ts(1995, 2, 14)),
    (7, 10, 1, 1, 7.0, 70.0, 0.0, 0.08, "A", "O", _ts(1999, 6, 1)),      # late ship (q4-late window)
    (7, 11, 8, 2, 7.0, 70.0, 0.0, 0.08, "A", "F", _ts(1999, 1, 2)),
    (8, 12, 3, 1, 2.5, 12.5, 0.07, 0.03, "N", "O", _ts(2001, 11, 4)),
    (9, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", _ts(1969, 12, 31, 23, 59, 59, 750000)),  # pre-epoch ship
    (10, 2, 2, 1, 20.0, 200.0, 0.1, 0.08, "N", "O", _ts(1996, 4, 2)),
    (11, 3, 4, 1, 20.0, 200.0, 0.1, 0.08, "N", "O", _ts(1996, 4, 3)),
    (12, 4, 5, 1, 6.0, 60.0, 0.06, 0.02, "A", "O", _ts(1996, 7, 1)),
    (13, 5, 7, 1, 5.0, 50.0, 0.05, 0.05, "R", "O", _ts(1996, 7, 2)),
    (13, 6, 7, 2, 5.0, 50.0, 0.05, 0.05, "R", "F", _ts(1996, 7, 2)),     # tie revenue w/ line 1
    (14, 7, 2, 1, 4.0, 40.0, 0.0, 0.0, "N", "F", _ts(1997, 1, 3)),
    (15, 9, 1, 1, 4.0, 40.0, 0.0, 0.0, "N", "O", _ts(1997, 12, 31, 23, 59, 59, 999999)),
    (16, 10, 4, 1, 4.0, 40.0, 0.0, 0.0, "N", "O", _ts(1998, 1, 5)),
    (17, 11, 5, 1, 1.5, 18.0, 0.5, 0.0, "A", "O", _ts(1996, 5, 6)),      # 50% discount
    (18, 12, 8, 1, 11.0, 121.0, 0.03, 0.08, "R", "O", _ts(1996, 5, 30)),
    (19, 1, 2, 1, 9.0, 90.0, 0.09, 0.04, "N", "F", _ts(1996, 8, 20)),
    (20, 2, 3, 1, 0.01, 0.01, 0.0, 0.0, "A", "O", _ts(1996, 11, 12)),
    (21, 3, 1, 1, 8.0, 80.0, 0.08, 0.08, "N", "O", _ts(1996, 10, 15)),   # order w/ NULL custkey
    # orphan lineitems: no matching order / part / supplier
    (77777, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", _ts(1996, 6, 6)),
    (77777, 888, 999, 2, 2.0, 20.0, 0.0, 0.0, "A", "F", _ts(1996, 6, 7)),
    (12, 888, 999, 2, 3.0, 30.0, 0.0, 0.0, "R", "O", _ts(1996, 7, 9)),   # dangling part+supp on real order
]


_I, _L, _S, _D, _TS = (T.IntegerType(), T.LongType(), T.StringType(),
                       T.DoubleType(), T.TimestampType())


def _st(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


#: single source of truth for the testdata table schemas — shared with
#: scripts/fuzz_corpus.py so the two degenerate-corpus generators can
#: never drift from each other (or from the catalog readers)
RELATIONAL_SCHEMAS = {
    "region": _st(("r_regionkey", _I), ("r_name", _S)),
    "nation": _st(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I)),
    "customer": _st(("c_custkey", _L), ("c_name", _S), ("c_nationkey", _I),
                    ("c_acctbal", _D), ("c_mktsegment", _S)),
    "supplier": _st(("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I),
                    ("s_acctbal", _D)),
    "part": _st(("p_partkey", _L), ("p_name", _S), ("p_brand", _S),
                ("p_type", _S), ("p_size", _I), ("p_retailprice", _D)),
    "orders": _st(("o_orderkey", _L), ("o_custkey", _L),
                  ("o_orderstatus", _S), ("o_totalprice", _D),
                  ("o_orderdate", _TS), ("o_orderpriority", _S)),
    "lineitem": _st(("l_orderkey", _L), ("l_partkey", _L), ("l_suppkey", _L),
                    ("l_linenumber", _I), ("l_quantity", _D),
                    ("l_extendedprice", _D), ("l_discount", _D),
                    ("l_tax", _D), ("l_returnflag", _S),
                    ("l_linestatus", _S), ("l_shipdate", _TS)),
}

DOC_SCHEMA = _st(("doc_id", _L), ("text", _S), ("lang", _S),
                 ("source", _S), ("n_chars", _L))
EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])
EV_SCHEMA = _st(("event_id", _L), ("ts", _TS), ("user_id", _L),
                ("event_type", _S), ("value", _D), ("props", _S))

_RELATIONAL_ROWS = {
    "region": _REGIONS, "nation": _NATIONS, "customer": _CUSTOMERS,
    "supplier": _SUPPLIERS, "part": _PARTS, "orders": _ORDERS,
    "lineitem": _LINEITEMS,
}


def build(out: str, spark=None) -> str:
    """Build the adversarial sf-dir at ``out`` (importable form — the
    pytest gate reuses it with the shared test session)."""
    os.makedirs(out, exist_ok=True)

    if spark is None:
        spark = get_spark("make_adversarial")

    for name, rows in _RELATIONAL_ROWS.items():
        _write_single_file(
            spark.createDataFrame(rows, RELATIONAL_SCHEMAS[name]),
            os.path.join(out, f"{name}.parquet"),
        )

    docs = [
        (i + 1, txt, lang, src, len(txt) if txt is not None else None)
        for i, (txt, lang, src) in enumerate(_DOCS)
    ]
    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    _write_single_file(
        spark.createDataFrame(docs, doc_schema),
        os.path.join(out, "documents.parquet"),
    )

    kinds = ["zero", "tiny", "huge", "neg", "unit0", "ramp", "alt"]
    embs = [
        (i + 1, _vec(kinds[i % len(kinds)]), (i % 3) - 1)  # labels -1,0,1
        for i in range(len(_DOCS))
    ]
    emb_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    _write_single_file(
        spark.createDataFrame(embs, emb_schema),
        os.path.join(out, "embeddings.parquet"),
    )

    # events: fractional-second timestamps straddling whole-minute
    # boundaries, NULL user_id, empty/unicode event types, degenerate
    # values, malformed/missing-key/NULL props
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev_rows = []
    types = ["purchase", "error", "signup", "", "点击", "purchase"]
    props = ['{"k": 3}', '{"k": 0}', "{}", "{not json", None, '{"k": -7}']
    vals = [0.0, -5.5, 1e12, 0.1, 599.999999, 42.0]
    for i in range(24):
        ev_rows.append((
            i + 1,
            base + dt.timedelta(seconds=60 * i, microseconds=400 if i % 2 else 0),
            None if i % 7 == 3 else (i % 4) + 1,
            types[i % len(types)],
            vals[i % len(vals)],
            props[i % len(props)],
        ))
    ev_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    _write_single_file(
        spark.createDataFrame(ev_rows, ev_schema),
        os.path.join(out, "events.parquet"),
    )
    return out


def main() -> None:
    out = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_adversarial")
    print(f"adversarial sf-dir written to {out}")


if __name__ == "__main__":
    main()
