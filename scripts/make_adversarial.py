"""Build an ADVERSARIAL sf-dir: sf0.001's relational tables verbatim,
with documents / embeddings / events replaced by degenerate-but-
schema-valid rows the generated corpus never produces — empty and
whitespace-only text, unicode (CJK / emoji / combining / RTL), regex
metacharacters, quotes, control characters (including the BPE
oracle's chr(1)/chr(2) marker bytes), pathological repetition, exact
and near duplicates, zero-norm / tiny / huge embeddings, NULL
user_ids, malformed JSON props, and fractional-second timestamps
straddling window boundaries. (NULL text is deliberately absent: the
corpus contract pins text/n_chars non-null, enforced at ingest by
operators/text.py::validate_documents — see the _DOCS comment.)

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

SRC_SF = "/root/testdata/sf0.001"
KEEP = "region nation customer supplier part orders lineitem".split()

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


def build(out: str, spark=None) -> str:
    """Build the adversarial sf-dir at ``out`` (importable form — the
    pytest gate reuses it with the shared test session)."""
    os.makedirs(out, exist_ok=True)
    for t in KEEP:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.copy(os.path.join(SRC_SF, f"{t}.parquet"), dst)

    if spark is None:
        spark = get_spark("make_adversarial")

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
