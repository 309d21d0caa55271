"""Property-based tests (hypothesis): operator semantics vs independent
reference implementations on randomized inputs.

Strategy sizes are deliberately small — each example pays a Spark job;
the value is in the randomized structure (ties, duplicates, empty
groups, boundary timestamps), not the row count.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_start_spark.operators.joins import as_of_join
from flink_start_spark.operators.windows import tumbling_window_agg

BASE = datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # seconds offset
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=25,
)

_asof_case = st.tuples(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=10),  # left ts
    st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=10),  # right ts
)


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events)
def test_tumbling_window_counts_match_manual_bucketing(spark, events):
    df = spark.createDataFrame(
        [(BASE + timedelta(seconds=s), k) for s, k in events], "ts timestamp, k string"
    )
    out = tumbling_window_agg(df, "30 seconds", F.count("*").alias("cnt"))
    got = {
        int(r["window_start"].timestamp()): r["cnt"] for r in out.collect()
    }
    expected: dict[int, int] = {}
    for s, _ in events:
        bucket = int((BASE + timedelta(seconds=s)).timestamp()) // 30 * 30
        expected[bucket] = expected.get(bucket, 0) + 1
    assert got == expected


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events)
def test_session_windows_match_python_islands(spark, events):
    from flink_start_spark.operators.windows import session_window_agg

    gap = 30
    df = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s)) for s, k in events],
        "user string, ts timestamp",
    )
    out = session_window_agg(
        df, f"{gap} seconds", F.count("*").alias("n"), keys=["user"]
    )
    got = {
        (r["user"], int(r["window_start"].timestamp()), int(r["window_end"].timestamp())): r["n"]
        for r in out.collect()
    }
    # python reference: sort per key, break when diff > gap (Spark
    # merges sessions that touch exactly at the boundary — the
    # falsifying example this test originally found)
    expected: dict = {}
    by_key: dict[str, list[int]] = {}
    for s, k in events:
        by_key.setdefault(k, []).append(int((BASE + timedelta(seconds=s)).timestamp()))
    for k, ts in by_key.items():
        ts.sort()
        start, prev, n = ts[0], ts[0], 0
        for t in ts:
            if t - prev > gap:
                expected[(k, start, prev + gap)] = n
                start, n = t, 0
            n += 1
            prev = t
        expected[(k, start, prev + gap)] = n
    assert got == expected


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_asof_case)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_ts, right_ts = case
    left = spark.createDataFrame(
        [(i, "k", BASE + timedelta(seconds=s)) for i, s in enumerate(left_ts)],
        "event_id long, key string, ts timestamp",
    )
    # unique right timestamps (as_of_join requires deterministic ties by
    # contract: pre-aggregate per ts — here we dedupe)
    right_rows = [
        ("k", BASE + timedelta(seconds=s), float(s)) for s in sorted(set(right_ts))
    ]
    if right_rows:
        right = spark.createDataFrame(
            right_rows, "key string, rts timestamp, payload double"
        )
    else:
        right = spark.createDataFrame([], "key string, rts timestamp, payload double")

    for direction in ("backward", "forward", "nearest"):
        got = {
            r["event_id"]: r["payload"]
            for r in as_of_join(
                left, right, "key", "ts", "rts", ["payload"], direction=direction
            ).collect()
        }

        if not right_rows:
            expected = {i: None for i in range(len(left_ts))}
        else:
            lpd = pd.DataFrame(
                {
                    "event_id": range(len(left_ts)),
                    "ts": [BASE + timedelta(seconds=s) for s in left_ts],
                }
            ).sort_values("ts", kind="stable")
            rpd = pd.DataFrame(
                {"rts": [r[1] for r in right_rows], "payload": [r[2] for r in right_rows]}
            )
            merged = pd.merge_asof(
                lpd, rpd, left_on="ts", right_on="rts", direction=direction
            )
            expected = {
                int(r.event_id): (None if pd.isna(r.payload) else r.payload)
                for r in merged.itertuples()
            }
        assert got == expected, direction


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=30), min_size=1, max_size=8))
def test_shingles_match_python_reference(spark, texts):
    from flink_start_spark.functions.texthash import shingles

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["s"] for r in df.select(shingles(F.col("text")).alias("s")).collect()]
    for t, s in zip(texts, got):
        # twin of texthash.words: literal single-space split (runs of
        # spaces yield empty tokens, matching the oracle string_split)
        words = t.strip(" ").split(" ")
        if len(words) >= 3:
            expected = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
        else:
            expected = [" ".join(words)]
        assert s == expected, repr(t)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 5000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 10),
)
def test_weighted_reservoir_matches_python_a_res(spark, rows, k):
    import hashlib as _h

    from flink_start_spark.operators.text import weighted_reservoir_sample

    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [
        r["doc_id"]
        for r in weighted_reservoir_sample(df, "n_chars", k=k).collect()
    ]

    def score(doc_id, w):
        u = int(_h.md5(f"wrs|{doc_id}".encode()).hexdigest()[:12], 16) / 16**12
        return u ** (1.0 / w)

    expect = [
        d for d, w in sorted(rows, key=lambda t: (-score(*t), t[0]))[:k]
    ]
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=25),
        min_size=1,
        max_size=10,
    )
)
def test_ngram_novelty_matches_python_reference(spark, texts):
    from flink_start_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["novel_frac"])
        for r in ngram_novelty(df, "text", "doc_id", n=3).collect()
    }

    def sh(t):
        # literal single-space split like texthash.words (runs of
        # spaces yield empty tokens — the oracle string_split rule)
        w = t.strip(" ").split(" ")
        if len(w) >= 3:
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        return {" ".join(w)}

    all_sh = [sh(t) for t in texts]
    from collections import Counter

    df_count = Counter(g for s in all_sh for g in s)
    for i, s in enumerate(all_sh):
        novel = sum(1 for g in s if df_count[g] == 1)
        assert got[i][0] == len(s), (i, texts[i])
        assert got[i][1] == round(novel / len(s), 6), (i, texts[i])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(-10, 10, allow_nan=False, width=32),
            min_size=4,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_quantize_int8_codes_match_python(spark, vecs):
    import math

    from flink_start_spark.operators.similarity import quantize_int8

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    import numpy as np

    for i, v in rows:
        x = [float(np.float32(e)) for e in v]
        scale = max(abs(e) for e in x)
        q = [0] * len(x) if scale == 0 else [math.floor(e / scale * 127) for e in x]
        assert got[i]["q_sum"] == sum(q), (i, v)
        assert got[i]["q_l1"] == sum(abs(c) for c in q), (i, v)


# ---------------------------------------------------------------------
# passage_dedup vs a pure-python reference
# ---------------------------------------------------------------------

def _passage_dedup_ref(docs: dict[int, str], w: int) -> dict[int, tuple[int, int, str]]:
    """Independent reference: first-occurrence-wins over (doc_id, pos)."""
    import math

    chunks = {}
    for did in sorted(docs):
        # mirror split(trim, ' '): literal single-space rule, empty
        # text -> ['']
        ws = docs[did].strip(" ").split(" ")
        n = max(1, math.ceil(len(ws) / w))
        chunks[did] = [" ".join(ws[i * w : (i + 1) * w]) for i in range(n)]
    seen = {}
    for did in sorted(chunks):
        for pos, p in enumerate(chunks[did]):
            seen.setdefault(p, (did, pos))
    out = {}
    for did, cl in chunks.items():
        kept = [p for pos, p in enumerate(cl) if seen[p] == (did, pos)]
        out[did] = (len(cl), len(kept), " ".join(kept))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_passage_dedup_matches_reference(spark, texts):
    import hashlib

    from flink_start_spark.operators.dedup import passage_dedup

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_passages"], r["n_kept"], r["dedup_md5"])
        for r in passage_dedup(df, "text", "doc_id", passage_words=3).collect()
    }
    ref = _passage_dedup_ref(docs, 3)
    want = {
        did: (n, k, hashlib.md5(txt.encode()).hexdigest())
        for did, (n, k, txt) in ref.items()
    }
    assert got == want


# ---------------------------------------------------------------------
# kmeans_lloyd vs a pure-python Lloyd mirror
# ---------------------------------------------------------------------

def _kmeans_ref(vecs: dict[int, list[float]], k: int, iters: int):
    """Same deterministic algorithm in plain python: md5-ranked init,
    argmin-sq-L2 with cell tie-break, quantized mean recompute."""
    import hashlib
    import math

    Q = 1 << 20
    ranked = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = {c: [float(x) for x in vecs[i]] for c, i in enumerate(ranked[:k])}

    def assign(cs):
        a = {}
        for i, v in vecs.items():
            best = min(
                cs,
                key=lambda c: (sum((x - y) * (x - y) for x, y in zip(v, cs[c])), c),
            )
            a[i] = best
        return a

    for _ in range(iters):
        a = assign(cents)
        new = {}
        for c in set(a.values()):
            members = [vecs[i] for i in a if a[i] == c]
            dim = len(members[0])
            new[c] = [
                sum(math.floor(m[d] * Q) for m in members) / (len(members) * Q)
                for d in range(dim)
            ]
        cents = new
    return assign(cents)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_kmeans_matches_python_lloyd(spark, vecs):
    from flink_start_spark.operators.similarity import kmeans_lloyd

    data = {i: v for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        [(i, v) for i, v in data.items()], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans_lloyd(df, k=2, iters=2).collect()
    }
    # float32 storage: reference must see the same rounded values
    stored = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.select("vec_id", "embedding").collect()
    }
    assert got == _kmeans_ref(stored, k=2, iters=2)


# ---------------------------------------------------------------------
# semdedup_flags vs a pure-python mirror
# ---------------------------------------------------------------------

def _semdedup_ref(vecs: dict[int, list[float]], n_cells: int, thr: float):
    """Same algorithm in plain python: md5-ranked centroids, argmin
    assignment with cell tie-break, within-cell cosine to smaller ids,
    rounded at 6 before the threshold comparison."""
    import hashlib
    import math

    ranked = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = {c: vecs[i] for c, i in enumerate(ranked[:n_cells])}
    cell = {
        i: min(
            cents,
            key=lambda c: (
                sum((x - y) * (x - y) for x, y in zip(v, cents[c])),
                c,
            ),
        )
        for i, v in vecs.items()
    }
    out = {}
    for i, v in vecs.items():
        best = None
        for j, w in vecs.items():
            if j >= i or cell[j] != cell[i]:
                continue
            dot = sum(x * y for x, y in zip(v, w))
            nv = math.sqrt(sum(x * x for x in v))
            nw = math.sqrt(sum(x * x for x in w))
            cos = round(dot / (nv * nw), 6) if nv and nw else None
            if cos is not None and (best is None or cos > best):
                best = cos
        out[i] = (cell[i], best, best is not None and best >= thr)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(min_value=0.125, max_value=4, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_semdedup_matches_python_mirror(spark, vecs):
    from flink_start_spark.operators.similarity import semdedup_flags

    data = {i: v for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        [(i, v) for i, v in data.items()], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["cell"], r["max_cosine_smaller"], r["pruned"])
        for r in semdedup_flags(df, n_cells=2, threshold=0.98).collect()
    }
    stored = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.select("vec_id", "embedding").collect()
    }
    assert got == _semdedup_ref(stored, n_cells=2, thr=0.98)


# ------------------------------------------------------- exact selection
_sel_rows = st.lists(
    st.tuples(
        st.sampled_from(["hot", "hot", "hot", "k1", "k2"]),  # skewed key mix
        st.integers(min_value=0, max_value=12),  # tie-heavy value lattice
        st.integers(min_value=0, max_value=10_000),  # unique-ish id seed
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_sel_rows)
def test_exact_rank_value_matches_sorted_pick(spark, rows):
    from flink_start_spark import cache as C
    from flink_start_spark.operators.selection import exact_rank_value

    data = [(k, float(v) / 3.0, f"id{i:05d}_{j}") for j, (k, v, i) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v double, tid string")
    got = {
        r["k"]: (r["med"], r["_gcnt"])
        for r in exact_rank_value(df, ["k"], "v", out_col="med").collect()
    }
    C.release()
    expected = {}
    by_key: dict[str, list[float]] = {}
    for k, v, _ in data:
        by_key.setdefault(k, []).append(v)
    for k, vs in by_key.items():
        vs.sort()
        expected[k] = (vs[(len(vs) + 1) // 2 - 1], len(vs))
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_sel_rows, st.integers(min_value=2, max_value=7))
def test_with_global_rank_is_a_permutation_free_rank(spark, rows, tiles):
    from flink_start_spark.operators.selection import (
        ntile_from_rank,
        with_global_rank,
    )

    data = [(k, float(v) / 3.0, f"id{i:05d}_{j}") for j, (k, v, i) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v double, tid string")
    ranked = with_global_rank(df, ["k"], "v", ["tid"])
    out = ranked.withColumn(
        "tile", ntile_from_rank(F.col("_grank"), F.col("_gcnt"), tiles)
    ).collect()
    # rank is exactly the 1..n position under (v, tid) per key
    by_key: dict[str, list] = {}
    for k, v, tid in data:
        by_key.setdefault(k, []).append((v, tid))
    pos = {
        (k, tid): i + 1
        for k, vs in by_key.items()
        for i, (v, tid) in enumerate(sorted(vs))
    }
    for r in out:
        assert r["_grank"] == pos[(r["k"], r["tid"])], r
        n, t, i = r["_gcnt"], tiles, r["_grank"]
        q, rem = divmod(n, t)
        expect_tile = (
            -(-i // (q + 1)) if i <= (q + 1) * rem else rem + -(-(i - (q + 1) * rem) // q)
        )
        assert r["tile"] == expect_tile, r


_scd2_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # custkey (force collisions)
        st.integers(min_value=0, max_value=20),     # day offset (force ties)
        st.sampled_from(["O", "F", "P"]),           # status
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_scd2_orders)
def test_scd2_history_matches_reference_interval_builder(spark, tmp_path_factory, orders):
    """SCD2 build vs an independent pure-python interval builder on
    randomized order streams (duplicate days, repeated statuses, single-
    order customers)."""
    from flink_start_spark.plans import QUERIES

    rows = [
        (i + 1, ck, status, BASE + timedelta(days=day))
        for i, (ck, day, status) in enumerate(orders)
    ]
    d = tmp_path_factory.mktemp("scd2prop")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    got = {
        (r["custkey"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in QUERIES["scd2_order_status_history"].spark(spark, str(d)).collect()
    }

    # reference: sort per customer by (date, orderkey); collapse runs;
    # chain valid_to from the next retained row
    expect = set()
    by_ck: dict[int, list] = {}
    for ok, ck, status, dt in rows:
        by_ck.setdefault(ck, []).append((dt, ok, status))
    for ck, evs in by_ck.items():
        evs.sort()
        kept = [e for i, e in enumerate(evs) if i == 0 or e[2] != evs[i - 1][2]]
        for i, (dt, ok, status) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            expect.add(
                (
                    ck,
                    status,
                    int(dt.timestamp()),
                    int(nxt.timestamp()) if nxt else None,
                    nxt is None,
                )
            )
    assert got == expect


_snapshot_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),     # user (force collisions)
        st.integers(min_value=0, max_value=29),    # day offset in January
        st.integers(min_value=0, max_value=400),   # value in tenths (exact)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_snapshot_events)
def test_snapshot_diff_matches_reference_classifier(spark, tmp_path_factory, events):
    """Changeset classification vs an independent pure-python build of
    both snapshot profiles on randomized event streams (users straddling
    the window cut, value drift, single-window users)."""
    from datetime import datetime, timedelta
    from decimal import Decimal

    from flink_start_spark.plans import QUERIES

    rows = [
        (i + 1, datetime(2024, 1, 1) + timedelta(days=day, hours=1), u, "view",
         v / 10.0, "{}")
        for i, (u, day, v) in enumerate(events)
    ]
    d = tmp_path_factory.mktemp("snapprop")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        r["user_id"]: r["action"]
        for r in QUERIES["snapshot_diff_changeset"].spark(spark, str(d)).collect()
    }

    cut = datetime(2024, 1, 16)
    a: dict[int, tuple[int, Decimal]] = {}
    b: dict[int, tuple[int, Decimal]] = {}
    for _, ts, u, _t, v, _p in rows:
        side = a if ts < cut else b
        n, s = side.get(u, (0, Decimal(0)))
        # exact decimal accumulation mirrors the DECIMAL(20,6) sums
        side[u] = (n + 1, s + Decimal(str(v)))
    expect = {}
    for u in set(a) | set(b):
        if u not in a:
            expect[u] = "insert"
        elif u not in b:
            expect[u] = "delete"
        elif a[u][0] != b[u][0] or a[u][1] != b[u][1]:
            expect[u] = "update"
        else:
            expect[u] = "unchanged"
    assert got == expect


_upsert_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),   # key
        st.integers(min_value=0, max_value=9),   # order value (force ties)
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_upsert_rows)
def test_latest_per_key_matches_python_max(spark, rows):
    """The MERGE reduce (max of struct) vs python max over the same
    tuple order — including order-column ties, where the payload struct
    itself breaks the tie deterministically."""
    from flink_start_spark.streaming.upsert import latest_per_key

    df = spark.createDataFrame(rows, "k long, ts long, p long")
    got = {
        r["k"]: (r["ts"], r["p"])
        for r in latest_per_key(df, ["k"], ["ts"]).collect()
    }
    expect = {}
    for k, ts, p in rows:
        # mirror max(struct(ts, struct(ts, p))): compare (ts, (ts, p))
        cand = (ts, (ts, p))
        if k not in expect or cand > expect[k]:
            expect[k] = cand
    assert got == {k: (v[1][0], v[1][1]) for k, v in expect.items()}


_pack_lens = st.lists(
    st.integers(min_value=0, max_value=300), min_size=1, max_size=30
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_pack_lens)
def test_sequence_pack_matches_python_prefix_layout(spark, lens):
    """Randomized token lengths (zeros, window-straddlers, window-sized
    exact fits) vs the pure-python concatenated-stream layout."""
    from flink_start_spark.operators.packing import sequence_pack

    window = 100
    df = spark.createDataFrame(list(enumerate(lens)), "doc_id long, n long")
    got = {
        r["doc_id"]: (
            r["start_offset"], r["pack_id"], r["offset_in_pack"], r["end_pack_id"]
        )
        for r in sequence_pack(df, "doc_id", "n", window).collect()
    }
    start, expect = 0, {}
    for i, n in enumerate(lens):
        pack = start // window
        end_pack = (start + n - 1) // window if n > 0 else pack
        expect[i] = (start, pack, start % window, end_pack)
        start += n
    assert got == expect


_lead_rows = st.lists(
    st.tuples(
        st.sampled_from(["aa", "ab", "ba", "zz"]),  # heavy name ties
        st.integers(min_value=0, max_value=60),
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda t: t[1],  # unique keys, names collide freely
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_lead_rows, st.integers(min_value=1, max_value=8))
def test_global_sorted_leads_matches_python_total_order(spark, rows, nparts):
    """Randomized (duplicate-heavy names, random partition counts
    including far-more-ranges-than-rows) vs leads over the python-sorted
    total order — the boundary-patch correctness under every range
    shape hypothesis can produce."""
    from flink_start_spark.plans.sql_surface import global_sorted_leads

    df = spark.createDataFrame(rows, "name string, key long")
    out = global_sorted_leads(df, "name", "key", w=3, n_partitions=nparts)
    got = {
        (r["name"], r["key"]): (r["k1"], r["n1"], r["k2"], r["n2"])
        for r in out.collect()
    }
    srt = sorted(rows)
    expect = {}
    for i, (nm, k) in enumerate(srt):
        vals = []
        for d in (1, 2):
            if i + d < len(srt):
                nn, kk = srt[i + d]
                vals += [kk, nn]
            else:
                vals += [None, None]
        expect[(nm, k)] = tuple(vals)
    assert got == expect


_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),   # start second
        st.integers(min_value=1, max_value=20),   # duration seconds
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_intervals)
def test_interval_peak_matches_brute_force(spark, iv):
    """Randomized half-open intervals (shared endpoints, containments,
    duplicates) vs brute-force concurrency evaluated at every start
    instant — where a max of half-open intervals is always attained."""
    from flink_start_spark.operators.windows import interval_peak

    rows = [(s * 1_000_000, (s + d) * 1_000_000) for s, d in iv]
    df = spark.createDataFrame(rows, "s_us long, e_us long")
    got = interval_peak(df, "s_us", "e_us").collect()[0]
    best, at = 0, None
    for t in sorted({s for s, _ in rows}):
        c = sum(1 for s, e in rows if s <= t < e)
        if c > best:
            best, at = c, t
    assert got["peak_concurrent"] == best
    assert got["first_peak_epoch_s"] == at // 1_000_000
