"""Unit tests for the training-data extension operators (SURVEY §2b)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_start_spark.functions import texthash as TH
from flink_start_spark.functions import vector as V
from flink_start_spark.operators import dedup as D
from flink_start_spark.operators import multimodal as M
from flink_start_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        # near-dup of 1: one appended word -> shingle Jaccard 7/8
        (2, "the quick brown fox jumps over the lazy dog indeed"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different words about spark engines here"),
        (5, "dog lazy the over jumps fox brown quick the"),  # reorder of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_deterministic_survivor(docs):
    out = {r["doc_id"]: r["n_copies"] for r in D.exact_dedup(docs, "text", "doc_id").collect()}
    assert out[1] == 2  # doc 3 collapsed into doc 1 (min id survives)
    assert 3 not in out
    assert out[2] == 1 and out[4] == 1


def test_fingerprint_dedup_catches_reorder(docs):
    out = D.fingerprint_dedup(docs, "text", "doc_id").collect()
    by_survivor = {r["doc_id"]: r["n_docs"] for r in out}
    # docs 1, 3 (exact) and 5 (reorder, same word bag) share a fingerprint
    assert by_survivor[1] == 3
    assert by_survivor[2] == 1


def test_minhash_salt_is_engine_portable(spark):
    # hash_i = 8-hex chunk (i%4) of md5("{i//4}|" + shingle), min over set
    df = spark.createDataFrame([("a b c d e",)], "text string")
    sig = df.select(
        TH.minhash_signature(TH.shingles(F.col("text")), 6).alias("s")
    ).collect()[0]["s"]
    shingles = ["a b c", "b c d", "c d e"]
    expected = [
        min(
            hashlib.md5(f"{k // 4}|{s}".encode()).hexdigest()[(k % 4) * 8 : (k % 4) * 8 + 8]
            for s in shingles
        )
        for k in range(6)
    ]
    assert sig == expected


def test_minhash_near_dups_finds_pair(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_near_dups(docs, "text", "doc_id", threshold=0.3).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0  # exact dup
    # near dup at shingle Jaccard 7/8 = 0.875 (deterministic under the
    # fixed hash family; band-collision odds 97% for a random family)
    assert (1, 2) in pairs and pairs[(1, 2)] == 0.875
    assert all(4 not in p for p in pairs)


def test_simhash_near_dup_blocks_equal_bruteforce(docs):
    # the pigeonhole block join must produce exactly the brute-force set
    sv = {r["doc_id"]: r["simhash"] for r in D.simhash_values(docs, "text", "doc_id").collect()}
    brute = {
        (a, b)
        for a in sv
        for b in sv
        if a < b and bin(sv[a] ^ sv[b]).count("1") <= 3
    }
    block = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_near_dups(docs, "text", "doc_id", max_hamming=3).collect()
    }
    assert block == brute
    assert (1, 3) in block  # exact dups have identical simhash


def test_connected_components_path_graph(spark):
    # a 6-node path needs ~diameter rounds of label propagation — the
    # worst case for convergence; plus a separate 2-clique and an edge
    # ordering that doesn't help the min label travel
    pairs = spark.createDataFrame(
        [(5, 6), (3, 4), (1, 2), (2, 3), (4, 5), (8, 9)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["cluster"] for r in D.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 8: 8, 9: 8}


def test_connected_components_long_path_log_rounds(spark):
    # 200-node path: plain min-label propagation needs ~200 rounds; the
    # propagation+pointer-jump variant reaches 2^k - 1 hops after k
    # rounds, so 8 rounds label everything and round 9 detects the
    # fixpoint. max_iters=9 both pins the O(log diameter) bound and
    # proves the convergence check — a warning here means regression.
    import warnings as _w

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        rows = D.connected_components(pairs, max_iters=9).collect()
    assert len(rows) == 201
    assert {r["cluster"] for r in rows} == {0}


def test_connected_components_warns_on_truncation(spark):
    import warnings as _w

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="max_iters"):
        labels = D.connected_components(pairs, max_iters=2)
    # truncated labels are partial (multiple labels in one component)
    assert len({r["cluster"] for r in labels.collect()}) > 1


def test_winnowing_matches_python_reference(docs):
    out = {
        r["doc_id"]: r
        for r in D.winnowing_fingerprints(docs, "text", "doc_id").collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in texts.items():
        grams = [text[i : i + 8] for i in range(max(len(text) - 7, 1))]
        hs = [hashlib.md5(g.encode()).hexdigest()[:8] for g in grams]
        mins = sorted({min(hs[i : i + 4]) for i in range(max(len(hs) - 3, 1))})
        assert out[doc_id]["fps"] == mins, doc_id
        assert out[doc_id]["n_grams"] == len(grams)


def test_winnowing_shared_pairs_containment(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in D.winnowing_shared_pairs(docs, "text", "doc_id").collect()
    }
    assert pairs[(1, 3)] == 1.0  # exact dup: identical fingerprint sets
    # doc 4 shares no 11-char substring with doc 1
    assert (1, 4) not in pairs


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = S.brute_force_topk(df, df.filter(F.col("vec_id") < 2), k=3)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    V = vecs.astype("float64")
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    for q in range(2):
        order = sorted(
            [(round(sims[q, j], 6), j) for j in range(20) if j != q],
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, j) in enumerate(order[:3], start=1):
            assert got[(q, rank)] == j


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_approx_metrics_within_tolerance(spark, sf_dir):
    # The query now emits exact aggregates + tolerance booleans (so the
    # driver hash-checks it against DuckDB); the sharper numeric
    # tolerance lives HERE: raw sketch vs exact, pinned at two scale
    # factors so both the small-n and larger-n regimes are covered.
    from flink_start_spark.plans import QUERIES
    from flink_start_spark.sources.catalog import load_table

    rows = QUERIES["approx_metrics"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["users_within_bound"] is True, r["event_type"]
        assert r["median_in_band"] is True, r["event_type"]

    ev = load_table(spark, "events", sf_dir)
    both = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.median("value").alias("median_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias(
                "approx_median_value"
            ),
        )
        .collect()
    }
    assert set(both) == {r["event_type"] for r in rows}
    for et, e in both.items():
        # HLL++ default rsd is 5%; n is small enough here that the
        # sketch is near-exact, so 5% is a conservative pin
        assert abs(e["approx_users"] - e["users"]) / e["users"] < 0.05, et
        # percentile_approx: generous band around median
        assert abs(e["approx_median_value"] - e["median_value"]) <= abs(e["median_value"]) * 0.2 + 1.0, et


def test_rp_sign_bits_match_numpy(spark):
    import numpy as np

    from flink_start_spark.functions import vector as V

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["key"]
        for r in df.select(
            "vec_id", V.rp_sign_bits(F.col("embedding"), 8, 64, offset=8).alias("key")
        ).collect()
    }
    W = np.array([V.rp_weights(8 + j, 64) for j in range(8)])  # planes 8..15
    dots = vecs.astype("float64") @ W.T
    for i in range(50):
        expected = sum(1 << j for j in range(8) if dots[i, j] >= 0)
        assert got[i] == expected, i


@pytest.mark.slow
def test_ivf_topk_recall_on_clustered_data(spark):
    # IVF's claim vs sign-LSH: recall holds when embeddings cluster.
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16)) * 5
    vecs = np.vstack(
        [centers[i % 4] + rng.normal(size=16) * 0.3 for i in range(120)]
    ).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter(F.col("vec_id") < 6)
    # 8 sampled centroids cover all 4 clusters (deterministic: the 8
    # lowest-md5 ids hit every residue class); 2-probe search then sees
    # each query's own cluster even when a cluster is split across cells
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.ivf_topk(df, queries, k=3, n_cells=8, n_probe=2).collect()
    }
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.brute_force_topk(df, queries, k=3).collect()
    }
    agree = sum(got.get(k) == v for k, v in brute.items())
    assert agree >= 0.8 * len(brute), (agree, len(brute))


def test_auto_n_cells_bounds_cell_population(spark):
    """The n_cells scaling rule is ENFORCED, not prose (round-4 verdict
    item 4): with the default n_cells=None, the quantizer picks
    max(16, n/1000) cells, so max |cell| stays ~flat as the corpus
    grows — at a FIXED 16 cells, 4x the data would mean ~4x the cell
    population and 16x the cell-scoped self-join work."""
    from flink_start_spark import cache as C2

    def mk(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[F.sin((F.col("id") + 1) * float(j + 1)) for j in range(8)]
            ).cast("array<float>").alias("embedding"),
        )

    max_cell = {}
    for n in (20_000, 80_000):
        df = mk(n)
        assert S.auto_n_cells(df) == n // 1000
        assigned, cents = S.precompute_cells(df)  # default => auto rule
        assert cents.count() == n // 1000
        max_cell[n] = (
            assigned.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
        )
        C2.release()
    # sampled centroids are uneven, but the rule holds the ceiling flat
    # (measured 2734 vs 2735); allow 2x headroom for fixture drift
    assert max_cell[80_000] <= 2 * max_cell[20_000], max_cell
    # the min clamp: tiny corpora still get 16 cells
    assert S.auto_n_cells(mk(500)) == 16


def test_multimodal_metadata_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in M.binary_metadata(M.with_binary_payload(df)).collect()}
    assert out[1]["n_bytes"] == 5
    assert out[1]["sha256_8"] == hashlib.sha256(b"hello").hexdigest()[:8]
    assert out[1]["first_byte"] == ord("h")
    assert out[2]["n_bytes"] == 0 and out[2]["first_byte"] is None


def test_pcm_payload_layout_and_decode(spark):
    # 'é' (UTF-8 0xC3 0xA9) exercises both the multibyte rule (one
    # sample per byte) and the negative (two's-complement) branch:
    # 0xC3*257 = 50115 → -15421, 0xA9*257 = 43433 → -22103.
    df = spark.createDataFrame(
        [(1, "hé"), (2, "")], "doc_id long, text string"
    )
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in M.with_pcm_payload(df).collect()
    }
    # byte-exact layout: magic, rate 8000, count, big-endian samples
    b = payloads[1]
    assert b[:4] == b"PCM1"
    import struct as _struct

    rate, n = _struct.unpack(">HH", b[4:8])
    assert (rate, n) == (8000, 3)
    expected = [bb * 257 for bb in "hé".encode()]  # byte duplicated
    assert b[8:] == _struct.pack(">3H", *expected)
    assert payloads[2] == b"PCM1" + _struct.pack(">HH", 8000, 0)

    out = {
        r["doc_id"]: r for r in M.pcm_decode(M.with_pcm_payload(df)).collect()
    }
    r1 = out[1]
    assert r1["header_hex"] == b[:8].hex().upper()
    assert (r1["sample_rate"], r1["n_samples"]) == (8000, 3)
    assert r1["duration_ms"] == 3 * 1000.0 / 8000
    signed = [v - 65536 if v >= 32768 else v for v in expected]
    assert r1["mean_amp"] == sum(signed) / 3
    assert r1["peak_amp"] == max(abs(v) for v in signed)
    assert r1["rms"] == pytest.approx(
        (sum(v * v for v in signed) / 3) ** 0.5, abs=0
    )
    r2 = out[2]
    assert (r2["n_samples"], r2["mean_amp"], r2["peak_amp"], r2["rms"]) == (
        0,
        0.0,
        0,
        0.0,
    )


def test_pcm_decode_rejects_bad_magic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"XXXX\x1f\x40\x00\x00"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="bad magic"):
        M.pcm_decode(df).collect()


def test_fake_frame_sample_shapes(spark):
    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "tiny"), (3, "")], "doc_id long, text string"
    )
    rows = M.fake_frame_sample(
        M.with_binary_payload(df), n_frames=4, frame_bytes=16
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100-byte payload: 4 evenly spaced 16-byte frames at offsets 0..84
    f1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_offset"] for r in f1] == [0, 28, 56, 84]
    assert all(len(r["frame"]) == 16 for r in f1)
    # short payload: one whole-payload frame; empty payload: no rows
    assert len(by_doc[2]) == 1 and bytes(by_doc[2][0]["frame"]) == b"tiny"
    assert 3 not in by_doc


def _ppm_expect(text: str):
    """Reference PPM payload + per-channel stats, computed straight
    from the documented layout (the golden twin of with_ppm_payload)."""
    raw = text.encode("utf-8")
    n = len(raw)
    w, h = 4 + n % 5, 4 + (n // 7) % 5
    npix = w * h * 3
    raster = bytes(raw[j % n] if n else 0 for j in range(npix))
    payload = f"P6\n{w} {h}\n255\n".encode() + raster
    chans = [
        [raster[j] for j in range(npix) if j % 3 == c] for c in range(3)
    ]
    return payload, w, h, [sum(c) / len(c) for c in chans], max(raster)


def _two_level_expect(vecs: dict[int, list[float]], n_cells: int, probe: int = 1):
    """Pure-python mirror of deterministic_centroids +
    assign_cells_two_level: md5-ranked centroids, first-sqrt(k) cells
    as super-centroids, centroid->super and vector->super->cell argmin
    with the identical (sq_dist, id) tie-break; ``probe`` nearest
    supers' members are unioned before the final argmin."""
    import math

    ranked = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    centers = {c: vecs[i] for c, i in enumerate(ranked[:n_cells])}
    n_super = max(1, math.isqrt(n_cells))

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cent_super = {
        c: min(range(n_super), key=lambda s: (d2(v, centers[s]), s))
        for c, v in centers.items()
    }
    members = {}
    for c, s in cent_super.items():
        members.setdefault(s, []).append(c)
    out = {}
    for i, v in vecs.items():
        live = sorted(members)
        top = sorted(live, key=lambda s_: (d2(v, centers[s_]), s_))[:probe]
        cand = [c for s_ in top for c in members[s_]]
        out[i] = min(cand, key=lambda c: (d2(v, centers[c]), c))
    return out


def test_two_level_assignment_mirrors_rule_exactly(spark):
    # 40 deterministic pseudo-random 4-dim vectors, 9 cells -> 3
    # supers; dim 0 carries i/40 so every vector is DISTINCT (the
    # exact-recovery claim below is only its-own-cell for distinct
    # centers — duplicated centers tie-break to the smaller cell id,
    # which the duplicate-center test pins separately)
    vecs = {
        i: [i / 40.0] + [((i * 37 + d * 11) % 17) / 7.0 - 1.1 for d in range(3)]
        for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = S.deterministic_centroids(df, n_cells=9)
    got = {
        r["vec_id"]: r["cell"]
        for r in S.assign_cells_two_level(df, cents).collect()
    }
    assert got == _two_level_expect(vecs, 9)
    # exact-recovery invariant: vectors equal to a centroid get that
    # centroid's own cell (both levels see flat-identical distances)
    ranked = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    for cell, vid in enumerate(ranked[:9]):
        assert got[vid] == cell


def test_two_level_assignment_duplicate_centers_no_gap(spark):
    # duplicate centers force a super-centroid to tie-break into a
    # SMALLER sid's group, leaving its own sid without a member row —
    # the sid-matched lookup must neither crash (ANSI out-of-bounds)
    # nor misroute; the python mirror pins the expected cells
    base = [1.0, 0.0, 0.0]
    vecs = {i: base[:] for i in range(4)}  # centroids 0..3 all identical
    vecs.update({i: [0.0, float(i), 1.0] for i in range(4, 12)})
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = S.deterministic_centroids(df, n_cells=4)  # 2 supers
    got = {
        r["vec_id"]: r["cell"]
        for r in S.assign_cells_two_level(df, cents).collect()
    }
    assert got == _two_level_expect(vecs, 4)


def test_two_level_super_probe_mirrors_and_converges_to_flat(spark):
    vecs = {
        i: [i / 50.0] + [((i * 29 + d * 13) % 19) / 8.0 for d in range(3)]
        for i in range(50)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = S.deterministic_centroids(df, n_cells=9)  # 3 supers
    got_p2 = {
        r["vec_id"]: r["cell"]
        for r in S.assign_cells_two_level(df, cents, super_probe=2).collect()
    }
    assert got_p2 == _two_level_expect(vecs, 9, probe=2)
    # probing ALL supers scans every cell's members -> must equal flat
    # argmin exactly (same (d2, cell) tie-break)
    got_all = {
        r["vec_id"]: r["cell"]
        for r in S.assign_cells_two_level(df, cents, super_probe=3).collect()
    }
    flat = {
        r["vec_id"]: r["cell"]
        for r in S.assign_cells_maponly(df, cents).collect()
    }
    assert got_all == flat


def test_semdedup_with_two_level_assign_fn(spark):
    # the assign_fn hook end-to-end: SemDeDup over two-level cells.
    # With probe-all the assignment IS flat argmin, so the whole
    # operator output must equal the default bit-for-bit; with p=1 the
    # schema/contract holds (approximate cells, same survivor rule).
    vecs = {
        i: [i / 30.0] + [((i * 31 + d * 7) % 13) / 6.0 for d in range(3)]
        for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    probe_all = lambda c, cents, ic, vc: S.assign_cells_two_level(  # noqa: E731
        c, cents, ic, vc, super_probe=10**6
    )
    base = {
        tuple(r) for r in S.semdedup_flags(df, n_cells=9, threshold=0.9).collect()
    }
    via_two = {
        tuple(r)
        for r in S.semdedup_flags(
            df, n_cells=9, threshold=0.9, assign_fn=probe_all
        ).collect()
    }
    assert via_two == base and len(base) == 30
    approx = S.semdedup_flags(
        df, n_cells=9, threshold=0.9, assign_fn=S.assign_cells_two_level
    ).collect()
    assert len(approx) == 30
    assert {r["vec_id"] for r in approx} == set(vecs)


def _probe_vecs(n: int):
    return {
        i: [i / float(n)] + [((i * 23 + d * 5) % 11) / 5.0 for d in range(3)]
        for i in range(n)
    }


def test_multiprobe_assignment_mirrors_rank_rule(spark):
    # flat cell_probe=2: one row per (vector, probed cell), _crk = rank
    # under the same (d2, cell) total order array_min uses for p=1
    vecs = _probe_vecs(36)
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = S.deterministic_centroids(df, n_cells=8)
    centers = {r["cell"]: r["center"] for r in cents.collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    expect = {}
    for i, v in vecs.items():
        ranked = sorted(centers, key=lambda c: (d2(v, centers[c]), c))
        expect.update({(i, c): rk + 1 for rk, c in enumerate(ranked[:2])})
    got = {
        (r["vec_id"], r["cell"]): r["_crk"]
        for r in S.assign_cells_maponly(df, cents, cell_probe=2).collect()
    }
    assert got == expect
    # the _crk = 1 slice IS the single-probe assignment
    single = {
        (r["vec_id"], r["cell"]): 1
        for r in S.assign_cells_maponly(df, cents).collect()
    }
    assert {k: v for k, v in got.items() if v == 1} == single
    # two-level probe-all-supers at cell_probe=2 must match flat p=2
    got_two = {
        (r["vec_id"], r["cell"]): r["_crk"]
        for r in S.assign_cells_two_level(
            df, cents, super_probe=10**6, cell_probe=2
        ).collect()
    }
    assert got_two == expect


def test_semdedup_cell_probe_monotone_and_exact_recovery(spark):
    # cell_probe is the pair-recall dial: p=1 == default bit-for-bit,
    # pruned sets grow monotonically with p (a pair sharing the rank-1
    # cell still shares it at p=2), and p >= n_cells recovers EXACT
    # all-pairs semantics (every vector in every cell)
    vecs = _probe_vecs(30)
    # plant a boundary near-dup pair: 29's vector nearly equals 7's
    vecs[29] = [x + 1e-4 for x in vecs[7]]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    thr = 0.95

    def flags(p):
        out = S.semdedup_flags(df, n_cells=9, threshold=thr, cell_probe=p)
        rows = out.collect()
        assert len(rows) == 30 and {r["vec_id"] for r in rows} == set(vecs)
        return {r["vec_id"] for r in rows if r["pruned"]}

    base = {
        r["vec_id"]
        for r in S.semdedup_flags(df, n_cells=9, threshold=thr).collect()
        if r["pruned"]
    }
    p1, p2, pall = flags(1), flags(2), flags(9)
    assert p1 == base
    assert p1 <= p2 <= pall
    # exact ground truth: smaller-id neighbor with cosine >= thr
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    exact = {
        j
        for j in vecs
        for i in vecs
        if i < j and cos(vecs[i], vecs[j]) >= thr
    }
    assert pall == exact


def test_two_level_assignment_partition_invariant(spark):
    vecs = {
        i: [((i * 13 + d * 7) % 23) / 9.0 for d in range(4)] for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = S.deterministic_centroids(df, n_cells=16)
    a = {r["vec_id"]: r["cell"]
         for r in S.assign_cells_two_level(df.repartition(7), cents).collect()}
    b = {r["vec_id"]: r["cell"]
         for r in S.assign_cells_two_level(df.coalesce(1), cents).collect()}
    assert a == b and len(a) == 60


def test_ppm_payload_and_decode_golden(spark):
    df = spark.createDataFrame(
        # ASCII, multi-byte UTF-8, and empty text (all-zero raster)
        [(1, "hello"), (2, "héllo!"), (3, "")],
        "doc_id long, text string",
    )
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in M.with_ppm_payload(df).collect()
    }
    rows = {r["doc_id"]: r for r in M.ppm_decode(M.with_ppm_payload(df)).collect()}
    for doc_id, text in [(1, "hello"), (2, "héllo!"), (3, "")]:
        payload, w, h, means, mx = _ppm_expect(text)
        assert payloads[doc_id] == payload  # byte-exact container
        r = rows[doc_id]
        assert (r["width"], r["height"], r["maxval"]) == (w, h, 255)
        assert r["n_px_bytes"] == w * h * 3
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == tuple(means)
        assert r["max_px"] == mx


def test_ppm_decode_rejects_out_of_contract_headers(spark):
    # each spec-shaped-but-out-of-contract header must raise a
    # doc-addressed error, never misparse into plausible stats:
    # maxval 65535 = 2-byte samples (wrong stride), zero dims = opaque
    # numpy zero-size crash, non-whitespace separator = shifted raster
    cases = {
        "maxval": b"P6\n4 4\n65535\n" + bytes(96),
        "empty raster": b"P6\n0 4\n255\n",
        "whitespace after maxval": b"P6\n4 4\n255X" + bytes(48),
    }
    for msg, payload in cases.items():
        df = spark.createDataFrame(
            [(9, bytearray(payload))], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match=msg):
            M.ppm_decode(df).collect()


def test_ppm_decode_handles_comment_headers(spark):
    # netpbm allows '#' comment lines inside the header; the parser
    # must skip them (payloads from real tools often carry one)
    raster = bytes(range(48))
    payload = b"P6\n# made by a real tool\n4 4\n255\n" + raster
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    row = M.ppm_decode(df).collect()[0]
    assert (row["width"], row["height"], row["max_px"]) == (4, 4, 47)
    assert row["mean_r"] == sum(range(0, 48, 3)) / 16.0


def test_pcm_resample_roundtrip_decodes(spark):
    """The resampled payload is itself a valid PCM payload: it decodes
    at half rate with ceil(n/2) samples, and the kept samples are
    exactly the even-indexed originals."""
    from flink_start_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "abcde"), (2, "xy")], "doc_id long, text string"
    )
    payloads = M.with_pcm_payload(df)
    res = M.pcm_resample(payloads, factor=2)
    decoded = {
        r["doc_id"]: r for r in M.pcm_decode(res.select("doc_id", "payload")).collect()
    }
    # 'abcde' -> 5 samples -> keep indices 0,2,4 -> 'a','c','e'
    assert decoded[1]["n_samples"] == 3
    assert decoded[1]["sample_rate"] == 4000
    assert decoded[1]["peak_amp"] == ord("e") * 257
    # 'xy' -> keep 'x' only
    assert decoded[2]["n_samples"] == 1
    assert decoded[2]["mean_amp"] == float(ord("x") * 257)


def test_lsh_recall_audit_zero_pair_corpus_counts_are_zero(spark, tmp_path):
    """Round-5 review catch: sum-over-nothing is NULL on both engines,
    so a clean (no near-dup) corpus silenced monitoring rules like
    n_lsh_pairs != n_both. Counts must coalesce to 0; only lsh_recall
    is legitimately NULL with no exact pairs."""
    from flink_start_spark import cache as C2
    from flink_start_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta eps"),
            (1, "one two three four five"),
            (2, "red green blue cyan magenta"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = QUERIES["lsh_recall_audit"].spark(spark, str(tmp_path)).collect()[0]
    C2.release()
    assert tuple(got) == (0, 0, 0, None)


def test_per_cell_knob_threads_to_quantizer(spark):
    """per_cell (the pairs-per-row budget, round-6 sf1 measurement)
    must flow from every cell-scoped entry point to auto_n_cells:
    n/per_cell cells when it dominates the 16-cell floor."""
    df = spark.range(4_000).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.sin((F.col("id") + 1) * float(j + 1)) for j in range(8)]
        ).cast("array<float>").alias("embedding"),
    )
    from flink_start_spark import cache as C2

    assert S.auto_n_cells(df, per_cell=125) == 32
    _, cents = S.precompute_cells(df, per_cell=125)
    assert cents.count() == 32
    C2.release()
    # explicit n_cells still wins over per_cell
    _, cents16 = S.precompute_cells(df, n_cells=16, per_cell=125)
    assert cents16.count() == 16
    C2.release()


def test_cosine_zero_norm_is_null_not_crash(spark):
    """Under the session's ANSI mode an unguarded /0.0 raises — a
    single all-zeros embedding must yield NULL cosine, not kill the
    query."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 1.0])],
        "id long, v array<double>",
    )
    a = df.alias("a")
    b = df.alias("b")
    got = {
        (r["ia"], r["ib"]): r["cos"]
        for r in a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            V.cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .collect()
    }
    assert got[(1, 2)] is None and got[(1, 1)] is None
    assert got[(2, 3)] == pytest.approx(2 ** -0.5)


def test_sign_bits_pads_past_array_end(spark):
    """bands*bits exceeding the embedding dim must pad with 0-bits
    (the documented behavior), not raise INVALID_ARRAY_INDEX under
    ANSI mode."""
    df = spark.createDataFrame([([1.0, -1.0],)], "v array<double>")
    r = df.select(
        V.sign_bits(F.col("v"), 8, offset=0).alias("k0"),
        V.sign_bits(F.col("v"), 8, offset=8).alias("k1"),
    ).collect()[0]
    assert r["k0"] == 1  # bit0 from +1.0, bit1 from -1.0, rest padded 0
    assert r["k1"] == 0  # entirely past the array end
