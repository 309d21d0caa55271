"""Corpus-size-driven LSH scaling (functions/lsh_scale.py): ladder
semantics, Python/DuckDB twin parity at integer boundaries, and forced
level->0 Spark/oracle hash parity (the driver SFs all sit at level 0,
so the rule's non-trivial branches are proven here at small N with
overridden bases)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.functions import lsh_scale as LS
from flink_start_spark.operators import dedup as D
from flink_start_spark.operators import similarity as S

# ---------------------------------------------------------------------
# Ladder semantics
# ---------------------------------------------------------------------


def test_md5_level_staircase():
    B, S_ = LS.MD5_BASE, LS.MD5_STEP
    assert LS.md5_level(0) == 0
    assert LS.md5_level(B - 1) == 0
    assert LS.md5_level(B * S_ - 1) == 0
    assert LS.md5_level(B * S_) == 1
    assert LS.md5_level(B * S_ * S_ - 1) == 1
    assert LS.md5_level(B * S_ * S_) == 2
    assert LS.md5_level(B * S_ ** (LS.MAX_LEVEL + 3)) == LS.MAX_LEVEL  # clamp


def test_driver_sfs_sit_at_level_zero():
    # 500 (sf0.001/0.01), 5_000 (sf0.1), 50_000 (sf1) documents and
    # 2_000/20_000 embeddings' md5 families: historical params intact
    for n in (500, 5_000, 50_000):
        assert LS.minhash_params(n) == (16, 4)
        assert LS.char_minhash_params(n) == (16, 2)


def test_minhash_schedule_midpoint_preserving():
    # bands = 2^(rows/2) until the 32 cap: the AND/OR collision-curve
    # midpoint (1/b)^(1/r) stays at 1/sqrt(2)
    for lvl in range(4):
        r, b = LS.minhash_schedule(lvl)
        assert r == 4 + 2 * lvl
        assert b == min(2 ** (r // 2), 32)
    assert LS.minhash_schedule(5)[1] == 32  # cap


def test_sign_schedule_dim64():
    assert LS.sign_schedule(64) == [(2, 8), (3, 10), (4, 12), (5, 12)]
    # every level fits the coordinate budget
    assert all(b * w <= 64 for b, w in LS.sign_schedule(64))


def test_sign_params_fires_at_sf1_not_before():
    assert LS.sign_params(500) == (2, 8)
    assert LS.sign_params(2_000) == (2, 8)  # sf0.1 embeddings
    assert LS.sign_params(2_048) == (2, 8)  # boundary: occ == target
    assert LS.sign_params(2_049) == (3, 10)
    assert LS.sign_params(20_000) == (4, 12)  # sf1 embeddings
    assert LS.sign_params(10 ** 9) == (5, 12)  # terminal clamp at dim 64


# ---------------------------------------------------------------------
# DuckDB twin parity (exact-integer staircases, boundary +-1)
# ---------------------------------------------------------------------


def _eval_sql(expr: str) -> int:
    return duckdb.sql(f"SELECT {expr}").fetchone()[0]


def test_md5_level_sql_twin_at_boundaries():
    B, S_ = LS.MD5_BASE, LS.MD5_STEP
    grid = [0, 1, 499, B - 1, B, B + 1]
    for k in range(1, 5):
        t = B * S_ ** k
        grid += [t - 1, t, t + 1]
    for n in grid:
        assert _eval_sql(LS.md5_level_sql(str(n))) == LS.md5_level(n), n


def test_md5_param_cte_twin():
    for fam, params in (("word", LS.minhash_params), ("char", LS.char_minhash_params)):
        for n in (0, 500, 50_000, LS.MD5_BASE * LS.MD5_STEP,
                  LS.MD5_BASE * LS.MD5_STEP ** 2 + 7):
            cte = LS.md5_param_cte(str(n), family=fam)
            r, b = duckdb.sql(f"WITH {cte} SELECT r, nb FROM mh_pp").fetchone()
            nh, nb = params(n)
            assert (r, b) == (nh // nb, nb), (fam, n)


def test_sign_param_cte_twin():
    cte = LS.sign_param_cte("(SELECT n FROM probe)")
    for n in (1, 2_000, 2_048, 2_049, 8_192, 8_193, 20_000, 32_768, 32_769, 10 ** 9):
        got = duckdb.sql(
            f"WITH probe AS (SELECT {n} AS n), {cte} SELECT nb, bits FROM spp"
        ).fetchone()
        assert tuple(got) == LS.sign_params(n), n


def test_param_overrides_reach_sql():
    # the config-fuzz lane depends on base/step overrides being mirrored
    assert _eval_sql(LS.md5_level_sql("300", base=50, step=4)) == LS.md5_level(
        300, base=50, step=4
    ) == 1
    cte = LS.sign_param_cte("600", target_occ=2)
    assert tuple(duckdb.sql(f"WITH {cte} SELECT nb, bits FROM spp").fetchone()) == (
        LS.sign_params(600, target_occ=2)
    )


def test_sign_ladder_raises_design_point_recall():
    """The occupancy ladder must not trade away the near-dup design
    point: planted cos~0.95 pairs in an isotropic 20k corpus collide
    MORE often at the fired (4,12)/(5,12) widths than at (2,8) — the
    sharper AND is outweighed by the extra OR bands above the
    collision-curve midpoint. Pure numpy (coordinate sign bits), seeded
    — the same construction as the COVERAGE round-9 measurement."""
    import numpy as np

    rng = np.random.default_rng(42)
    n, dim = 20000, 64
    X = rng.standard_normal((n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Y = X[:1000] + 0.041 * rng.standard_normal((1000, dim))
    Y /= np.linalg.norm(Y, axis=1, keepdims=True)
    assert abs(float((X[:1000] * Y).sum(1).mean()) - 0.95) < 0.01
    A = np.vstack([X, Y])
    S_ = A >= 0

    def recall(bands, bits):
        hit = np.zeros(1000, dtype=bool)
        for b in range(bands):
            k = S_[:, b * bits : (b + 1) * bits] @ (1 << np.arange(bits))
            hit |= k[:1000] == k[n : n + 1000]
        return hit.mean()

    r = {cfg: recall(*cfg) for cfg in [(2, 8), (3, 10), (4, 12), (5, 12)]}
    assert r[(2, 8)] <= r[(3, 10)] <= r[(4, 12)] <= r[(5, 12)]
    assert r[(4, 12)] > 0.7  # the shipped sf1 level


# ---------------------------------------------------------------------
# Operator auto defaults == historical explicit params at level 0
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta doc {i} " + "tail words " * (i % 3))
        for i in range(1, 41)
    ] + [(100, "alpha beta gamma delta epsilon zeta doc 1 "),  # near-dup of 1
         (101, "alpha beta gamma delta epsilon zeta doc 1 ")]
    return spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")


def test_auto_defaults_match_explicit_level0(small_docs):
    auto = sorted(
        D.minhash_near_dups(small_docs, "text", "doc_id", threshold=0.5).collect()
    )
    explicit = sorted(
        D.minhash_near_dups(
            small_docs, "text", "doc_id", threshold=0.5, num_hashes=16, bands=4
        ).collect()
    )
    C.release()
    assert auto == explicit and auto


def test_half_specified_params_raise(small_docs):
    with pytest.raises(ValueError, match="both"):
        D.minhash_band_rows(small_docs, "text", "doc_id", num_hashes=16)
    with pytest.raises(ValueError, match="both"):
        S.lsh_near_dup_pairs(small_docs.selectExpr("doc_id AS vec_id",
                                                   "array(1.0, -1.0) AS embedding"),
                             bands=2)


# ---------------------------------------------------------------------
# Forced level > 0: full Spark pipeline vs full oracle, same overridden
# base — hash parity on the ladder's ACTIVE branches
# ---------------------------------------------------------------------


def test_forced_level1_minhash_spark_oracle_parity(spark, tmp_path):
    import numpy as np  # vocabulary synthesis only

    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(30)]
    rows = []
    for i in range(1, 241):
        words = [vocab[int(x)] for x in rng.integers(0, 30, size=12)]
        rows.append((i, " ".join(words)))
        if i % 17 == 0:  # planted near-dup: one-word edit
            rows.append((1000 + i, " ".join(words[:-1] + ["edited"])))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    n = len(pdf)
    base, step = 50, 4
    lvl = LS.md5_level(n, base=base, step=step)
    assert lvl >= 1  # the point of the test
    nh, nb = LS.minhash_params(n, base=base, step=step)

    sdf = spark.createDataFrame(pdf)
    got = (
        D.minhash_near_dups(sdf, "text", "doc_id", threshold=0.5,
                            num_hashes=nh, bands=nb)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    C.release()

    con = duckdb.connect()
    con.register("documents", pdf)
    from flink_start_spark.plans.pipeline import _SHINGLE_CTE

    sql = f"""
    WITH {_SHINGLE_CTE},
    {LS.minhash_band_ctes("SELECT count(*) FROM documents", base=base, step=step)},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           round(len(list_intersect(x.sh, y.sh))::DOUBLE /
                 (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))::DOUBLE, 6) AS jaccard
    FROM cand JOIN shd x ON x.doc_id = id_a JOIN shd y ON y.doc_id = id_b
    WHERE jaccard >= 0.5 ORDER BY id_a, id_b
    """
    want = con.execute(sql).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-6, atol=1e-6)


def test_forced_sign_ladder_spark_oracle_parity(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    n = 600
    X = rng.standard_normal((n, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X[50] = X[40] * 0.98 + X[41] * 0.02  # planted near-dup pair
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [x.astype("float64").tolist() for x in X]}
    )
    target_occ = 2  # forces (4, 12) at n=600: 600 > 2*256 and > 2*1024? no ->
    bands, bits = LS.sign_params(n, target_occ=target_occ)
    assert (bands, bits) != (2, 8)

    sdf = spark.createDataFrame(pdf)
    got = (
        S.lsh_near_dup_pairs(sdf, threshold=0.4, bands=bands, bits=bits)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    C.release()

    con = duckdb.connect()
    con.register("embeddings", pdf)
    from flink_start_spark.plans.extensions import _COS

    cos = _COS.replace("qv", "x.embedding").replace("cv", "y.embedding")
    sql = f"""
    WITH {LS.sign_param_cte("SELECT count(*) FROM embeddings", target_occ=target_occ)},
    ke AS (SELECT vec_id, embedding, unnest(range(spp.nb)) AS band FROM embeddings, spp),
    keyed AS (SELECT vec_id, band,
        list_sum([CASE WHEN embedding[band * spp.bits + i + 1] >= 0 THEN 1 << i ELSE 0 END
                  FOR i IN range(spp.bits)])::BIGINT AS key FROM ke, spp),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM keyed a JOIN keyed b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, round({cos}, 6) AS cosine
    FROM cand JOIN embeddings x ON x.vec_id = id_a JOIN embeddings y ON y.vec_id = id_b
    WHERE {cos} >= 0.4 ORDER BY id_a, id_b
    """
    want = con.execute(sql).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-6, atol=1e-6)
