"""Similarity search over embedding columns (SURVEY §2b).

Two tiers:

- **Brute-force top-k** — exact cosine against every candidate, ranked
  per query. Cost is |Q| x |N|; correct baseline and fine whenever the
  query set is small (the common "probe a corpus with a few hundred
  queries" shape). The candidate side streams through codegen'd
  ``zip_with``/``aggregate`` expressions — no Python, no materialized
  pair matrix; queries are broadcast.
- **Sign-LSH bucketed near-dup / ANN** — banded sign-bit LSH keys
  (random-hyperplane family, basis-vector variant: see
  functions/vector.py::sign_bits) so only same-bucket pairs are
  compared. Recall is tuned by (bands, bits): P(collision in one band)
  = (1 - theta/pi)^bits. At 100 TB this is the only viable shape — the
  bucket join's key cardinality scales with the corpus and no stage is
  quadratic. An IVF variant (k-means coarse quantizer + inverted lists)
  is the production upgrade; same join topology, learned buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.functions import lsh_scale as LS
from flink_start_spark.functions import vector as V


def _cell_cosine(av, bv, an, bn):
    """Rounded cosine from pre-materialized norms — the cell-scoped
    pair-scoring expression semdedup_flags and knn_label_purity share.
    NULL when either norm is zero: under the session's ANSI mode an
    unguarded /0 would kill the whole query on one all-zeros
    embedding, and the oracles' NULLIF denominator yields NULL there."""
    denom = an * bn
    return F.round(F.when(denom != 0.0, V.dot(av, bv) / denom), 6)


def _cell_max_smaller_pd(pdf):
    """Per-cell pandas scorer for :func:`semdedup_flags`: for every
    member, the max RAW cosine to any smaller-id member of the same
    cell (rows with no valid smaller-id pair are omitted). Runs inside
    ``groupBy("cell").applyInPandas`` — the guide-§8 shape: the cell
    equi-join's pair rows never materialize in the JVM; each vector
    crosses the Arrow boundary once per probed cell and the |cell|^2
    scoring happens in vectorized numpy.

    BIT-EXACT with the JVM expression it replaces
    (``V.dot(av, bv) / (an * bn)``, per-row norms pre-materialized):

    - the dot and the squared norm accumulate COLUMN BY COLUMN
      (``acc += col_i_products``), i.e. the same left-to-right
      element order as the ``F.aggregate`` fold, in the same float64
      IEEE adds/multiplies — numpy's pairwise-summation shortcut is
      never invoked because each ``+=`` is a single vectorized add;
    - float32 inputs are widened to float64 BEFORE any arithmetic,
      exactly like the fold's per-element ``cast("double")``;
    - the division is the same IEEE double divide; ``den == 0.0``
      pairs are excluded exactly like the ``F.when(den != 0.0, ...)``
      guard (NULL cosine never participates in the max);
    - rounding is NOT done here: callers round the per-vector MAX in
      the JVM (half-up rounding is monotone, so
      ``max(round(c)) == round(max(c))`` — the Spark-side
      ``F.round`` keeps rounding semantics engine-owned).

    Memory: the scorer materializes an ``m x chunk`` cosine block
    (chunk <= 2048 columns), so per-task memory is bounded by
    ``8 * m * 2048`` bytes. ``m`` is the probed-cell population —
    ~``per_cell * cell_probe`` by the auto-scaled cell rule, the same
    bound the JVM pair join's |cell|^2 row count already relied on.
    """
    import numpy as np
    import pandas as pd

    m = len(pdf)
    if m < 2:
        return pd.DataFrame(
            {"_sd_id": pdf["_sd_id"][:0], "_sd_mx": pd.Series([], dtype="float64")}
        )
    pdf = pdf.sort_values("_sd_id")
    ids = pdf["_sd_id"].to_numpy()
    mat = np.stack(pdf["_sd_v"].to_numpy()).astype(np.float64, copy=False)
    dim = mat.shape[1]
    nrm2 = np.zeros(m, dtype=np.float64)
    for i in range(dim):
        nrm2 += mat[:, i] * mat[:, i]
    nrm = np.sqrt(nrm2)
    out_ids, out_mx = [], []
    neg_inf = -np.inf
    for lo in range(1, m, 2048):
        hi = min(lo + 2048, m)
        block = np.zeros((m, hi - lo), dtype=np.float64)
        for i in range(dim):
            block += np.multiply.outer(mat[:, i], mat[lo:hi, i])
        den = np.multiply.outer(nrm, nrm[lo:hi])
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = block / den
        # valid pair = strictly-smaller row position (ids are unique
        # and sorted, so position order IS id order) and nonzero
        # denominator
        rows = np.arange(m)[:, None]
        cols = np.arange(lo, hi)[None, :]
        valid = (rows < cols) & (den != 0.0)
        cos[~valid] = neg_inf
        any_valid = valid.any(axis=0)
        if any_valid.any():
            mx = cos.max(axis=0)
            out_ids.append(ids[lo:hi][any_valid])
            out_mx.append(mx[any_valid])
    if not out_ids:
        return pd.DataFrame(
            {"_sd_id": pdf["_sd_id"][:0], "_sd_mx": pd.Series([], dtype="float64")}
        )
    return pd.DataFrame(
        {
            "_sd_id": np.concatenate(out_ids),
            "_sd_mx": np.concatenate(out_mx),
        }
    )


def _cell_pairs_pd(pdf):
    """Per-cell pandas scorer for :func:`knn_label_purity`: every
    directed pair (a, b), a != b, of the cell with its RAW cosine —
    the same blocked, bit-exact column-accumulation arithmetic as
    :func:`_cell_max_smaller_pd` (see there for the exactness
    argument), but emitting the pair relation instead of a per-vector
    max, because the k-NN contract ranks on the 6-dp-ROUNDED cosine
    with neighbor-id tie-break and rounding must therefore stay
    JVM-side (re-implementing Spark's decimal-string HALF_UP round in
    numpy is exactly the kind of last-ulp divergence the repo bans).

    Zero-denominator cosines are emitted as NaN, which the
    pandas->Arrow conversion turns into SQL NULL — the same NULL the
    former ``F.when(den != 0.0, ...)`` guard produced (those pairs DO
    participate in the rank: NULLS LAST under the descending order,
    so they fill trailing top-k slots in degenerate cells exactly as
    before; pinned by the adversarial zero-norm corpus).
    """
    import numpy as np
    import pandas as pd

    m = len(pdf)
    empty = {
        "_a_id": pdf["_kn_id"][:0],
        "_a_label": pdf["_kn_label"][:0],
        "_b_id": pdf["_kn_id"][:0],
        "_b_label": pdf["_kn_label"][:0],
        "_cos_raw": pd.Series([], dtype="float64"),
    }
    if m < 2:
        return pd.DataFrame(empty)
    ids = pdf["_kn_id"].to_numpy()
    labels = pdf["_kn_label"].to_numpy()
    mat = np.stack(pdf["_kn_v"].to_numpy()).astype(np.float64, copy=False)
    dim = mat.shape[1]
    nrm2 = np.zeros(m, dtype=np.float64)
    for i in range(dim):
        nrm2 += mat[:, i] * mat[:, i]
    nrm = np.sqrt(nrm2)
    frames = []
    for lo in range(0, m, 2048):
        hi = min(lo + 2048, m)
        block = np.zeros((m, hi - lo), dtype=np.float64)
        for i in range(dim):
            block += np.multiply.outer(mat[:, i], mat[lo:hi, i])
        den = np.multiply.outer(nrm, nrm[lo:hi])
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = block / den
        cos[den == 0.0] = np.nan  # -> SQL NULL at the Arrow boundary
        rows = np.arange(m)[:, None]
        cols = np.arange(lo, hi)[None, :]
        keep = (rows != cols).ravel()
        a_idx = np.broadcast_to(rows, cos.shape).ravel()[keep]
        b_idx = np.broadcast_to(cols, cos.shape).ravel()[keep]
        frames.append(
            pd.DataFrame(
                {
                    "_a_id": ids[a_idx],
                    "_a_label": labels[a_idx],
                    "_b_id": ids[b_idx],
                    "_b_label": labels[b_idx],
                    "_cos_raw": cos.ravel()[keep],
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _np_cos_matrix(c_mat, s_mat):
    """Corpus-block x sample cosine matrix with the repo's bit-exact
    column-order accumulation (see :func:`_cell_max_smaller_pd`).
    Returns ``(cos, den)`` float64 arrays of shape (n_corpus,
    n_sample); entries with ``den == 0`` hold undefined values — the
    caller must mask on ``den != 0.0`` (the ``F.when`` guard's
    semantics)."""
    import numpy as np

    dim = c_mat.shape[1]
    cn2 = np.zeros(c_mat.shape[0], dtype=np.float64)
    sn2 = np.zeros(s_mat.shape[0], dtype=np.float64)
    g = np.zeros((c_mat.shape[0], s_mat.shape[0]), dtype=np.float64)
    for i in range(dim):
        cn2 += c_mat[:, i] * c_mat[:, i]
        sn2 += s_mat[:, i] * s_mat[:, i]
        g += np.multiply.outer(c_mat[:, i], s_mat[:, i])
    # the JVM expression multiplies s_n * e_n; IEEE float multiply is
    # commutative bit-for-bit, so the (corpus, sample) orientation here
    # is the same double
    den = np.multiply.outer(np.sqrt(cn2), np.sqrt(sn2))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = g / den
    return cos, den


def _sample_pairs_pd_factory(raw_floor: float):
    """Factory for the sharded sample-x-corpus exact stage of
    embedding_lsh_recall_audit: each group holds one corpus shard plus
    the full replicated sample; emits (sample id, corpus id, RAW
    cosine) for non-self pairs with nonzero denominator and raw cosine
    >= ``raw_floor`` — a CONSERVATIVE margin below the audit threshold
    (the caller re-applies the exact JVM ``round(...) >= thr`` filter,
    so the margin only over-emits, never drops a true survivor)."""

    def fn(pdf):
        import numpy as np
        import pandas as pd

        s = pdf[pdf["_is_s"]]
        c = pdf[~pdf["_is_s"]]
        empty = {
            "_s_id": pdf["_id"][:0],
            "_c_id": pdf["_id"][:0],
            "_raw": pd.Series([], dtype="float64"),
        }
        if len(s) == 0 or len(c) == 0:
            return pd.DataFrame(empty)
        s_ids = s["_id"].to_numpy()
        c_ids = c["_id"].to_numpy()
        s_mat = np.stack(s["_v"].to_numpy()).astype(np.float64, copy=False)
        c_mat = np.stack(c["_v"].to_numpy()).astype(np.float64, copy=False)
        cos, den = _np_cos_matrix(c_mat, s_mat)
        keep = (
            (den != 0.0)
            & (c_ids[:, None] != s_ids[None, :])
            & (cos >= raw_floor)
        )
        ci, si = np.nonzero(keep)
        if len(ci) == 0:
            return pd.DataFrame(empty)
        return pd.DataFrame(
            {"_s_id": s_ids[si], "_c_id": c_ids[ci], "_raw": cos[ci, si]}
        )

    return fn


def _sample_max_smaller_pd(pdf):
    """Sharded sample-x-corpus exact stage of semdedup_recall_audit:
    per sample vector, the shard-local max RAW cosine over corpus
    rows with a STRICTLY SMALLER id (the audit's smaller-id
    restriction) and nonzero denominator. The caller maxes the
    shard partials and rounds in the JVM (max commutes with half-up
    rounding)."""
    import numpy as np
    import pandas as pd

    s = pdf[pdf["_is_s"]]
    c = pdf[~pdf["_is_s"]]
    empty = {
        "_s_id": pdf["_id"][:0],
        "_pmax": pd.Series([], dtype="float64"),
    }
    if len(s) == 0 or len(c) == 0:
        return pd.DataFrame(empty)
    s_ids = s["_id"].to_numpy()
    c_ids = c["_id"].to_numpy()
    s_mat = np.stack(s["_v"].to_numpy()).astype(np.float64, copy=False)
    c_mat = np.stack(c["_v"].to_numpy()).astype(np.float64, copy=False)
    cos, den = _np_cos_matrix(c_mat, s_mat)
    valid = (den != 0.0) & (c_ids[:, None] < s_ids[None, :])
    cos = np.where(valid, cos, -np.inf)
    any_valid = valid.any(axis=0)
    if not any_valid.any():
        return pd.DataFrame(empty)
    mx = cos.max(axis=0)
    return pd.DataFrame({"_s_id": s_ids[any_valid], "_pmax": mx[any_valid]})


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k epilogue for the ``*_topk`` family: rank scored
    (query_id, neighbor_id, cosine) rows by (cosine desc, neighbor_id)
    — the ONE place the deterministic tie-break contract lives — and
    keep ``rank <= k``."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: query_id, neighbor_id, cosine (rounded 6), rank — ranked by
    (cosine desc, neighbor_id) so ties are deterministic. Self-matches
    excluded. ``queries`` is broadcast (small side by contract).
    """
    # norms are per-ROW (computed before the pair join); only the dot
    # fold runs per pair — see vector.cosine_with_norms (guide §4.2)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        V.norm(F.col(vec_col)).alias("_qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        V.norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_with_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bands: int = 2,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    key_fn=None,
) -> DataFrame:
    """ANN top-k, the scale path: score only candidates sharing a
    sign-LSH band with the query instead of the whole corpus.

    Same output shape as :func:`brute_force_topk` but recall < 1 by
    construction — queries whose true neighbors share no band are
    missed; tune (bands, bits) for the recall/cost point. At 100 TB this
    is the only sub-linear option without a learned index; the IVF
    upgrade replaces sign buckets with k-means cells, same join
    topology. Queries with zero same-band candidates emit nothing.
    """
    # One persisted projection per side = ONE scan of the input relation
    # per query (the repo-wide re-evaluation rule: DataFrame references
    # share no subtree without persist). Bands are then flattened to
    # rows with stack() — a single (band, key) equi-join instead of a
    # per-band union of joins, and stack (unlike explode) doesn't trip
    # InferFiltersFromGenerate into cloning the upstream expressions.
    # At 100 TB the persisted projection becomes a pre-materialized
    # signature table written at ingest.
    if key_fn is None:
        key_fn = lambda col, b: V.sign_bits(col, bits, offset=b * bits)  # noqa: E731

    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        # per-row norm rides the persisted projection so the pair stage
        # only folds the dot product (vector.cosine_with_norms)
        return C.track(
            df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}_vec"),
                V.norm(F.col(vec_col)).alias(f"{prefix}_n"),
                *[
                    key_fn(F.col(vec_col), b).alias(f"{prefix}_band{b}")
                    for b in range(bands)
                ],
            )
        )

    def stacked(df: DataFrame, prefix: str) -> DataFrame:
        pairs = ", ".join(f"{b}, {prefix}_band{b}" for b in range(bands))
        return df.selectExpr(
            f"{prefix}_id", f"stack({bands}, {pairs}) AS (band, key)"
        )

    q = keyed(queries, "q")
    c = keyed(candidates, "c")
    matched = (
        stacked(c, "c")
        .join(F.broadcast(stacked(q, "q")), ["band", "key"])
        .select("q_id", "c_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .distinct()
    )
    scored = (
        matched.join(
            q.select("q_id", "q_vec", "q_n"), "q_id"
        )
        .join(c.select("c_id", "c_vec", "c_n"), "c_id")
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(
                V.cosine_with_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_n"), F.col("c_n")
                ),
                6,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


#: target expected cell population for the auto-scaled quantizer:
#: n_cells ~ n / CELL_TARGET_ROWS keeps E[|cell|] ~constant as the
#: corpus grows, so the cell-scoped self-joins' sum(|cell|^2) work
#: stays LINEAR in n instead of quadratic-at-fixed-cell-count.
CELL_TARGET_ROWS = 1000


def auto_n_cells(candidates: DataFrame, per_cell: int = CELL_TARGET_ROWS) -> int:
    """The n_cells scaling rule, enforced rather than prose (round-4
    verdict item): ``max(16, n // per_cell)`` from one ``count()``.

    Cost contract (round-6 ADVICE): the count runs the candidates
    lineage EAGERLY at plan-build time. For a parquet-backed relation
    that is one column-pruned (empty-schema) scan — cheap. For DERIVED
    candidates with expensive upstream lineage, either pre-cache
    (``cache.track(candidates)``) so the count and the downstream cell
    passes share one materialization, or pass ``n_cells`` explicitly —
    this function deliberately does NOT persist on the caller's behalf,
    because caching a raw 100 TB scan just to count it would cost more
    than the pruned re-read it replaces.

    Every cell-scoped entry point applies this when ``n_cells`` is not
    given. The catalog instances use this rule with ``per_cell=128``
    (plans/extensions.py::CATALOG_PER_CELL) and the oracles mirror it
    with the same ``greatest(16, count(*) // per_cell)`` scalar
    subquery, so hashes track the rule at every corpus size."""
    return max(16, C.memo_count(candidates) // per_cell)


def deterministic_centroids(
    candidates: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_cell: int = CELL_TARGET_ROWS,
) -> DataFrame:
    """IVF coarse quantizer, deterministic-sample variant: the
    ``n_cells`` vectors whose ids hash lowest under md5 become the cell
    centers (cell id = rank in that hash order).

    md5 over the id is a seeded uniform sample that BOTH engines can
    recompute exactly — unlike k-means (iterative float means are
    summation-order-dependent, so a trained model can never be
    bit-mirrored in SQL). Plan shape is ``TakeOrderedAndProject``
    (distributed top-k, no global sort) — picking 16 rows from 100 TB
    costs one scan, and in production this runs ONCE at ingest via
    :func:`precompute_cells`, never per query.

    Output: ``cell int, center array<float>``.
    """
    if n_cells is None:
        n_cells = auto_n_cells(candidates, per_cell)
    ranked = (
        candidates.select(
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("center"),
        )
        .orderBy("_h", "_cid")
        .limit(n_cells)
    )
    w = Window.orderBy("_h", "_cid")  # 16 rows post-limit; single task is fine
    return ranked.select(
        (F.row_number().over(w) - 1).cast("int").alias("cell"), "center"
    )


def assign_cells(
    candidates: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin,
    ties broken by cell id).

    Broadcast nested-loop against the tiny centroid table expands each
    row ``n_cells``-fold *within its partition*, then
    ``groupBy(id).agg(min_by)`` collapses it — partial aggregation
    eats the expansion map-side, so the shuffle carries ~one row per
    input vector. This is the ingest-time step of IVF; at 100 TB the
    output is written alongside the vectors (see
    :func:`precompute_cells`).
    """
    expanded = candidates.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(centroids)
    )
    d2 = V.sq_dist(F.col(vec_col), F.col("center"))
    return (
        expanded.select(
            F.col(id_col), F.col(vec_col), F.col("cell"), d2.alias("_d2")
        )
        .groupBy(id_col)
        .agg(
            F.min_by("cell", F.struct("_d2", "cell")).alias("cell"),
            F.first(vec_col).alias(vec_col),
        )
        .select(id_col, vec_col, "cell")
    )


def precompute_cells(
    candidates: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_cell: int = CELL_TARGET_ROWS,
    assign_fn=None,
) -> tuple[DataFrame, DataFrame]:
    """Ingest-time IVF build: returns ``(assigned, centroids)``.

    This is the entry point a production pipeline calls once when
    vectors land, persisting both outputs (assignments partitioned/
    bucketed by ``cell``, centroids as a tiny broadcast table); query
    time then pays only :func:`ivf_topk_precomputed` — probe + one
    cell-id equi-join — never a training pass.

    ``assign_fn(candidates, centroids, id_col, vec_col)`` swaps the
    assignment strategy: the default is the exact flat argmin
    (:func:`assign_cells_maponly`, what every oracle-checked catalog
    instance uses); pass :func:`assign_cells_two_level` past the
    ~10^8-vector crossover where the flat scan's O(n * n_cells) work
    is the bill. Every downstream operator (SemDeDup, k-NN audit, IVF
    search) is agnostic to how the ``cell`` column was produced.
    """
    centroids = deterministic_centroids(candidates, n_cells, id_col, vec_col, per_cell)
    C.track(centroids)
    assign = assign_fn if assign_fn is not None else assign_cells_maponly
    assigned = assign(candidates, centroids, id_col, vec_col)
    return assigned, centroids


def ivf_topk_precomputed(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query-time IVF ANN top-k over precomputed cell assignments: each
    query probes its ``n_probe`` nearest cells and scores only vectors
    assigned there — ~``n_probe/n_cells`` of the corpus, via a cell-id
    equi-join (same sub-linear topology as :func:`lsh_topk`, but the
    buckets follow the data distribution)."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        V.norm(F.col(vec_col)).alias("_qn"),
    )
    probe = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", V.sq_dist(F.col("q_vec"), F.col("center")))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.col("_d2"), F.col("cell"))
            ),
        )
        .filter(F.col("_rk") <= n_probe)
        .select("q_id", "q_vec", "_qn", "cell")
    )
    # candidate-side norm per ROW before the cell join; only the dot
    # fold runs per (query, candidate) pair — vector.cosine_with_norms
    scored = (
        assigned.withColumn("_cn", V.norm(F.col(vec_col)))
        .join(F.broadcast(probe), "cell")
        .filter(F.col("q_id") != F.col(id_col))
        .select(
            F.col("q_id").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                V.cosine_with_norms(
                    F.col("q_vec"), F.col(vec_col), F.col("_qn"), F.col("_cn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def rp_lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bands: int = 2,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k with TRUE random-hyperplane LSH keys (fixed
    pseudo-random projections, functions/vector.py::rp_sign_bits) —
    the production family for arbitrary embedding distributions, where
    the coordinate-basis variant assumes near-isotropy. Same
    single-scan banded join plan as :func:`lsh_topk`."""
    return lsh_topk(
        candidates,
        queries,
        k,
        bands,
        bits,
        id_col,
        vec_col,
        key_fn=lambda col, b: V.rp_sign_bits(col, bits, dim, offset=b * bits),
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int | None = None,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_cell: int = CELL_TARGET_ROWS,
    assign_fn=None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k, self-contained form: build the
    coarse quantizer (:func:`deterministic_centroids`), assign cells,
    probe + score. Production use splits this at the dashed line —
    :func:`precompute_cells` at ingest, :func:`ivf_topk_precomputed`
    per query.

    Every step is deterministic and pure-SQL-expressible (sampled
    centroids + argmin assignment), so the DuckDB oracle mirrors it
    exactly — unlike the earlier k-means variant, which could only be
    rows-only-checked.
    """
    assigned, centroids = precompute_cells(
        candidates, n_cells, id_col, vec_col, per_cell, assign_fn
    )
    return ivf_topk_precomputed(
        assigned, centroids, queries, k, n_probe, id_col, vec_col
    )


def _rp_keyed(
    df: DataFrame,
    bands: int,
    bits: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, band0..band{bands-1}) with quantized random-projection
    sign keys — the sign-LSH ladder's past-the-dim-clamp key path
    (round-9 verdict item 1, coded handoff).

    Components are quantized onto the repo's exact-integer grid BY THE
    SAME JVM EXPRESSION as the column fold (vector.py::
    quantize_embedding — clamp ±2048, floor * 2^20 → int64), so every
    edge semantic (NaN and ±inf clamp to +2048/-2048, a NULL element
    stays NULL) is identical-by-construction to rp_sign_bits_q and to
    the DuckDB oracle; a float-side re-quantization would diverge on
    NaN (numpy can't tell an Arrow NULL element from a true NaN — both
    arrive as NaN — while the engines clamp NaN and zero NULLs). The
    Arrow ``mapInPandas`` pass then computes ALL bands*bits plane dots
    as one int64 matmul against the md5-derived weight matrix
    (vector.py::rp_weights_q). Integer arithmetic is summation-order-
    free, so the keys are bit-identical to the column-expression fold
    and to the oracle's dynamic md5 weights — while an rp ladder level
    (up to 2664 planes at the (74, 36) terminal) costs one vectorized matmul per
    batch instead of hundreds of codegen'd aggregate expressions.
    NULL elements contribute 0 (oracle: coalesce(x*w, 0)); a NULL
    embedding keys as the zero vector (all sign bits 1)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    n_planes = bands * bits
    qcol = "__rp_q"
    schema = StructType(
        [df.schema[id_col], df.schema[vec_col]]
        + [StructField(f"band{b}", LongType(), False) for b in range(bands)]
    )

    def mapper(batches):
        import numpy as np

        W = V.rp_weight_matrix_q(n_planes, dim)  # (planes, dim) int64
        pw = 1 << np.arange(bits, dtype=np.int64)
        for pdf in batches:
            # pre-quantized longs; NULL elements surface as NaN after
            # Arrow's float64 promotion and mean "0 contribution" (the
            # rp_sign_bits_q / oracle coalesce convention). Quantized
            # magnitudes are <= 2048 * 2^20 = 2^31, exact in float64.
            Xq = np.zeros((len(pdf), dim), dtype=np.int64)
            for r, v in enumerate(pdf[qcol].to_numpy()):
                if v is None:
                    continue  # NULL embedding -> zero vector
                a = np.asarray(v, dtype=np.float64)[:dim]
                Xq[r, : len(a)] = np.nan_to_num(a, nan=0.0).astype(np.int64)
            sgn = (Xq @ W.T) >= 0  # exact int64 dots
            out = pdf[[id_col, vec_col]].copy()
            for b in range(bands):
                out[f"band{b}"] = pd.Series(
                    sgn[:, b * bits : (b + 1) * bits] @ pw, index=pdf.index
                )
            yield out

    return df.select(
        id_col, vec_col, V.quantize_embedding(F.col(vec_col)).alias(qcol)
    ).mapInPandas(mapper, schema)


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    bands: int | None = None,
    bits: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    key: str = "auto",
) -> DataFrame:
    """Embedding near-duplicate pairs via banded sign-LSH + cosine confirm.

    Candidates = pairs agreeing on all ``bits`` sign bits of >=1 band
    (band b uses coordinates [b*bits, (b+1)*bits)); confirmed by exact
    cosine >= threshold. Output: id_a, id_b, cosine (rounded 6).

    Sign-bit band keys SATURATE: the key space is 2^bits per band, so
    at fixed width candidates grow ~ bands * n^2 / 2^bits (measured at
    the 20k-vector sf1 corpus: 1.57M candidates at 2x8 for an 11.5k-
    pair output). The ``bands``/``bits`` defaults therefore engage the
    occupancy ladder (functions/lsh_scale.py::sign_params — one
    memoized count(*)): +2 bits / +1 band per 4x of corpus beyond
    ~8 vectors/bucket, clamped at bands*bits <= dim; at sf1 that is
    (4 bands, 12 bits) = 197k candidates (8x fewer) with AND/OR recall
    at the cosine-0.95 near-dup design point RISING (0.73 vs 0.67).
    Past the dim clamp (> ~32k vectors at the default occupancy target)
    the ladder KEEPS GOING on random-projection sign bits
    (lsh_scale.py::sign_schedule_full rp levels; keys via
    :func:`_rp_keyed`'s quantized int64 matmul against md5-derived
    hyperplanes) — band counts there hold the cos-0.95 design-point
    recall at ~0.8 while candidates stay ~ bands * occ/2 * N, linear in
    N at every level.

    ``key`` selects the key family: "auto" (default) follows the
    ladder level's own family; "coord" / "rp" force one — explicit
    (bands, bits) default to the historical coordinate keys unless
    key="rp".

    Recall/cost dial: more bands -> higher recall, more candidates.
    With near-orthogonal random embeddings recall at moderate thresholds
    is low by construction — production embeddings cluster, which is
    precisely when LSH recall becomes useful. The oracle applies the
    identical bucketing, so correctness is exact regardless.
    """
    if (bands is None) != (bits is None):
        raise ValueError("pass both bands and bits, or neither (corpus-scaled auto)")
    if key not in ("auto", "coord", "rp"):
        raise ValueError(f"key must be auto|coord|rp, got {key!r}")
    rp = key == "rp"
    if bands is None:
        bands, bits, auto_rp = LS.sign_params(C.memo_count(df), dim)
        if key == "auto":
            rp = auto_rp
    # Persisted base projection (id, vec, band keys) = ONE scan of the
    # input relation; bands flattened to rows with stack() so candidate
    # generation is a single (band, key) hash self-join — an OR-of-bands
    # predicate would degrade to a nested-loop cross join, the quadratic
    # shape this operator exists to avoid, and a per-band union of joins
    # would re-evaluate the projection per band without the persist.
    if rp:
        keyed = _rp_keyed(df, bands, bits, dim, id_col, vec_col)
    else:
        keyed = df.select(
            F.col(id_col),
            F.col(vec_col),
            *[
                V.sign_bits(F.col(vec_col), bits, offset=b * bits).alias(f"band{b}")
                for b in range(bands)
            ],
        )
    keyed = C.track(keyed)
    pairs = ", ".join(f"{b}, band{b}" for b in range(bands))
    stacked = keyed.selectExpr(id_col, f"stack({bands}, {pairs}) AS (band, key)")
    a, bb = stacked.alias("a"), stacked.alias("b")
    candidates = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # per-row norms ride the vec projections; only the dot fold runs
    # per candidate pair (vector.cosine_with_norms, guide §4.2)
    vecs = keyed.select(
        F.col(id_col), F.col(vec_col), V.norm(F.col(vec_col)).alias("_n")
    )
    return (
        candidates.join(
            vecs.withColumnRenamed(id_col, "id_a")
            .withColumnRenamed(vec_col, "vec_a")
            .withColumnRenamed("_n", "_na"),
            "id_a",
        )
        .join(
            vecs.withColumnRenamed(id_col, "id_b")
            .withColumnRenamed(vec_col, "vec_b")
            .withColumnRenamed("_n", "_nb"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                V.cosine_with_norms(
                    F.col("vec_a"), F.col("vec_b"), F.col("_na"), F.col("_nb")
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization of embedding vectors with an error
    audit — the 4x storage/bandwidth lever for a 100 TB embedding
    store (float32 -> int8 is what FAISS/ScaNN ship to disk; cosine
    ranking degrades by ~the emitted error bounds).

    Per-vector max-abs scale; code_i = floor(x_i / scale * 127) (floor,
    not round — Python/Java round-half-even vs SQL round-half-away is a
    cross-engine trap; floor is portable); dequant_i = code_i * scale /
    127. Emits the integer code checksums (sum, L1) pinning every code
    exactly, plus max|x - dequant| and cosine(original, dequantized).
    Pure per-row array projections — zero shuffle at any scale.
    """
    zero = F.lit(0).cast("double")
    staged = (
        df.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("_x"),
        )
        .withColumn("_scale", F.array_max(F.transform("_x", F.abs)))
        .withColumn(
            "_q",
            F.when(
                F.col("_scale") == 0,
                F.transform(F.col("_x"), lambda v: F.lit(0).cast("long")),
            ).otherwise(
                F.transform(
                    F.col("_x"), lambda v: F.floor(v / F.col("_scale") * 127)
                )
            ),
        )
        .withColumn(
            "_d",
            F.transform(F.col("_q"), lambda q: q * F.col("_scale") / 127),
        )
    )
    err = F.array_max(
        F.zip_with(F.col("_x"), F.col("_d"), lambda x, d: F.abs(x - d))
    )
    return staged.select(
        F.col(id_col),
        F.round(F.col("_scale"), 6).alias("scale"),
        F.aggregate(F.col("_q"), F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "q_sum"
        ),
        F.aggregate(
            F.col("_q"), F.lit(0).cast("long"), lambda a, v: a + F.abs(v)
        ).alias("q_l1"),
        F.round(err, 6).alias("max_abs_err"),
        F.when(F.col("_scale") == 0, F.lit(1.0))
        .otherwise(F.round(V.cosine(F.col("_x"), F.col("_d")), 6))
        .alias("cos_orig_deq"),
    )


def _resolve_probe_assign_fn(assign_fn, cell_probe: int):
    """Shared probe-depth resolution for the cell-scoped operator entry
    points (semdedup_flags, knn_label_purity): cell_probe must be a
    positive int; cell_probe > 1 builds the flat multi-probe
    assignment, and combining it with an explicit assign_fn raises
    (bake the depth into the fn — silent ignore was the alternative;
    same reasoning rejects cell_probe < 1 rather than silently running
    the single-probe path)."""
    if cell_probe < 1:
        raise ValueError(f"cell_probe must be >= 1, got {cell_probe}")
    if cell_probe == 1:
        return assign_fn
    if assign_fn is not None:
        raise ValueError(
            "cell_probe > 1 with an explicit assign_fn is ambiguous — "
            "bake the probe depth into the assign_fn instead (e.g. "
            "assign_cells_two_level(..., cell_probe=p) or "
            "plans.extensions._two_level_assign_fn(sp, p))"
        )
    return lambda c, cen, i, v: assign_cells_maponly(
        c, cen, i, v, cell_probe=cell_probe
    )


def semdedup_flags(
    emb: DataFrame,
    n_cells: int | None = None,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_cell: int = CELL_TARGET_ROWS,
    assign_fn=None,
    cell_probe: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas '23): semantic dedup by clustering embeddings,
    then pruning, within each cluster, vectors whose cosine to another
    cluster member exceeds ``threshold``. The deterministic survivor
    rule is keep-smallest-id: a vector is pruned iff some SMALLER-id
    vector in its cell is above the threshold — one survivor per
    semantic duplicate group, same rule as the exact-dedup tier.

    Reuses the ingest-time IVF build (:func:`precompute_cells`) as the
    clustering step, so query time is one cell-keyed exchange feeding a
    per-cell vectorized scorer (``applyInPandas`` + numpy — see
    :func:`_cell_max_smaller_pd`) — the paper's design point: pairwise
    cost is |cell|^2, held constant by scaling the cluster count with
    the corpus, and no per-pair row ever materializes in the JVM. The default ``n_cells=None`` ENFORCES that rule via
    :func:`auto_n_cells` (max(16, n/per_cell)); the catalog instance
    passes ``per_cell=128`` and its oracle mirrors the same
    count(*)-driven rule, so the shipped configuration scales instead
    of pinning the 16-cell layout that produced the round-6 8.1
    sf-pair knee. ``per_cell`` is the pairs-per-row budget
    (recall/cost knob — the round-6 sf1 measurement: holding cell
    density across a 10x corpus keeps wall-clock linear, see
    COVERAGE.md). At the scaled cell count the join key has millions
    of distinct values at 100 TB — no hot-key skew.

    Output: every input vector with its cell, the max cosine to any
    smaller-id cell-mate (null when alone in its cell), and the pruned
    flag. Emitting flags (not the filtered corpus) keeps the row count
    stable and lets downstream stages choose drop vs. downweight.

    ``cell_probe > 1`` multi-assigns each vector to its ``p`` nearest
    cells before the self-join — the RECALL dial for boundary pairs
    the single-cell restriction splits (the dominant recall cost,
    measured in scripts/semdedup_recall_audit.py): a pair is scored if
    it shares ANY probed cell, candidate work grows ~p^2-fold, and
    ``p >= n_cells`` degrades gracefully to EXACT all-pairs semantics.
    The emitted ``cell`` column stays the p=1 argmin cell (``_crk=1``),
    so the output schema and row count are probe-invariant. Works with
    either assignment strategy: flat (default) or via an ``assign_fn``
    whose output carries ``_crk`` (see ``_two_level_assign_fn``).
    """
    assign_fn = _resolve_probe_assign_fn(assign_fn, cell_probe)
    assigned, _ = precompute_cells(emb, n_cells, id_col, vec_col, per_cell, assign_fn)
    # The per-cell scorer and the final projection read it.
    assigned = C.track(assigned)
    # Pair scoring is a per-cell Arrow/numpy pass (round-10
    # optimization, guide §8 / §4.2): the former cell-keyed self-join
    # materialized one wide JVM row per candidate pair (|cell|^2 rows
    # through the join, scored by an interpreted 64-element fold —
    # measured ~3.0 s for the 557k sf0.1 pairs through the noop sink),
    # where every pairing decision needs only the cell's own vectors.
    # Now each vector crosses the exchange once per probed cell and the
    # pairwise max happens in vectorized numpy — bit-identically (see
    # _cell_max_smaller_pd for the exactness argument; the per-vector
    # MAX is rounded in the JVM, which commutes with max). A pair
    # sharing two probed cells scores the same raw cosine in both —
    # the groupBy max is the dedup, as before.
    scored = (
        assigned.select(
            F.col(id_col).alias("_sd_id"),
            F.col(vec_col).alias("_sd_v"),
            "cell",
        )
        .groupBy("cell")
        .applyInPandas(
            _cell_max_smaller_pd,
            f"_sd_id {emb.schema[id_col].dataType.simpleString()}, _sd_mx double",
        )
    )
    mx = scored.groupBy("_sd_id").agg(
        F.round(F.max("_sd_mx"), 6).alias("max_cosine_smaller")
    ).select(F.col("_sd_id").alias(id_col), "max_cosine_smaller")
    # Multi-probe assignments carry one row per (vector, probed cell);
    # the canonical output row is the argmin (_crk = 1) cell. A pair
    # sharing two probed cells scores twice into the SAME max — the
    # groupBy above is the dedup.
    canon = (
        assigned.filter(F.col("_crk") == 1)
        if "_crk" in assigned.columns
        else assigned
    )
    return (
        canon.select(id_col, F.col("cell").cast("bigint").alias("cell"))
        .join(mx, id_col, "left")
        .select(
            id_col,
            "cell",
            "max_cosine_smaller",
            F.coalesce(
                F.col("max_cosine_smaller") >= threshold, F.lit(False)
            ).alias("pruned"),
        )
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed k-means (Lloyd's algorithm), engine-exact variant.

    The classic blocker for oracle-checking k-means is that float mean
    recomputation is summation-order-dependent, so no two engines agree
    bit-for-bit. This variant makes every iteration exactly mirrorable:

    - init: the deterministic md5-ranked sample (same quantizer seed
      rule as IVF — :func:`deterministic_centroids`);
    - assign: argmin squared-L2 against the broadcast centroid table,
      ties broken by cell id (``min_by`` struct — map-side collapse);
    - recompute: per-(cell, dimension) means as INTEGER-quantized
      partial sums (``sum(floor(val * 2^20)) / (n * 2^20)``), the
      ``lang_centroid_outliers`` trick — integer addition commutes, so
      the recomputed centroids are bit-identical across engines and
      partitionings, which makes every subsequent assignment round
      deterministic too.

    Scale shape per round: one scan with a MAP-ONLY assignment
    projection (array_min over the packed broadcast centroid array —
    see :func:`assign_cells_maponly`; no row expansion, no shuffle),
    then one posexplode + (cell, pos) partial-sum groupBy (k*dim
    output rows) and one k-row assembly. Centroid tables
    are persisted between rounds so the lazy plan restarts from k rows
    instead of re-deriving the full history. Empty cells simply drop
    out (both engines recompute from the same assignment relation).

    Output: each vector's final cell plus the cell population —
    pinning the full clustering — as ``vec_id, cell, cell_size``.
    """
    quant = 1 << 20
    # Round-11 (guide §5.2): every iteration re-scans the corpus (the
    # init sample, i assignment passes, the final assignment) — persist
    # the slim (id, vector) projection ONCE so iterations read the
    # cache instead of re-decoding parquet each round (the standard
    # iterative-ML shape; the cache is released by the harness's
    # cache-ownership contract).
    e = emb.select(id_col, vec_col)
    if not emb.is_cached:
        e = C.track(e)
    cents = deterministic_centroids(e, k, id_col, vec_col)
    for _ in range(iters):
        assigned = assign_cells_maponly(e, cents, id_col, vec_col)
        by_pos = assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        # components CLAMPED to ±2048 before the 2^-20 quantize: Spark's
        # floor(double) yields LONG, so an out-of-domain component
        # (|v| > ~2^43) would overflow-crash under ANSI where DuckDB's
        # double floor sails on — the clamp (mirrored in the oracles)
        # pins the shared domain instead. Unit-scale embeddings are
        # untouched.
        clamped = F.least(F.greatest(F.col("val").cast("double"), F.lit(-2048.0)), F.lit(2048.0))
        means = by_pos.groupBy("cell", "pos").agg(
            (
                F.sum(F.floor(clamped * quant))
                / (F.count("*") * float(quant))
            ).alias("m")
        )
        cents = means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("center")
        )
        cents = C.track(cents)
    # final is consumed twice (sizes aggregate + the join's left side):
    # persist it so the last assignment pass runs once, not twice. The
    # sizes side stays a groupBy + broadcast join — NOT a window over
    # partitionBy(cell), which would funnel each cluster through one
    # task (k is small; the hot-key hazard the repo bans).
    final = C.track(
        assign_cells_maponly(e, cents, id_col, vec_col).select(
            F.col(id_col), F.col("cell").cast("bigint").alias("cell")
        )
    )
    sizes = final.groupBy("cell").agg(F.count("*").alias("cell_size"))
    return final.join(F.broadcast(sizes), "cell").select(
        id_col, "cell", "cell_size"
    )


def _probe_exploded(
    base: DataFrame, scored, id_col: str, vec_col: str, cell_probe: int
) -> DataFrame:
    """Shared multi-probe tail for the assignment projections: take the
    ``cell_probe`` lexicographically smallest ``(d2, cell)`` structs —
    ``slice(array_sort(scored), 1, p)`` is exactly ``rank <= p`` under
    the same total order ``array_min`` uses for p=1 — and explode to
    one row per (vector, probed cell) with the 1-based probe rank in
    ``_crk`` (``_crk = 1`` is the argmin cell every single-probe caller
    sees). Still a pure projection + map-side explode: the p-fold row
    expansion happens where the data already is, no shuffle.

    posexplode_outer, not posexplode (round-9 ADVICE): with an EMPTY
    centroid relation the p=1 path (array_min) keeps the row with a
    null cell while a plain posexplode would drop it — outer keeps the
    two probe depths edge-case-symmetric (unreachable today, since
    deterministic_centroids never yields zero rows on non-empty input,
    but symmetry is free)."""
    top = F.slice(F.array_sort(scored), 1, cell_probe)
    return base.select(
        F.col(id_col), F.col(vec_col), F.posexplode_outer(top).alias("_pos", "_sc")
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_sc")["cell"].alias("cell"),
        (F.col("_pos") + 1).cast("int").alias("_crk"),
    )


def assign_cells_maponly(
    candidates: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_probe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment as a PURE PROJECTION: pack the k
    centroids into one broadcast array row, then per input row compute
    ``array_min(transform(cents, c -> (sq_dist, cell)))`` — the
    lexicographic struct min IS argmin-with-cell-tie-break, evaluated
    map-side with no row expansion and no shuffle.

    Bit-identical to :func:`assign_cells` (same sq_dist doubles, same
    (d2, cell) ordering; array_min is order-independent so the
    nondeterministic collect_list order cannot matter) but removes the
    k-fold BNLJ expand + groupBy collapse — at 100 TB the assignment
    stage becomes scan-speed map work. `assign_cells` remains the
    relational formulation the IVF oracle mirrors CTE-for-CTE.

    ``cell_probe > 1`` is the PAIR-RECALL dial (multi-assignment, the
    standard multi-probe answer to boundary pairs the within-cell
    restriction splits): each vector lands in its ``p`` nearest cells
    and the output carries ``_crk`` (1-based probe rank; ``_crk = 1``
    is the p=1 argmin cell). Downstream cell-keyed self-joins then see
    every pair that shares ANY probed cell — candidate work grows
    ~p^2-fold per cell, the documented trade. ``p >= n_cells`` recovers
    EXACT all-pairs semantics (every vector in every cell) — the
    invariant tests/test_extensions.py pins.
    """
    packed = centroids.agg(
        F.array_sort(F.collect_list(F.struct("cell", "center"))).alias("_cents")
    )
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            V.sq_dist(F.col(vec_col), c["center"]).alias("d2"),
            c["cell"].alias("cell"),
        ),
    )
    base = candidates.select(id_col, vec_col).crossJoin(F.broadcast(packed))
    if cell_probe > 1:
        return _probe_exploded(base, scored, id_col, vec_col, cell_probe)
    return base.select(
        F.col(id_col),
        F.col(vec_col),
        F.array_min(scored)["cell"].alias("cell"),
    )


def assign_cells_two_level(
    candidates: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_super: int | None = None,
    super_probe: int = 1,
    cell_probe: int = 1,
) -> DataFrame:
    """Hierarchical (two-level) nearest-centroid assignment — the
    ≥10^8-vector form of :func:`assign_cells_maponly`.

    ``cell_probe > 1`` multi-assigns each vector to its ``p`` nearest
    MEMBER cells (same ``_crk``-carrying contract as
    :func:`assign_cells_maponly` — the pair-recall dial), ranked over
    the probed supers' member centroids; with ``super_probe = 1`` the
    probe set is capped by that super's member count, so raise
    ``super_probe`` alongside ``cell_probe`` when the tree is in play.

    Flat assignment is O(n * n_cells) distance work; with the
    auto-scaled cell count (n_cells ~ n/per_cell) that is O(n^2 /
    per_cell) total — map-only and zero-shuffle, but past ~10^8
    vectors the scan itself is the bill. The standard fix (FAISS's
    two-level coarse quantizers) searches a tree: pick the nearest of
    ``n_super ~ sqrt(n_cells)`` SUPER-centroids, then argmin only over
    the cells assigned to that super-cell — O(n * 2*sqrt(n_cells))
    work, same downstream cell-id equi-join topology.

    Deterministic construction, fully engine-mirrorable (the same
    discipline as :func:`deterministic_centroids`):

    - super-centroids = the first ``n_super`` cells by cell id (cells
      are already md5-rank ordered, so this IS a uniform sample);
    - each centroid is assigned to its nearest super-centroid by the
      identical (sq_dist, id) argmin rule;
    - per vector: argmin over super-centers, then argmin over that
      super-cell's member centroids. Both argmins are
      ``array_min(transform(...))`` over ONE packed broadcast row —
      pure codegen'd projection, no row expansion, no shuffle.

    APPROXIMATE by design: a vector near a super-cell boundary can
    land in a different cell than flat argmin. ``super_probe`` is the
    ASSIGNMENT-FIDELITY dial (the coarse-level nprobe): argmin over
    the members of the ``p`` NEAREST super-cells instead of one —
    O(n * (sqrt(k) + p*sqrt(k))) work, agreement with flat argmin
    rising toward 1 as p grows (p = n_super IS flat argmin, since
    every cell's members get scanned). It is NOT a pair-recall dial
    for the downstream cell-keyed self-joins: measured against exact
    all-pairs ground truth on the sf1 corpus at a deliberately loose
    threshold (0.8 — boundary-hugging pairs), SemDeDup flag recall
    reads flat 0.386, p=1 0.317, p=2 0.297, p=3 0.301 — raising p
    moves assignments toward flat but splits as many boundary pairs
    as it joins, and the dominant recall cost is the within-cell
    restriction itself (the SemDeDup paper's design point). At the
    0.99 operating threshold near-identical vectors share distances
    to every centroid and co-locate under any consistent argmin. Exact-recovery invariant at
    any p: any vector EQUAL to a centroid lands in a cell whose
    center is bit-equal to it — its OWN cell when centers are
    distinct; with duplicated centers the (d2, id) tie-break picks
    the smallest-id copy, exactly as flat assignment does. Since round 8
    this IS the shipped assignment for the pair-stage catalog instances
    (semdedup_flags, knn_label_purity — plans/extensions.py wires it via
    ``assign_fn`` with a DuckDB oracle mirroring the same nested argmin);
    the search-stage instance (ann_topk_ivf) keeps flat assignment, whose
    large-cell cost model sits below the crossover. Pinned by invariants
    in tests/test_extensions.py.
    """
    import math

    # The count() plus the two centroid-side joins below each run the
    # centroids lineage. Callers arriving via precompute_cells pass an
    # already-tracked (persisted) table; direct callers with derived
    # uncached lineage get the same discipline here so the lineage is
    # computed once (round-7 ADVICE). Same cache-ownership contract as
    # everywhere: C.release() after materializing the result.
    if not centroids.is_cached:
        centroids = C.track(centroids)
    n_cells = C.memo_count(centroids)
    if n_super is None:
        n_super = max(1, math.isqrt(n_cells))
    supers = centroids.filter(F.col("cell") < n_super).select(
        F.col("cell").alias("sid"), F.col("center").alias("s_center")
    )
    # centroid -> super assignment (k x sqrt(k) work on k rows)
    cent_assigned = (
        centroids.crossJoin(F.broadcast(supers))
        .select(
            "cell",
            "center",
            "sid",
            V.sq_dist(F.col("center"), F.col("s_center")).alias("_d2"),
        )
        .groupBy("cell")
        .agg(
            F.min_by("sid", F.struct("_d2", "sid")).alias("sid"),
            F.first("center").alias("center"),
        )
    )
    # one packed broadcast row: supers sorted by sid, each with its
    # member (cell, center) list
    packed = (
        cent_assigned.join(
            supers.select("sid", "s_center"), "sid"
        )
        .groupBy("sid")
        .agg(
            F.first("s_center").alias("s_center"),
            F.array_sort(F.collect_list(F.struct("cell", "center"))).alias(
                "members"
            ),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sid", "s_center", "members"))
            ).alias("_supers")
        )
    )
    # Argmin carries the winner's array POSITION (index lambda), and
    # the member list is fetched with ONE element_at on that position.
    # Two structural constraints drove this shape, both measured on the
    # 200k x 1562-cell demo fixture:
    #
    # - No expensive expression may appear inside another lambda: a
    #   first version looked the winner up with
    #   filter(_supers, s -> s.sid == array_min(...)["sid"]) and the
    #   captured array_min was re-evaluated PER FILTER ELEMENT —
    #   sqrt(k) * sqrt(k) * dim work per row, timing dead even with
    #   flat assignment (103s vs 112s). element_at's index argument is
    #   evaluated once.
    # - Position, not sid, because a DUPLICATE center can tie-break a
    #   super-centroid into a smaller sid's group, leaving its own sid
    #   without a row in _supers — sid-as-position would then misroute
    #   or ANSI-crash out of bounds. _supers is sid-sorted, so position
    #   order == sid order and the (d2, pos) tie-break is the same
    #   total order as (d2, sid) over the groups that exist.
    sup_scored = F.transform(
        F.col("_supers"),
        lambda s, i: F.struct(
            V.sq_dist(F.col(vec_col), s["s_center"]).alias("d2"),
            i.alias("pos"),
        ),
    )
    if super_probe <= 1:
        members = F.element_at(
            F.col("_supers"),
            (F.array_min(sup_scored)["pos"] + 1).cast("int"),
        )["members"]
    else:
        # p nearest supers: slice of the (d2, pos)-sorted scores, then
        # flatten their member lists. _supers inside the lambda is a
        # plain broadcast-field reference (cheap per element) — the
        # no-expensive-expression-in-lambda rule above is about
        # recomputing argmins, not column access.
        top = F.slice(F.array_sort(sup_scored), 1, super_probe)
        members = F.flatten(
            F.transform(
                top,
                lambda t: F.element_at(
                    F.col("_supers"), (t["pos"] + 1).cast("int")
                )["members"],
            )
        )
    mem_scored = F.transform(
        members,
        lambda m: F.struct(
            V.sq_dist(F.col(vec_col), m["center"]).alias("d2"),
            m["cell"].alias("cell"),
        ),
    )
    base = candidates.select(id_col, vec_col).crossJoin(F.broadcast(packed))
    if cell_probe > 1:
        return _probe_exploded(base, mem_scored, id_col, vec_col, cell_probe)
    return base.select(
        F.col(id_col),
        F.col(vec_col),
        F.array_min(mem_scored)["cell"].alias("cell"),
    )


def knn_label_purity(
    emb: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    per_cell: int = CELL_TARGET_ROWS,
    assign_fn=None,
    cell_probe: int = 1,
) -> DataFrame:
    """Embedding-quality audit: for every vector, the fraction of its
    k nearest neighbors (cosine, within its IVF cell) that share its
    label — the distributed form of the k-NN classification probe run
    before trusting an embedding model for clustering/dedup/curation
    (low purity = labels and geometry disagree; a per-label breakdown
    localizes which classes bleed together).

    Same candidate topology as :func:`semdedup_flags`: neighbors are
    drawn from the vector's own cell via a cell-keyed self-join, so
    pairwise cost is |cell|^2 per cell and stays linear overall as the
    cell count scales with the corpus — enforced by the
    ``n_cells=None`` default through :func:`auto_n_cells` (the catalog
    instance passes ``per_cell=128``; its oracle mirrors the same
    count(*)-driven cell count). Restricting
    neighbors to the cell is the audit's documented semantics, not an
    approximation being hidden: purity-within-cell is exactly what the
    downstream cell-scoped operators (SemDeDup, IVF search) experience.

    Ranking is on the 6-dp-rounded cosine with neighbor-id tie-break —
    the same total order on both engines (dot/norm are fixed-order
    folds, bit-identical to the oracle's list_sum). Vectors alone in
    their cell emit n_neighbors = 0 and null purity.

    ``cell_probe > 1`` widens the candidate pool to the vector's ``p``
    nearest cells (multi-assignment, same dial as
    :func:`semdedup_flags`) — neighbor recall rises toward exact k-NN,
    candidate work grows ~p^2-fold. A pair sharing two probed cells is
    deduped (its cosine is identical either way) before the top-k rank
    so a neighbor is never counted twice.
    """
    assign_fn = _resolve_probe_assign_fn(assign_fn, cell_probe)
    assigned, _ = precompute_cells(emb, n_cells, id_col, vec_col, per_cell, assign_fn)
    labeled = C.track(
        assigned.join(emb.select(id_col, label_col), id_col)
    )
    # Candidate pairs come from a per-cell Arrow/numpy pass (round-10
    # optimization, guide §8 / §4.2 — the semdedup_flags treatment):
    # the former cell self-join shipped one wide 2x64-float JVM row
    # per directed pair and scored it with an interpreted fold. Each
    # vector now crosses the exchange once per probed cell; the pair
    # relation comes back NARROW (ids + labels + one raw double).
    # Rounding stays JVM-side (see _cell_pairs_pd) so the rounded-
    # cosine rank order is bit-identical to the fold's.
    id_t = emb.schema[id_col].dataType.simpleString()
    lbl_t = emb.schema[label_col].dataType.simpleString()
    pairs = (
        labeled.select(
            F.col(id_col).alias("_kn_id"),
            F.col(vec_col).alias("_kn_v"),
            F.col(label_col).alias("_kn_label"),
            "cell",
        )
        .groupBy("cell")
        .applyInPandas(
            _cell_pairs_pd,
            f"_a_id {id_t}, _a_label {lbl_t}, "
            f"_b_id {id_t}, _b_label {lbl_t}, _cos_raw double",
        )
        .select(
            "_a_id",
            "_a_label",
            "_b_id",
            "_b_label",
            F.round(F.col("_cos_raw"), 6).alias("_cos"),
        )
    )
    if "_crk" in assigned.columns:
        # multi-probe: the same (a, b) pair appears once per shared
        # probed cell — collapse before ranking (max of identical
        # cosines is deterministic)
        pairs = pairs.groupBy("_a_id", "_a_label", "_b_id", "_b_label").agg(
            F.max("_cos").alias("_cos")
        )
    w = Window.partitionBy("_a_id").orderBy(F.col("_cos").desc(), F.col("_b_id"))
    top = pairs.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    purity = top.groupBy(
        F.col("_a_id").alias(id_col), F.col("_a_label").alias(label_col)
    ).agg(
        F.count("*").alias("n_neighbors"),
        F.round(
            F.avg(F.when(F.col("_b_label") == F.col("_a_label"), 1.0).otherwise(0.0)),
            6,
        ).alias("same_label_frac"),
    )
    # Left join back so cell-singleton vectors stay in the report.
    canon = (
        labeled.filter(F.col("_crk") == 1)
        if "_crk" in labeled.columns
        else labeled
    )
    return (
        canon.select(id_col, label_col)
        .join(purity, [id_col, label_col], "left")
        .select(
            id_col,
            label_col,
            F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
            "same_label_frac",
        )
    )
