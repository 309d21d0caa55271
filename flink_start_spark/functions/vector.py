"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

No UDFs: ``F.zip_with`` + ``F.aggregate`` run as JVM lambda evaluation
(higher-order functions are interpreted, NOT whole-stage-codegen'd —
the round-10/11 optimization lesson: per-PAIR folds dominate pair
stages, so hot paths precompute per-ROW norms and pass them to
:func:`cosine_with_norms`, and the heaviest kernels batch through
numpy/Arrow in operators/similarity.py). Elements are cast to double
*before* multiplication and folded left-to-right — the same order
DuckDB's ``list_*`` lambdas use, which keeps cross-engine results
bit-comparable (we still round at the query edge).

The reference has no vector surface; this implements the similarity-
search extension (SURVEY §2b, BASELINE.json north_star).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm, accumulated in double."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm.

    The NULL branch is an explicit guard, not division fallout: the
    session runs Spark 4 ANSI mode, where an unguarded ``x / 0.0``
    RAISES (DIVIDE_BY_ZERO) and one all-zeros embedding would kill the
    whole query. Oracle mirrors use ``NULLIF(denominator, 0)`` for the
    same semantics."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with the two L2 norms PRECOMPUTED per row
    (round 11, guide §4.2): a pair-scoring stage that joins two vector
    relations evaluates cosine once per PAIR — folding both norms there
    re-runs two 64-element interpreted folds per pair (higher-order
    functions are not whole-stage-codegen'd). Computing ``norm()`` once
    per ROW before the join and passing it in leaves only the dot fold
    per pair. Bit-identical: same folds, same sqrt, same product, same
    zero-denominator NULL guard."""
    denom = na * nb
    return F.when(denom != 0.0, dot(a, b) / denom)


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, accumulated in double. No sqrt on purpose:
    argmin/rank consumers only need the monotone order, and skipping the
    sqrt keeps the expression cheaper AND bit-identical to the DuckDB
    mirror ``list_sum([(a[i]-b[i])*(a[i]-b[i]) ...])`` (same left-to-right
    fold, no libm divergence)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def rp_weights(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane ``plane``: weight i is an
    md5 nibble minus 7.5 — a zero-mean integer-plus-half lattice that
    (a) is reproducible from the plane index alone (no RNG state to
    ship), and (b) consists of exact binary fractions, so the dot
    products are bit-identical across engines and the DuckDB oracle can
    embed the same literals."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"rp|{plane}|{i // 32}".encode()).hexdigest()
        out.append(float(int(h[i % 32], 16)) - 7.5)
    return out


def rp_sign_bits(a: Column, n_bits: int, dim: int, offset: int = 0) -> Column:
    """Random-hyperplane LSH key, true random-projection variant: bit j
    is the sign of <vec, h_(offset+j)> for the fixed pseudo-random
    hyperplanes of :func:`rp_weights`, packed into a BIGINT.

    Unlike the coordinate-basis :func:`sign_bits`, this is the actual
    Charikar construction — collision probability 1 - theta/pi per bit
    for ANY embedding distribution, not just near-isotropic ones. The
    weights are plan-time literal arrays, so each bit is one codegen'd
    zip_with/aggregate dot product — no per-row hashing.
    """
    out = F.lit(0)
    for j in range(n_bits):
        w = F.array(*[F.lit(x) for x in rp_weights(offset + j, dim)])
        dotp = F.aggregate(
            F.zip_with(a, w, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(dotp >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return out.cast("long")


#: quantization grid shared by every integer-exact vector primitive in
#: the repo (the lang_centroid_outliers precedent): components are
#: clamped to ±2048 then floored onto a 2^-20 grid, making downstream
#: sums exact integers — summation-order-free and engine-identical.
QUANT_SCALE = 1_048_576
QUANT_CLAMP = 2048.0


def rp_weights_q(plane: int, dim: int) -> list[int]:
    """Integer twin of :func:`rp_weights`: weight i is ``2*nibble - 15``
    (= 2x the float weight, so the hyperplane DIRECTION is identical —
    positive scaling never flips a sign). All-integer weights + the
    quantized components of :func:`quantize_embedding` make the sign
    dots exact int64 arithmetic: bit-identical across engines AND
    summation orders, so the DuckDB oracle can compute the weights
    dynamically (md5 in SQL) instead of embedding megabytes of
    literals, and the Spark side can use a single numpy int64 matmul
    for hundreds of planes."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"rp|{plane}|{i // 32}".encode()).hexdigest()
        out.append(2 * int(h[i % 32], 16) - 15)
    return out


def rp_weight_matrix_q(n_planes: int, dim: int):
    """(n_planes, dim) int64 numpy matrix of :func:`rp_weights_q` rows —
    the batch form for the mapInPandas rp-key path."""
    import numpy as np

    return np.array(
        [rp_weights_q(p, dim) for p in range(n_planes)], dtype=np.int64
    )


def quantize_embedding(a: Column) -> Column:
    """Exact-integer quantization of a float-array column: clamp ±2048,
    scale by 2^20, floor to LONG. The clamp keeps ANSI floor→LONG from
    overflowing on out-of-domain components; the grid keeps every
    downstream integer sum exact (order-free, engine-identical).
    NULL/NaN-free input per the corpus contract; a NULL element passes
    through as NULL and is treated as a zero contribution by
    :func:`rp_sign_bits_q` (the oracle mirrors with coalesce)."""
    # explicit isNotNull gate: Spark's greatest() SKIPS nulls (a NULL
    # component would silently clamp to -2048 instead of staying NULL
    # for the coalesce-to-0 convention downstream)
    return F.transform(
        a,
        lambda x: F.when(
            x.isNotNull(),
            F.floor(
                F.least(
                    F.greatest(x.cast("double"), F.lit(-QUANT_CLAMP)),
                    F.lit(QUANT_CLAMP),
                )
                * F.lit(float(QUANT_SCALE))
            ).cast("long"),
        ),
    )


def rp_sign_bits_q(xq: Column, n_bits: int, dim: int, offset: int = 0) -> Column:
    """Random-hyperplane LSH key over a PRE-QUANTIZED long-array column
    (:func:`quantize_embedding`): bit j is the sign of the exact int64
    dot <xq, wq_(offset+j)> against :func:`rp_weights_q` literals.

    This is the column-expression form, fine for a few bands; the
    sign-LSH occupancy ladder's rp levels (up to 2664 planes) go through
    the numpy matmul path in operators/similarity.py instead — both
    produce identical integers by construction (exact arithmetic).
    Missing components (short vectors / zip_with padding) contribute 0
    via coalesce, mirroring the oracle's coalesce(x*w, 0)."""
    out = F.lit(0).cast("long")
    for j in range(n_bits):
        w = F.array(*[F.lit(int(x)) for x in rp_weights_q(offset + j, dim)])
        dotp = F.aggregate(
            F.zip_with(
                xq, w, lambda x, y: F.coalesce(x * y.cast("long"), F.lit(0).cast("long"))
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        # coalesce: a NULL array gives a NULL fold result; treat it as
        # the zero dot (all bits 1) — the convention the numpy-matmul
        # path and the DuckDB oracle share for NULL embeddings
        out = out + F.when(
            F.coalesce(dotp, F.lit(0).cast("long")) >= 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out.cast("long")


def sign_bits(a: Column, n_bits: int, offset: int = 0) -> Column:
    """Random-hyperplane LSH key, basis-vector variant: the sign pattern of
    coordinates ``[offset, offset + n_bits)`` packed into a BIGINT.

    For cosine LSH the hyperplanes should be random; for pre-whitened /
    near-isotropic embeddings the coordinate basis is an acceptable,
    *fully deterministic* stand-in — the property that matters for the
    engine is that bucketing is a pure projection (no shuffle, no state)
    and identically computable by the oracle. Swap in a fixed random
    projection matrix (broadcast, ``dot`` per plane) for production
    embeddings.
    """
    # try_element_at: under ANSI mode a plain element_at RAISES past the
    # array end; NULL-on-out-of-bounds keeps the documented behavior of
    # padding short vectors with 0-bits when bands*bits > dim
    bit = lambda i: F.when(  # noqa: E731
        F.try_element_at(a, F.lit(i + 1)).cast("double") >= 0, F.lit(1)
    ).otherwise(F.lit(0))
    out = F.lit(0)
    for i in range(n_bits):
        out = out + (bit(offset + i) * F.lit(2**i))
    return out.cast("long")
