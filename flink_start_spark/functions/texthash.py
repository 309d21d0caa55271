"""Text hashing primitives: shingles, MinHash, SimHash, fingerprints.

Design constraint shared by every primitive here: the hash must be
**engine-portable** so the DuckDB oracle can recompute it exactly. We
therefore build everything on ``md5`` over UTF-8 strings (identical hex
output in Spark, DuckDB, and Python's hashlib) instead of engine-native
``hash()``/``xxhash64`` (different algorithms/seeds per engine).
MinHash takes the *lexicographic* min of salted md5 hex digests — a
uniform permutation for ranking purposes, no hex→int conversion needed.

All primitives are pure Catalyst expressions (transform/aggregate over
arrays); per-row cost is O(words x hashes) inside codegen, no shuffle
and no Python. Patterns follow the public MinHash/LSH literature
(Broder '97 shingling; Charikar '02 SimHash) — the reference project has
no dedup surface (SURVEY §2b extension).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def words(text: Column) -> Column:
    """Whitespace tokenization (the canonical first-stage tokenizer)."""
    return F.split(F.trim(text), r"\s+")


def distinct_words(text: Column) -> Column:
    return F.array_distinct(words(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined); whole text if < n words."""
    ws = words(text)
    k = F.size(ws) - (n - 1)
    make = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + j) for j in range(n)]
        ),
    )
    return F.when(k >= 1, make).otherwise(F.array(F.trim(text)))


def minhash_signature(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: array of ``num_hashes`` lexicographic-min salted
    md5 digests over the shingle set."""
    def salted(i: int):
        # closure factory — a default-arg lambda (s, i=i) would be read by
        # PySpark as the 2-arg (element, index) form, binding i to the
        # array-index column instead of the seed
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return F.array(
        *[F.array_min(F.transform(shingle_arr, salted(i))) for i in range(num_hashes)]
    )


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Banded LSH keys: md5 of each ``rows``-wide slice of the signature.

    Two documents collide in band b iff their signatures agree on all
    ``rows`` positions of that band — the standard AND/OR construction:
    P(candidate) = 1 - (1 - J^rows)^bands for Jaccard J.
    Returns array<struct<band:int, key:string>> ready to explode.
    """
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.element_at(signature, b * rows + r + 1) for r in range(rows)]
                    )
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two arrays (set semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(F.array_distinct(a)) + F.size(F.array_distinct(b))).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _hex_nibble(hex_char: Column) -> Column:
    """hex char → 0..15 via strpos (portable; DuckDB mirrors it)."""
    return F.instr(F.lit(HEX_DIGITS), hex_char) - 1


def simhash32(token_arr: Column) -> Column:
    """32-bit SimHash over a token array (Charikar '02 majority vote).

    Bit j is the majority vote of md5-nibble j across tokens: each token
    contributes +1 if nibble_j(md5(token)) >= 8 else -1; bit j is set
    iff the sum is > 0. 32 bits (one per md5 hex position) puts the
    random pair-collision rate at Hamming<=3 near 1.3e-6, selective
    enough that near-dup candidate joins stay linear; a 16-bit variant
    (~1% collisions) measurably floods the pair stage. md5 per token is
    computed ONCE into an array; each bit then does a cheap pass over
    the cached hex digests.
    """
    hashes = F.transform(token_arr, lambda w: F.md5(w))

    def vote_fn(j: int):
        # closure factory: PySpark infers lambda arity from the signature,
        # so a bound default arg (lambda acc, h, j=j) would be read as a
        # 3-argument merge function
        return lambda acc, h: acc + F.when(
            _hex_nibble(F.substring(h, j + 1, 1)) >= 8, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(32):
        vote = F.aggregate(hashes, F.lit(0), vote_fn(j))
        out = out + F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def bag_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    word set. Two documents collide iff they use exactly the same words —
    the cheap first-pass near-dup key (word order and repetition are
    ignored)."""
    return F.md5(F.array_join(F.array_sort(distinct_words(text)), " "))
