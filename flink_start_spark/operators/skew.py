"""Skew mitigation (SURVEY §4: the reference's keyBy(activity) has only
5 distinct keys — the canonical hot-key hazard at 100 TB).

Two tools:

- **Salted two-phase aggregation**: groupBy((key, salt)) partial → drop
  salt → groupBy(key) final. Spark's map-side partial aggregation
  already de-skews *algebraic* aggregates (count/sum/min/max collapse
  to one row per key per input partition before the shuffle), so this
  matters for the non-collapsing cases: exact count-distinct, collect-
  based aggregates, and high-cardinality-accumulator UDAFs, where all
  rows of a hot key otherwise land on one reducer.
- **AQE skew-join** is enabled session-wide (session.py) for join-side
  skew; salting a join key manually (duplicate the small side per salt)
  is only needed when AQE cannot split (e.g. bucketed tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    n_salts: int = 32,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact count-distinct per key, skew-proof.

    Phase 1 groups by (key, salt(distinct_col)) and collects the
    per-salt distinct count; because the salt is derived by hashing the
    *distinct column* (not randomly), equal values always share a salt
    bucket, so per-salt distinct counts are disjoint and sum exactly.
    Every reducer receives at most |key-partition|/n_salts of a hot
    key's rows.
    """
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(*keys, F.col(distinct_col), salt)
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(alias))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    agg_col: Column,
    merge: str,
    n_salts: int = 32,
    alias: str = "agg",
) -> DataFrame:
    """Generic salted two-phase aggregation for algebraic merges
    ('sum'|'min'|'max'|'count'): random salt spreads a hot key over
    ``n_salts`` reducers, the final phase merges the partials. For
    built-in aggregates Spark's partial aggregation usually makes this
    unnecessary — keep it for accumulators that do not collapse.
    """
    # pmod is already non-negative — no abs, matching
    # salted_count_distinct's pmod(hash(..)) form above
    salt = F.pmod(F.hash(F.rand(seed=42)), F.lit(n_salts)).alias("_salt")
    first = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[merge]
    second = F.sum if merge == "count" else first
    phase1 = (
        df.select(*keys, agg_col.alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(first("_v").alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(second("_partial").alias(alias))
