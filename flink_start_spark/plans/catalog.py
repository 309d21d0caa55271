"""The engine's declared query surface.

Each :class:`Query` pairs a Spark implementation (a callable taking
``(spark, sf_dir)`` and returning a DataFrame) with the equivalent ANSI
SQL that DuckDB runs on the same parquet tables — the driver's
correctness oracle. Conventions that keep the value-hash comparison
stable across engines:

- every computed column is aliased identically on both sides;
- window bounds are emitted as **epoch-second BIGINTs**, not timestamps
  (engine-to-engine timestamp/timezone encodings differ; epoch longs
  cannot);
- floating-point aggregates are rounded (2 decimals for money, 6 for
  ratios) on both sides — double summation order differs between engines
  by ~1e-9 relative, far below the rounding grain;
- results are unordered sets (the driver hashes order-insensitively), so
  no ORDER BY is required for correctness; queries whose *semantics* are
  a ranking (top-k) still emit the rank so the set is well-defined.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_start_spark.operators import windows as W
from flink_start_spark.sources.catalog import load_table


@dataclass
class Query:
    """One declared query: Spark impl + DuckDB oracle + provenance."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def _register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in QUERIES:
            # a silent overwrite once shadowed a whole query behind an
            # unrelated same-named registration (round 5) — the winner
            # depended on module import order and the loser's oracle
            # vanished without any test noticing
            raise ValueError(f"duplicate catalog query name: {name!r}")
        QUERIES[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: q.spark for n, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}


def money_sum(expr, alias: str):
    """Order-independent money aggregation: the row-level double is cast
    to DECIMAL(20,6) BEFORE summing, so the sum is exact integer
    arithmetic regardless of partitioning/summation order, then rounded
    to cents. Rounding a double sum instead flips the last cent whenever
    the true value sits within the (order-dependent) ~1e-8 float error
    of a half-cent boundary — observed as spurious one-cent diffs
    between a 32-partition and a 200-partition run of the same query.
    Oracle twin: ``round(sum(CAST(expr AS DECIMAL(20,6))), 2)::DOUBLE``.
    """
    return (
        F.round(F.sum(expr.cast("decimal(20,6)")), 2).cast("double").alias(alias)
    )


def _epoch(col: str = "w") -> list:
    """window struct → epoch-second BIGINT bounds (cross-engine stable)."""
    return [
        F.col(f"{col}.start").cast("long").alias("window_start"),
        F.col(f"{col}.end").cast("long").alias("window_end"),
    ]


def floor_div_sql(n: str, m: int) -> str:
    """DuckDB SQL fragment for FLOOR division of integer expression
    ``n`` by positive literal ``m`` — the oracle twin of Spark's
    floorDiv-backed ``cast(ts AS long)`` / pmod-floor `div`.

    Bare integer ``//`` truncates toward zero on BOTH engines
    (measured: -500000 // 1000000 = 0 in DuckDB, same for Spark
    `div`), which diverges from the repo-wide floor-epoch convention
    on pre-epoch values. Subtracting the non-negative mod first makes
    the dividend an exact multiple, where truncation == floor.
    Single-sourced so the parenthesization can't drift per call site.
    """
    return f"(({n} - ((({n}) % {m}) + {m}) % {m}) // {m})"


# =====================================================================
# Reference windowing surface (SURVEY §2 O5-O13) over the events table.
# Role mapping per FIXTURES.md F3: activity→event_type, register→signup;
# window sizes scale to the month-long events span (1 h / 15 min).
# =====================================================================

_TUMBLE_SEC = 3600

@_register(
    "tumbling_signup_count",
    f"""
    SELECT (FLOOR(epoch(ts) / {_TUMBLE_SEC}) * {_TUMBLE_SEC})::BIGINT AS window_start,
           (FLOOR(epoch(ts) / {_TUMBLE_SEC}) * {_TUMBLE_SEC} + {_TUMBLE_SEC})::BIGINT AS window_end,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_cnt
    FROM events
    GROUP BY 1, 2
    """,
    description=(
        "O6+O7/O8: tumbling 1h event-time window, conditional count of "
        "signups (reference: TumblingEventTimeWindows 3s + count of "
        "activity=='register', FlinkWindowLearning.scala:61-89). The "
        "flagship query."
    ),
    tags=("windows", "reference"),
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = W.tumbling_window_agg(
        ev,
        "1 hour",
        W.conditional_count(F.col("event_type") == "signup", "signup_cnt"),
    )
    return out.select(
        F.col("window_start").cast("long"),
        F.col("window_end").cast("long"),
        "signup_cnt",
    )


@_register(
    "keyed_tumbling_counts",
    f"""
    SELECT (FLOOR(epoch(ts) / {_TUMBLE_SEC}) * {_TUMBLE_SEC})::BIGINT AS window_start,
           (FLOOR(epoch(ts) / {_TUMBLE_SEC}) * {_TUMBLE_SEC} + {_TUMBLE_SEC})::BIGINT AS window_end,
           event_type,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3
    """,
    description=(
        "O10+O11: keyBy(activity) + per-key tumbling window count "
        "(FlinkWindowLearning.scala:135-174). groupBy(window, key) — the "
        "shuffle is on (window,key); partial aggregation collapses it."
    ),
    tags=("windows", "reference"),
)
def q_keyed_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = W.tumbling_window_agg(
        ev, "1 hour", F.count("*").alias("cnt"), keys=["event_type"]
    )
    return out.select(
        F.col("window_start").cast("long"),
        F.col("window_end").cast("long"),
        "event_type",
        "cnt",
    )


_SLIDE_SEC = 900

@_register(
    "sliding_signup_count",
    f"""
    WITH shifts AS (SELECT range AS k FROM range(0, {_TUMBLE_SEC // _SLIDE_SEC})),
    placed AS (
      SELECT (FLOOR(epoch(e.ts) / {_SLIDE_SEC}) * {_SLIDE_SEC} - s.k * {_SLIDE_SEC})::BIGINT
               AS window_start,
             e.event_type
      FROM events e CROSS JOIN shifts s
    )
    SELECT window_start,
           window_start + {_TUMBLE_SEC} AS window_end,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_cnt
    FROM placed
    GROUP BY 1, 2
    """,
    description=(
        "O12: sliding 1h/15m event-time window, signup count "
        "(reference: SlidingEventTimeWindows 3s/1s, "
        "FlinkWindowLearning.scala:221-232). Spark expands each event into "
        "size/slide windows inside the aggregation; the oracle does the "
        "same expansion with a shift spine."
    ),
    tags=("windows", "reference"),
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = W.sliding_window_agg(
        ev,
        "1 hour",
        "15 minutes",
        W.conditional_count(F.col("event_type") == "signup", "signup_cnt"),
    )
    return out.select(
        F.col("window_start").cast("long"),
        F.col("window_end").cast("long"),
        "signup_cnt",
    )


_GAP_SEC = 1800

@_register(
    "session_windows_per_user",
    f"""
    WITH o AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS hit
      FROM events),
    b AS (
      SELECT user_id, us, hit,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       > {_GAP_SEC} * 1000000
                  OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM o),
    g AS (
      SELECT user_id, us, hit,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM b)
    SELECT user_id,
           -- pmod-floor (floor_div_sql), NOT bare //: DuckDB integer
           -- // truncates toward zero where Spark's timestamp->long
           -- cast floors
           {floor_div_sql("min(us)", 1000000)}::BIGINT AS window_start,
           {floor_div_sql(f"max(us) + {_GAP_SEC} * 1000000", 1000000)}::BIGINT AS window_end,
           count(*) AS n_events,
           sum(hit)::BIGINT AS signup_cnt
    FROM g GROUP BY user_id, sid
    """,
    description=(
        "Session windows (30 min gap) per user — the reference's stated "
        "next step (README.md:33). F.session_window merges overlapping "
        "[ts, ts+gap) intervals inside one keyed aggregation (no "
        "self-join/islands pass); the oracle rebuilds sessions with the "
        "lag/cumulative-sum island trick at microsecond precision "
        "(both engines floor nanos→micros identically)."
    ),
    tags=("windows", "reference", "sessions"),
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = W.session_window_agg(
        ev,
        "30 minutes",
        F.count("*").alias("n_events"),
        W.conditional_count(F.col("event_type") == "signup", "signup_cnt"),
        keys=["user_id"],
    )
    return out.select(
        "user_id",
        F.col("window_start").cast("long"),
        F.col("window_end").cast("long"),
        "n_events",
        F.col("signup_cnt").cast("long"),
    )


_TRIGGER_N = 100

@_register(
    "count_trigger_cumulative",
    f"""
    WITH ordered AS (
      SELECT row_number() OVER (ORDER BY event_id) AS rn,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM events
    )
    SELECT (rn / {_TRIGGER_N})::BIGINT AS fire_seq,
           rn::BIGINT AS arrival,
           cum::BIGINT AS signup_cnt
    FROM ordered WHERE rn % {_TRIGGER_N} = 0
    """,
    description=(
        "O13, exact Flink semantics: CountTrigger.of(n) FIRE-without-PURGE "
        "on a GlobalWindow (FlinkWindowLearning.scala:242-255) — cumulative "
        "signup count sampled at every n-th arrival (n=100; arrival order = "
        "event_id, the source offset). See SURVEY §2 semantics note."
    ),
    tags=("windows", "reference", "custom-operator"),
)
def q_count_trigger_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = W.count_trigger_cumulative(
        ev,
        F.col("event_type") == "signup",
        every=_TRIGGER_N,
        order_col="event_id",
        alias="signup_cnt",
    )
    return out.select("fire_seq", "arrival", "signup_cnt")


@_register(
    "count_trigger_buckets",
    f"""
    WITH ordered AS (
      SELECT row_number() OVER (ORDER BY event_id) AS rn,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    b AS (
      SELECT ((rn - 1) // {_TRIGGER_N})::BIGINT AS bucket,
             sum(hit) AS signup_cnt, count(*) AS sz
      FROM ordered GROUP BY 1
    )
    SELECT bucket + 1 AS fire_seq, signup_cnt::BIGINT AS signup_cnt
    FROM b WHERE sz = {_TRIGGER_N}
    """,
    description=(
        "O13, per-bucket variant: signup count within each consecutive "
        "group of n arrivals (complete buckets only). The scalable contract: "
        "with a source-provided arrival index the bucket id is a projection "
        "and this is an ordinary hash aggregation."
    ),
    tags=("windows", "reference", "custom-operator"),
)
def q_count_trigger_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = W.count_trigger_buckets(
        ev,
        F.col("event_type") == "signup",
        every=_TRIGGER_N,
        order_col="event_id",
        alias="signup_cnt",
    )
    return out.select("fire_seq", "signup_cnt")
