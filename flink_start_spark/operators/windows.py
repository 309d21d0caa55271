"""Event-time windowed aggregation — the reference's core surface.

Implements SURVEY §2 O5-O13 as composable DataFrame transforms:

- tumbling windows (O6), keyed tumbling (O10+O11), sliding (O12) via the
  built-in ``F.window`` grouping column — identical ``[start, end)``
  epoch-aligned bucketing to Flink's ``TimeWindow`` (both align window k
  to ``[k*size, (k+1)*size)``), so the reference's golden counts
  (FlinkWindowLearning.scala:63-72, :141-157, :185-219) carry over;
- the conditional count (O7/O8/O14/O15) as ``count(when(pred, 1))`` —
  Spark always plans this as partial + final HashAggregate, i.e. the
  reference's "memory-efficient incremental aggregation" (Approach 2,
  FlinkWindowLearning.scala:95-109) is the only physical shape we ever
  generate, never the buffer-everything AllWindowFunction (Approach 1);
- the count-triggered global window (O13, FlinkWindowLearning.scala:242-255)
  which has no Structured Streaming primitive: batch semantics are
  expressed with analytic window functions (row_number bucketing +
  running conditional sum). See the FIRE-without-PURGE semantics note in
  SURVEY §2 — the cumulative variant reproduces Flink's behavior exactly.

Scale notes: windowed groupBy shuffles on (window, key); with few distinct
keys (event_type has 5) the map-side partial aggregation collapses each
upstream partition to ~|windows|x|keys| rows before the shuffle, so the
exchange is tiny regardless of input size. The count-trigger operator is
inherently sequential (a total arrival order); `count_trigger_buckets`
documents the scalable contract: the arrival index must come from the
source (log offset), after which bucketing is an ordinary hash groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, ts_col: str = "ts", source_col: str | None = None) -> DataFrame:
    """O4: event-time extraction. ISO-8601 string → TimestampType.

    The reference parses per record on demand (package.scala:11,
    ``Instant.parse``); here it is a single codegen'd cast done once at
    the edge.
    """
    if source_col is None:
        return df
    return df.withColumn(ts_col, F.to_timestamp(F.col(source_col)))


def conditional_count(pred: Column, alias: str = "cnt") -> Column:
    """O7/O8/O14/O15: count of rows satisfying ``pred`` (else-NULL count)."""
    return F.count(F.when(pred, F.lit(1))).alias(alias)


def _windowed_agg(
    df: DataFrame,
    w_expr: Column,
    aggs: tuple[Column, ...],
    keys: list[str] | None,
) -> DataFrame:
    """Shared groupBy(window)/agg/unpack for the tumbling/sliding/
    session trio: one shuffle on (window, *keys) with partial
    aggregation, window struct unpacked to window_start/window_end,
    then keys, then the aggs in declaration order."""
    keys = list(keys or [])
    out = df.groupBy(w_expr.alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    tail = [c for c in out.columns if c != "w" and c not in keys]
    if len(tail) != len(aggs):
        # an agg alias colliding with a key name would be silently
        # dropped from (or ambiguous in) the unpacked projection
        raise ValueError(
            f"agg aliases must not collide with key names {keys}; "
            f"got agg columns {out.columns[1 + len(keys):]}"
        )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in tail],
    )


def tumbling_window_agg(
    df: DataFrame,
    size: str,
    *aggs: Column,
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """O6 (+O10/O11 when ``keys``): tumbling event-time window aggregation.

    Returns columns: window_start, window_end (timestamps), *keys, *aggs.
    """
    return _windowed_agg(df, F.window(F.col(ts_col), size), aggs, keys)


def sliding_window_agg(
    df: DataFrame,
    size: str,
    slide: str,
    *aggs: Column,
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """O12: sliding event-time window aggregation (overlapping windows).

    Each event lands in ``size/slide`` windows; Spark expands this with a
    generator inside the aggregation — no self-join needed.
    """
    return _windowed_agg(df, F.window(F.col(ts_col), size, slide), aggs, keys)


def session_window_agg(
    df: DataFrame,
    gap: str,
    *aggs: Column,
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session (gap-based) event-time windows — the reference's stated
    next step (/root/reference/README.md:33, "session windows").

    ``F.session_window(ts, gap)``: each event opens ``[ts, ts+gap)``;
    windows merge while they TOUCH (boundary equality included —
    verified by property test: events at t and t+gap share a session),
    so a session breaks exactly when the gap to the previous event is
    STRICTLY greater than ``gap``. Window end = last event + gap.
    Same physical shape as the other windows — one shuffle on
    (session, *keys) with partial aggregation; Spark merges sessions
    inside the aggregation, no self-join or sort-based islands pass.

    Returns: window_start, window_end (timestamps), *keys, *aggs.
    """
    return _windowed_agg(df, F.session_window(F.col(ts_col), gap), aggs, keys)


def interval_peak(
    df: DataFrame,
    start_us_col: str,
    end_us_col: str,
) -> DataFrame:
    """Peak concurrency of half-open microsecond intervals
    ``[start, end)`` — the classic range-analytics sweep (max
    simultaneously-open sessions / in-flight orders / concurrent
    calls), scale-safe.

    Each interval becomes +1/-1 endpoint deltas encoded ``us*2 + bit``
    (bit 1 for starts) so an end at instant t sorts BEFORE a start at
    t — adjacent intervals never phantom-overlap. Deltas pre-aggregate
    per encoded instant, which (a) shrinks the sweep relation to
    distinct instants and (b) makes the sweep order UNIQUE, the
    contract the two-phase running sum requires. Within-instant
    ordering cannot hide a higher peak: all -1s of an instant apply
    before all +1s, and each group's extremum is attained at a group
    boundary the aggregated running sum visits.

    Returns ONE row: ``peak_concurrent`` and ``first_peak_epoch_s``
    (the earliest instant the peak is reached, epoch seconds — the
    repo's cross-engine window-bound convention). Empty input yields
    one all-null row (global-aggregate SQL semantics, identical on
    both engines).
    """
    from flink_start_spark.operators import selection as S

    pts = df.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col(start_us_col) * 2 + 1).alias("k"),
                    F.lit(1).alias("d"),
                ),
                F.struct(
                    (F.col(end_us_col) * 2).alias("k"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("e")
    ).select(F.col("e.k").alias("k"), F.col("e.d").alias("d"))
    grouped = pts.groupBy("k").agg(F.sum("d").alias("delta"))
    # Round-11 (guide §1.2/§2.1): no rank output (it was dropped), and
    # "earliest instant attaining the max" is ONE lexicographic-max
    # aggregate over struct(running, -k) — the old peak-broadcast +
    # re-filter re-executed the whole running-sum subtree twice and
    # added a crossJoin round-trip.
    run = S.with_rank_and_sum(grouped, [], "k", "delta", out_sum="running")
    m = run.agg(
        F.max(
            F.struct(F.col("running").alias("r"), (-F.col("k")).alias("nk"))
        ).alias("_m")
    )
    return m.selectExpr(
        "_m.r AS peak_concurrent",
        # pmod-floor division on first_k = -_m.nk (matches the oracle's
        # pmod form and the repo-wide floor-epoch convention). Bare
        # `div` would truncate toward zero on pre-epoch instants — and
        # so does DuckDB's integer `//` (they agree in the wrong
        # direction; the floor convention is what the window queries
        # emit).
        "CAST((CAST(((-_m.nk) - pmod(-_m.nk, 2)) AS BIGINT) div 2 "
        " - pmod(CAST(((-_m.nk) - pmod(-_m.nk, 2)) AS BIGINT) div 2, 1000000)"
        ") div 1000000 AS BIGINT) AS first_peak_epoch_s",
    )


def count_trigger_cumulative(
    df: DataFrame,
    pred: Column,
    every: int = 5,
    order_col: str = "arrival",
    alias: str = "cnt",
) -> DataFrame:
    """O13, exact Flink semantics: CountTrigger.of(n) on a GlobalWindow.

    Flink FIREs without PURGE (FlinkWindowLearning.scala:245): every n-th
    arrival re-evaluates the window over *all retained* elements, so the
    emitted value is the cumulative count of ``pred`` over arrivals
    1..k*n. Expressed with analytic functions: a running conditional sum
    ordered by arrival, sampled where ``row_number() % n == 0``.

    Returns: fire_seq (1-based fire index), arrival (1-based dense rank of
    the triggering element in ``order_col`` order — dense even when the
    order column itself has gaps), cnt (cumulative).

    Scale shape: arrival rank AND the running conditional sum ride the
    two-phase bucket-offset topology (operators/selection.
    with_rank_and_sum) in one pass — per-bucket partial counts/sums, an
    array-fold prefix over the bounded histogram, and an in-bucket
    window partitioned by ``_bkt`` — so even this un-keyed global-order
    operator never funnels the relation through a single sort task.
    (With a source-provided offset column the bucket id is a pure
    projection and the same shape applies with zero extra passes.)
    """
    from flink_start_spark.operators import selection as S

    slim = df.select(
        F.col(order_col), F.when(pred, 1).otherwise(0).alias("_hit")
    )
    running = S.with_rank_and_sum(
        slim, [], order_col, "_hit", out_rank="_rn", out_sum=alias
    )
    return running.filter(F.col("_rn") % every == 0).select(
        (F.col("_rn") / every).cast("long").alias("fire_seq"),
        F.col("_rn").cast("long").alias("arrival"),
        F.col(alias).cast("long").alias(alias),
    )


def count_trigger_buckets(
    df: DataFrame,
    pred: Column,
    every: int = 5,
    order_col: str = "arrival",
    alias: str = "cnt",
) -> DataFrame:
    """O13, per-bucket variant (the generally useful operator).

    Buckets arrivals into consecutive groups of ``every`` and counts
    ``pred`` per *complete* bucket (incomplete tail buckets do not fire,
    matching the trigger never firing for a partial batch). When the
    arrival index comes from the source (e.g. a log offset) the bucket
    id is a pure projection; here it is derived from the arrival rank,
    which itself comes from the two-phase bucket-offset topology
    (operators/selection.with_rank_and_sum) — no global sort task even
    without a source offset.
    """
    from flink_start_spark.operators import selection as S

    slim = df.select(
        F.col(order_col), F.when(pred, 1).otherwise(0).alias("_hit")
    )
    bucketed = S.with_rank_and_sum(slim, [], order_col, out_rank="_rn").select(
        F.floor((F.col("_rn") - F.lit(1)) / every).alias("bucket"),
        "_hit",
    )
    agg = bucketed.groupBy("bucket").agg(
        F.sum("_hit").cast("long").alias(alias), F.count("*").alias("_sz")
    )
    return (
        agg.filter(F.col("_sz") == every)
        .select((F.col("bucket") + 1).alias("fire_seq"), F.col(alias))
        .orderBy("fire_seq")
    )
