"""Join operators Spark lacks natively: as-of join and range join.

The reference has no joins at all (SURVEY §2: "categories with NO
reference implementation"); these are the time-series joins a streaming
analytics engine is expected to provide, composed from built-in
operators per the preference order in the project guide (compose >
Pandas UDF > custom strategy).

**As-of join** (each left row matched to the latest right row at or
before its timestamp, per key; forward and nearest variants too):
implemented as the union-merge pattern — tag both sides, union, one
window sorted by (ts, side-priority) per key, ``last(value,
ignorenulls)`` carries the most recent right-side payload forward onto
left rows; forward reuses the identical carry over a descending sort,
nearest evaluates both in the same exchange. Exactly ONE shuffle (by
key), no range explosion, no Python; this is the shape that survives
100 TB (a naive inequality join is quadratic per key; per-group
``pd.merge_asof`` via applyInPandas works but pays Arrow transfer for
the whole table).

**Range join** (left ts within [right start, right end)): bucketize the
time axis so the join becomes an equi-join on (key, bucket) with a
residual range filter — the standard bucketed-range-join rewrite; bucket
width should approximate the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach to each left row the payload of the matching
    right row for the same key, where "matching" is

    - ``backward`` (merge_asof default): latest right row with
      ``right_ts <= left_ts``;
    - ``forward``: earliest right row with ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two is closer in time (exact tie →
      backward, matching ``pd.merge_asof(direction='nearest')``).

    Left rows with no matching right row keep NULL payloads. Output:
    all left columns + ``payload_cols`` (+ ``matched_ts`` = the matched
    right timestamp).

    All three directions use the same union-merge plan: ONE shuffle on
    the key; forward is the backward carry over a descending sort, and
    nearest evaluates both carries inside the same window exchange (two
    in-partition sorts, still a single shuffle — never a second join).

    Precondition: right-side ``(key, right_ts)`` must be unique. With
    duplicate right timestamps the union window's (ts, side) order
    leaves the duplicates mutually unordered, and the carried payload
    is whichever the in-partition sort placed last — nondeterministic
    across runs/partitionings (``pd.merge_asof`` shares the ambiguity
    but resolves it by input ROW order, which a distributed relation
    does not have). Pre-aggregate the right side to one row per
    (key, ts) first, as every in-repo call site does
    (plans/advanced.py).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    clash = [c for c in payload_cols if c in left.columns]
    if clash:
        # the output would carry two columns per clashed name (left's
        # own + the matched payload) — unusable by name downstream and
        # unwritable to parquet; fail with guidance instead
        raise ValueError(
            f"payload columns {clash} also exist in the left frame; "
            "alias one side before the as-of join (pd.merge_asof solves "
            "this with suffixes — here the rename is explicit)"
        )

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # SQL join semantics for NULL keys: a NULL never equals anything,
    # so NULL-key right rows can match no left row — drop them before
    # the union. Without this, Window.partitionBy groups ALL NULL keys
    # into one partition and a NULL-key left row would "match" a
    # NULL-key right row. NULL-key LEFT rows need no filter: their
    # partition then holds no _side=0 rows, so they keep NULL payloads
    # (merge_asof's by=NaN behavior, and what an equi-join would do).
    rt = (
        right.filter(F.col(key).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in payload_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in payload_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    lt = lt.select(*rt.columns)  # same column order

    merged = rt.unionByName(lt)
    # right rows sort adjacent to left rows at equal ts with _side 0
    # first in BOTH orders, so an equal-ts right row matches ("at or
    # before" backward / "at or after" forward).
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def carry(w: Window, prefix: str) -> list:
        cols = [
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in payload_cols
        ]
        cols.append(
            F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}mts")
        )
        return cols

    carried_cols: list = []
    if direction in ("backward", "nearest"):
        carried_cols += carry(w_back, "_b_")
    if direction in ("forward", "nearest"):
        carried_cols += carry(w_fwd, "_f_")
    carried = merged.select(
        *[c for c in merged.columns if c != "_side"],
        F.col("_side").alias("_side_keep"),
        *carried_cols,
    ).filter(F.col("_side_keep") == 1)

    if direction == "backward":
        pick = {c: F.col(f"_b_{c}") for c in payload_cols}
        mts = F.col("_b_mts")
    elif direction == "forward":
        pick = {c: F.col(f"_f_{c}") for c in payload_cols}
        mts = F.col("_f_mts")
    else:
        # closer side wins; tie → backward. Both diffs are nonnegative
        # by construction, so plain subtraction compares correctly for
        # timestamps (interval ordering) and numerics alike.
        use_back = F.col("_b_mts").isNotNull() & (
            F.col("_f_mts").isNull()
            | (
                (F.col("_ts") - F.col("_b_mts"))
                <= (F.col("_f_mts") - F.col("_ts"))
            )
        )
        pick = {
            c: F.when(use_back, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
            for c in payload_cols
        }
        mts = F.when(use_back, F.col("_b_mts")).otherwise(F.col("_f_mts"))

    return carried.select(
        *[c for c in left.columns],
        *[pick[c].alias(c) for c in payload_cols],
        mts.alias("matched_ts"),
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    key: str,
    point_ts: str,
    range_start: str,
    range_end: str,
    bucket: str | int = "1 day",
) -> DataFrame:
    """Range join: match each point to every range (same key) containing
    it: ``range_start <= point_ts < range_end``.

    Rewritten as an equi-join on (key, time-bucket): each range is
    expanded to the buckets it overlaps (sequence over the bucketed
    span), points join on their single bucket, then the exact range
    predicate filters. With bucket ~ typical interval length the
    expansion factor stays near 2 and the join is hash, not
    nested-loop. ``bucket`` is a known interval label or a raw
    positive integer of seconds (the tuning knob the docstring above
    recommends matching to the typical interval length).
    """
    known = {"1 minute": 60, "1 hour": 3600, "1 day": 86400, "1 week": 604800}
    if isinstance(bucket, int):
        secs = bucket
    elif bucket in known:
        secs = known[bucket]
    else:
        raise ValueError(
            f"bucket must be a positive integer of seconds or one of "
            f"{sorted(known)}; got {bucket!r}"
        )
    if secs < 1:
        raise ValueError(f"bucket seconds must be >= 1, got {secs}")
    clash = [
        c for c in ranges.columns if c in points.columns and c != key
    ]
    if clash:
        # same guidance as as_of_join: duplicate names survive the join
        # as ambiguous columns and fail downstream selects/writes
        raise ValueError(
            f"columns {clash} exist on both sides; alias one side "
            "before the range join"
        )
    pt = points.withColumn(
        "_bucket", F.floor(F.col(point_ts).cast("long") / secs)
    )
    # upper bound floor(end/secs), NOT floor((end-1)/secs): cast-to-long
    # truncates sub-second fractions, so a range_end of k*secs + 0.4ms
    # would lose its final bucket under the -1 form and silently drop
    # in-range points living there. The cost of the inclusive bound is
    # at most one extra candidate bucket per range, removed by the
    # residual predicate. Timestamps must be non-negative epochs (the
    # repo-wide truncate-vs-floor rule for pre-1970 values).
    rg = ranges.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.col(range_start).cast("long") / secs),
            F.floor(F.col(range_end).cast("long") / secs),
        ),
    )
    # stack-free: the bucket list is tiny (expansion ~2) and cheap to
    # build, so explode's inferred size()>0 filter only duplicates a
    # sequence() over two casts — harmless here, unlike the LSH case.
    rg = rg.select(
        *[F.col(c) for c in ranges.columns], F.explode("_buckets").alias("_bucket")
    )
    joined = pt.join(rg, on=[key, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(range_start)) & (F.col(point_ts) < F.col(range_end))
    )
    return joined.drop("_bucket")
