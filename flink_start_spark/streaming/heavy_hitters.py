"""Streaming heavy hitters (SpaceSaving) with bounded state — the
frequent-items monitor a corpus pipeline runs over an unbounded stream
(hot tokens, hot domains, hot event types) where exact per-item counts
would need unbounded state.

Metwally '05 SpaceSaving with ``capacity`` counters per key: an arriving
item already tracked increments its counter; a new item with room
inserts at error 0; otherwise it TAKES OVER the minimum counter
(est = min + c, err = min). Invariants maintained for every tracked
item: ``true <= est`` and ``est - err <= true``, with
``err <= n/capacity`` — so any item with true frequency above
``n/capacity`` is guaranteed present. State is O(capacity) per key
regardless of stream length or item cardinality.

Batch discipline (same family as streaming/count_trigger.py and
streaming/quantiles.py): each micro-batch collapses to per-item counts
first (one ``value_counts``), then applies one SpaceSaving step per
DISTINCT item — equivalent to running the sequential algorithm on the
batch reordered item-adjacent (SpaceSaving's guarantees are valid for
any arrival order, and totals at batch boundaries are order-free).
Distinct items apply in (count desc, item asc) order so the summary is
deterministic for a given batch decomposition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("item", T.StringType(), True),
        T.StructField("count_est", T.LongType(), False),
        T.StructField("err_bound", T.LongType(), False),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("rank", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType()), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
        T.StructField("errs", T.ArrayType(T.LongType()), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str,
    item_col: str,
    capacity: int = 64,
    k: int = 10,
) -> DataFrame:
    """Per-key running top-``k`` frequent items over a stream, tracked
    by a ``capacity``-counter SpaceSaving summary in
    ``applyInPandasWithState``. Emits one row per (key, rank<=k) per
    micro-batch with the estimate, its overestimate bound, and the
    exact total item count seen — ``count_est - err_bound`` is a
    certified lower bound on the item's true frequency. Null items are
    dropped (and excluded from ``n_seen``), matching the NaN policy of
    the sibling drift/quantiles operators — they are missing data, not
    a frequent item."""

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs, n_seen = state.get
            est = dict(zip(items, counts))
            err = dict(zip(items, errs))
        else:
            est, err, n_seen = {}, {}, 0
        for pdf in batches:
            # drop nulls BEFORE astype(str): object-NaN/None stringify
            # to literal 'nan'/'None' and would be tracked as phantom
            # heavy hitters (and inflate n_seen), diverging from the
            # batch twin's null-key handling — same rule as the NaN
            # filters in drift.py/quantiles.py
            vc = pdf[item_col].dropna().astype(str).value_counts()
            n_seen += int(vc.sum())
            # deterministic application order: biggest batch count
            # first, lexicographic item tie-break
            for item, c in sorted(vc.items(), key=lambda t: (-t[1], t[0])):
                c = int(c)
                if item in est:
                    est[item] += c
                elif len(est) < capacity:
                    est[item] = c
                    err[item] = 0
                else:
                    # take over the minimum counter (smallest est,
                    # lexicographic tie-break -> deterministic victim)
                    victim = min(est, key=lambda i: (est[i], i))
                    m = est.pop(victim)
                    err.pop(victim)
                    est[item] = m + c
                    err[item] = m
        ordered = sorted(est)
        state.update(
            ([i for i in ordered], [est[i] for i in ordered],
             [err[i] for i in ordered], n_seen)
        )
        if not est:
            return
        top = sorted(est.items(), key=lambda t: (-t[1], t[0]))[:k]
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "item": item,
                    "count_est": c,
                    "err_bound": err[item],
                    "n_seen": n_seen,
                    "rank": r + 1,
                }
                for r, (item, c) in enumerate(top)
            ]
        )

    # key cast to string: OUTPUT_SCHEMA declares a string key
    keyed = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"{item_col} AS {item_col}"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
