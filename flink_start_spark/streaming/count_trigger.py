"""Streaming count-triggered global window (SURVEY §2 O13).

The one reference operator with no Structured Streaming primitive:
Flink's ``GlobalWindows + CountTrigger.of(n)`` with FIRE-without-PURGE
(FlinkWindowLearning.scala:242-255) — emit the cumulative count of a
predicate at every n-th arrival.

Implemented with ``applyInPandasWithState``: a keyed stateful operator
holding two longs per key (arrivals seen, predicate hits). Each
micro-batch sorts its rows by the arrival column (cross-batch order is
the source's contract — file sequence here, log offset in production),
advances the counters with vectorized numpy cumulative sums (arrival
index + running hit count per row, modulo mask to pick fire rows — no
per-row Python loop), and emits one output row per n-th arrival
crossed. State is O(1) per key — exactly Flink's trigger
counter, none of the retained-elements buffer (the count is maintained
incrementally, which FIRE-no-PURGE forces Flink to recompute).

The batch twin (operators/windows.py::count_trigger_cumulative) is the
oracle-checked form; this streaming form is validated by pytest golden
tests on the 12-event fixture.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (key, fire_seq, arrival, cnt)
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("fire_seq", T.LongType(), False),
        T.StructField("arrival", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("n_hits", T.LongType(), False),
    ]
)


def count_trigger_stream(
    events: DataFrame,
    every: int,
    pred_col: str,
    pred_value: str,
    order_col: str = "arrival",
    key_col: str | None = None,
) -> DataFrame:
    """Streaming FIRE-no-PURGE count trigger over a (keyed) global window.

    ``key_col=None`` reproduces the reference's non-keyed ``windowAll``
    (a single logical key — like Flink, this serializes state updates
    through one task; keyed use is the scalable form).
    """
    if every < 1:
        # numpy `seen % 0` silently yields 0 (all-True fire mask) with
        # only a RuntimeWarning — fail the misconfiguration loudly
        # instead, like drift_stream's bin-count check
        raise ValueError(f"every must be >= 1, got {every}")
    key_expr = key_col if key_col is not None else "'__global__'"

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_seen, n_hits = state.get if state.exists else (0, 0)
        # materialize the micro-batch before sorting: the iterator
        # yields one pandas chunk per Arrow batch (maxRecordsPerBatch
        # rows), and chunk boundaries are shuffle-order, not
        # arrival-order — sorting per chunk would advance the counter
        # out of order whenever a key's rows span chunks. One key's
        # rows for one micro-batch is the same data the sort needs
        # resident anyway, so this adds no asymptotic state.
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            hits = (pdf[pred_col] == pred_value).to_numpy(dtype="int64")
            # vectorized trigger: arrival index + running hit count for
            # every row of the batch, then a modulo mask selects the
            # fire rows — no per-row Python iteration.
            seen = n_seen + np.arange(1, len(hits) + 1, dtype="int64")
            cum = n_hits + np.cumsum(hits)
            mask = seen % every == 0
            n_seen, n_hits = int(seen[-1]), int(cum[-1])
            if mask.any():
                yield pd.DataFrame(
                    {
                        "key": key[0],
                        "fire_seq": seen[mask] // every,
                        "arrival": seen[mask],
                        "cnt": cum[mask],
                    }
                )
        state.update((n_seen, n_hits))

    # key cast to string: OUTPUT_SCHEMA declares a string key
    keyed = events.selectExpr(
        f"CAST({key_expr} AS STRING) AS key",
        f"{order_col} AS {order_col}",
        f"{pred_col} AS {pred_col}",
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
