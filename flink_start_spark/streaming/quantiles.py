"""Streaming quantiles with bounded state — the Structured Streaming
twin of the batch two-phase selection (operators/selection.py).

The batch operator gets EXACT ranks because it can rescan the target
bucket; a stream cannot rescan, so the streaming form keeps the SAME
fixed value-bucket histogram as permanent per-key state (O(n_buckets)
longs, independent of stream length) and answers each quantile with
the bucket that contains the exact rank — a guaranteed enclosing
interval ``[q_lo, q_hi)`` of width ``(hi-lo)/n_buckets``, plus its
midpoint as the point estimate. Tighten by raising ``n_buckets``; the
guarantee (the true rank-``ceil(p*n)`` value lies in the emitted
bucket, modulo range clamping) never degrades with stream length,
unlike sampling sketches.

Same vectorized-batch discipline as streaming/count_trigger.py: each
micro-batch is one ``np.bincount`` into the state histogram — no
per-row Python. Keyed state scales across executors; the watermark is
irrelevant (running all-time quantiles, state already bounded).
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
        T.StructField("prob", T.DoubleType(), False),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("q_lo", T.DoubleType(), False),
        T.StructField("q_hi", T.DoubleType(), False),
        T.StructField("q_mid", T.DoubleType(), False),
    ]
)


def quantile_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5,),
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-key running quantiles over a stream; emits one row per
    (key, prob) per micro-batch with the enclosing bucket of the exact
    lower-quantile rank ``max(1, ceil(p * n_seen))``. Values are
    clamped into ``[lo, hi)`` (same monotone bucket rule as the batch
    helper's range buckets — clamping only widens the interval for
    mass outside the declared range)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    width = (hi - lo) / n_buckets
    if width <= 0:
        # an inverted range would clip every value into bucket 0 and
        # emit inverted (q_hi < q_lo) quantiles for the stream's whole
        # lifetime — fail the misconfiguration loudly, exactly like
        # drift_stream's identical binning-range check
        raise ValueError(f"hi must exceed lo: got lo={lo}, hi={hi}")
    state_schema = T.StructType(
        [T.StructField("counts", T.ArrayType(T.LongType()), False)]
    )
    plist = [float(p) for p in probs]

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (counts,) = state.get if state.exists else ([0] * n_buckets,)
        counts = np.asarray(counts, dtype="int64")
        for pdf in batches:
            v = pdf[value_col].to_numpy(dtype="float64")
            # drop nulls BEFORE binning: NaN survives clip, casts to
            # INT64_MIN, and bincount raises — killing the whole
            # long-running query (same guard as streaming/drift.py)
            v = v[~np.isnan(v)]
            b = np.clip(
                np.floor((v - lo) / (hi - lo) * n_buckets), 0, n_buckets - 1
            ).astype("int64")
            counts += np.bincount(b, minlength=n_buckets)
        state.update((counts.tolist(),))
        n = int(counts.sum())
        if n == 0:
            return
        cum = np.cumsum(counts)
        rows = []
        for p in plist:
            r = max(1, int(np.ceil(p * n)))
            bkt = int(np.searchsorted(cum, r, side="left"))
            rows.append(
                {
                    "key": key[0],
                    "prob": p,
                    "n_seen": n,
                    "q_lo": lo + bkt * width,
                    "q_hi": lo + (bkt + 1) * width,
                    "q_mid": lo + (bkt + 0.5) * width,
                }
            )
        yield pd.DataFrame(rows)

    # key cast to string: OUTPUT_SCHEMA declares a string key, so a
    # bigint/other key column must be stringified here or the first
    # micro-batch dies at Arrow conversion
    keyed = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"{value_col} AS {value_col}"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
