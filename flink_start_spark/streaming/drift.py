"""Streaming distribution-drift monitor — the Structured Streaming twin
of the batch PSI query (``plans/monitoring.py::feature_drift_psi``).

Production drift detection is inherently streaming: the reference
distribution is fixed (shipped with the model / computed at training
time), the CURRENT distribution accumulates as events arrive, and the
monitor should re-emit the drift score every micro-batch. State per key
is the fixed-bin histogram of everything seen so far — O(n_bins) longs
regardless of stream length, the same bounded-state discipline as
``streaming/quantiles.py`` and ``streaming/heavy_hitters.py``.

Each micro-batch is one ``np.bincount`` into the state histogram (no
per-row Python), then one closed-form PSI against the broadcast
reference proportions with the same Laplace smoothing (+1 per bin) as
the batch query — so as the stream drains a window, the emitted PSI
converges to exactly what the batch query reports for that window.
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
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("psi", T.DoubleType(), False),
    ]
)


def psi_from_counts(
    ref_counts: list[int], cur_counts: list[int], quant: int = 1 << 20
) -> float:
    """Laplace-smoothed PSI between two histograms, with the SAME
    integer quantization as the batch oracle (floor(x*2^20) per term,
    integer product, one final division) so a drained stream matches
    the batch query bit-for-bit."""
    import math

    n_bins = len(ref_counts)
    tot_r = sum(ref_counts) + n_bins
    tot_c = sum(cur_counts) + n_bins
    acc = 0
    for r, c in zip(ref_counts, cur_counts):
        p = (r + 1) / tot_r
        q = (c + 1) / tot_c
        dp = math.floor((p - q) * quant)
        dl = math.floor((math.log(p) - math.log(q)) * quant)
        acc += dp * dl
    return round(acc / quant / quant, 6)


def drift_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    ref_counts_by_key: dict[str, list[int]],
    lo: float = 0.0,
    hi: float = 600.0,
    n_bins: int = 8,
) -> DataFrame:
    """Per-key running PSI of the stream's value distribution against a
    fixed per-key reference histogram. ``ref_counts_by_key`` is the
    training-time artifact (a tiny dict, captured into the executors
    like a broadcast variable); keys absent from it fall back to a
    uniform reference (all-zero counts = pure smoothing), so new
    categories still monitor rather than crash."""
    width = (hi - lo) / n_bins
    if width <= 0:
        # an assert would be stripped under `python -O` and the stream
        # would divide by a non-positive width for its whole lifetime —
        # fail the misconfiguration loudly, like the bin-count check
        raise ValueError(f"hi must exceed lo: got lo={lo}, hi={hi}")
    # the operator casts stream keys to STRING (the output schema's key
    # type), so a reference dict keyed by raw ints/floats — the natural
    # shape for an int key column — would miss on EVERY lookup and
    # silently score all keys against the uniform fallback. Coerce keys
    # through str() (matching Spark's string cast for int/float keys)
    # and refuse collisions rather than pick a winner.
    coerced: dict[str, list[int]] = {}
    for k, v in ref_counts_by_key.items():
        ks = str(k)
        if ks in coerced:
            raise ValueError(
                f"reference keys collide after string coercion: {ks!r}"
            )
        coerced[ks] = v
    ref_counts_by_key = coerced
    bad = {k: len(v) for k, v in ref_counts_by_key.items() if len(v) != n_bins}
    if bad:
        # a mismatched reference would silently zip-truncate against the
        # n_bins current histogram and emit a plausible-but-wrong PSI
        # for the lifetime of the stream — fail the misconfiguration now
        raise ValueError(
            f"reference histograms must have n_bins={n_bins} bins; got {bad}"
        )
    state_schema = T.StructType(
        [T.StructField("counts", T.ArrayType(T.LongType()), False)]
    )

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (counts,) = state.get if state.exists else ([0] * n_bins,)
        counts = np.asarray(counts, dtype="int64")
        for pdf in batches:
            v = pdf[value_col].to_numpy(dtype="float64")
            # drop nulls BEFORE binning (NaN survives clip, casts to
            # INT64_MIN, and bincount raises — killing the whole
            # long-running query); mirrors the batch query's
            # `value IS NOT NULL` filter
            v = v[~np.isnan(v)]
            b = np.clip(
                np.floor((v - lo) / (hi - lo) * n_bins), 0, n_bins - 1
            ).astype("int64")
            counts += np.bincount(b, minlength=n_bins)
        state.update((counts.tolist(),))
        ref = ref_counts_by_key.get(key[0], [0] * n_bins)
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "n_seen": int(counts.sum()),
                    "psi": psi_from_counts(ref, counts.tolist()),
                }
            ]
        )

    # key cast to string: OUTPUT_SCHEMA declares a string key (and the
    # reference dict is keyed by strings) — stringify any key type here
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
