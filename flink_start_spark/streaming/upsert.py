"""Streaming keyed upsert (MERGE) sink — the streaming twin of the
batch CDC family in ``plans/cdc.py``.

The reference (mainul098/flink-start) declares JDBC/Cassandra sinks it
never exercises (build.sbt:21-23); keyed upsert is what those sinks are
FOR — maintain a latest-state-per-key table from an event stream. On
Spark, the portable form is ``foreachBatch`` + a deterministic merge:
each micro-batch is reduced to its latest row per key, merged against
the current store, and the store is atomically swapped (same
temp-sibling + rename discipline as ``operators/layout.py``).

Exactly-once: Structured Streaming may REPLAY a micro-batch after a
failure (foreachBatch is at-least-once). The merge is idempotent by
construction — ``max(struct(order_cols…, payload))`` per key over
(store ∪ batch) gives the same result no matter how many times a batch
is applied — so replays converge instead of duplicating; that is the
standard foreachBatch MERGE recipe (the Delta `MERGE INTO` pattern,
minus the table format).

Scale shape: the per-batch reduce is one map-side-combined groupBy of
the MICRO-BATCH (small by definition); the merge joins store ∪ batch
grouped on the unbounded key — at warehouse scale the store side would
be a bucketed table so the merge shuffles only the batch (or a real
table format's MERGE); here the full-rewrite store is the portable
test/sandbox form and says so.
"""

from __future__ import annotations

import glob as _glob
import os as _os
import shutil as _shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["latest_per_key", "upsert_parquet_sink"]


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Reduce to one row per key: the row with the greatest
    ``order_cols`` tuple (ties impossible when the tuple ends in a
    unique column — pass one, e.g. an event id). Pure aggregate
    (max of struct) — no window, no sort, map-side combinable."""
    payload = [c for c in df.columns if c not in key_cols]
    m = F.max(
        F.struct(*[F.col(c) for c in order_cols],
                 F.struct(*[F.col(c) for c in payload]).alias("_p"))
    ).alias("_m")
    out = df.groupBy(*key_cols).agg(m)
    return out.select(
        *key_cols, *[F.col(f"_m._p.{c}").alias(c) for c in payload]
    )


def upsert_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
    order_cols: list[str],
):
    """Start an availableNow foreachBatch query that maintains a
    latest-row-per-key parquet store at ``path``. Returns the started
    StreamingQuery (caller awaits termination)."""
    spark = stream_df.sparkSession

    def _merge(batch: DataFrame, batch_id: int) -> None:
        old = path.rstrip("/") + "._upsert_old"
        # crash recovery: a failure between the two swap renames leaves
        # the store only under ._upsert_old — restore it BEFORE reading,
        # or the merge would silently restart from an empty store
        if not _os.path.exists(path) and _os.path.exists(old):
            _os.rename(old, path)
        upd = latest_per_key(batch, key_cols, order_cols)
        if _os.path.exists(path) and _glob.glob(_os.path.join(path, "part-*")):
            cur = spark.read.parquet(path).select(*upd.columns)
            merged = latest_per_key(
                cur.unionByName(upd), key_cols, order_cols
            )
        else:
            merged = upd
        tmp = path.rstrip("/") + "._upsert_tmp"
        for stale in (tmp, old):
            if _os.path.exists(stale):
                _shutil.rmtree(stale)
        merged.write.mode("overwrite").parquet(tmp)
        if _os.path.exists(path):
            _os.rename(path, old)
        _os.rename(tmp, path)
        if _os.path.exists(old):
            _shutil.rmtree(old)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
