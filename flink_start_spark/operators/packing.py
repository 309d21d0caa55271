"""Per-document sequence-pack layout — an LLM-pretraining data-layout
operator (north-star extension; no reference counterpart, like the
rest of the §2b family).

Sequence packing is the standard pretraining step: documents are
concatenated into one token stream and sliced into fixed-size context
windows; each document needs to know which window(s) it lands in and at
what offset. The whole computation is an EXCLUSIVE PREFIX SUM of
per-document token counts under a deterministic total order — which at
scale must NOT be a global ``Window.orderBy`` (single-task sort). It
rides the same two-phase bucket-offset topology as the exact-selection
operators (operators/selection.py::with_rank_and_sum): per-bucket
partial sums, a bounded-histogram prefix fold, an in-bucket window —
no global sort task at any corpus size.

Deterministic sampling lives elsewhere: operators/text.py::
stratified_sample (salted md5 buckets + Horvitz-Thompson weights)
already covers the reproducible-sample primitive, so this module adds
none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_start_spark.operators import selection as S

__all__ = ["sequence_pack"]


def sequence_pack(
    df: DataFrame,
    id_col: str,
    len_col: str,
    window: int,
) -> DataFrame:
    """Concatenation-style sequence packing: documents are laid out in
    ``id_col`` order into one token stream sliced into ``window``-token
    contexts. Emits, per document: its token count, stream start
    offset, first pack id, offset within that pack, and the last pack
    id it reaches (> pack_id when the document spans a boundary — the
    standard pretraining semantics where documents may straddle
    contexts).

    ``id_col`` must be numeric and unique — it is both the layout order
    and the two-phase rank's bucketing key. To pack in pseudo-shuffled
    order instead, pass a precomputed unique numeric shuffle key.

    Scale shape: one two-phase running sum (3 scans of the slim
    (id, len) projection, no global sort task) + pure integer map
    arithmetic. Zero-length documents occupy no stream space: they pin
    to their start offset's pack with ``end_pack_id = pack_id``.
    """
    # only the running sum is consumed; requesting a rank would add an
    # unused row_number projection in the in-bucket window phase
    s = S.with_rank_and_sum(
        df.select(id_col, len_col), [], id_col, len_col, out_sum="_cum",
    )
    staged = s.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias("n_tokens"),
        (F.col("_cum") - F.col(len_col)).cast("long").alias("start_offset"),
    )
    # `div` (integral division), never `/` + floor: offsets at 100 TB
    # exceed double's exact range (same rule as stream_events' nanos).
    # Cross-engine note (measured, correcting the round-6 ADVICE):
    # Spark `div` AND DuckDB integer `//` BOTH truncate toward zero,
    # so the pair agrees on any sign — but both violate the repo's
    # floor-epoch convention on negatives. Irrelevant here: offsets
    # are running sums of non-negative lengths and n_tokens >= 1
    # inside the when-branch, so truncation == floor.
    return staged.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {window}").alias("pack_id"),
        (F.col("start_offset") % window).alias("offset_in_pack"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(start_offset + n_tokens - 1) div {window}"),
        )
        .otherwise(F.expr(f"start_offset div {window}"))
        .alias("end_pack_id"),
    )
