"""Lakehouse change-data family: SCD2 history build, snapshot-diff
changeset, and iterative graph analytics (PageRank).

Reference parity note: the reference (mainul098/flink-start) is a
stateless-to-windowed DataStream job (FlinkWindowLearning.scala) with no
dimension-history, CDC, or graph surface; these are the operations a
warehouse/lakehouse user expects next to the SQL surface (SCD type-2 is
the standard Kimball dimension-history build; the changeset op is the
batch twin of a CDC `MERGE`; PageRank completes the iterative-graph
family the dedup connected-components loop started).

All three are hash-exact oracle-paired — including PageRank, whose five
iterations are expressed in the oracle as five unrolled CTEs over exact
integer arithmetic (see ``operators/graph.py`` for the fixed-point
determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_start_spark.operators.graph import SCALE, copurchase_edges, pagerank
from flink_start_spark.plans.catalog import _register
from flink_start_spark.sources.catalog import load_table


@_register(
    "scd2_order_status_history",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    chg AS (
      SELECT * FROM ordered WHERE prev IS NULL OR o_orderstatus <> prev)
    SELECT o_custkey AS custkey,
           o_orderstatus AS status,
           floor(epoch(o_orderdate))::BIGINT AS valid_from,
           floor(epoch(lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))::BIGINT
             AS valid_to,
           (lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL)
             AS is_current
    FROM chg
    """,
    description=(
        "SCD type-2 dimension-history build (Kimball): per customer, "
        "collapse the order-status stream into change intervals — a row "
        "per status CHANGE with [valid_from, valid_to) bounds and an "
        "is_current flag (open interval ⇒ NULL valid_to). Change "
        "detection is lag(), interval close is lead(), both over the "
        "SAME (custkey)-partitioned sort — one shuffle, one sort, both "
        "windows reuse it. The partition key is the customer key "
        "(unbounded cardinality), so no hot-key funnel at any scale; "
        "ties inside a day break on the order key, making the history "
        "a total order and the output engine-exact."
    ),
    tags=("sql", "cdc", "window-frame"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scd2_history(spark, sf_dir)


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SCD2 build (used by the history query and the time-travel
    snapshot below)."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = o.withColumn("prev", F.lag("o_orderstatus").over(w)).filter(
        F.col("prev").isNull() | (F.col("o_orderstatus") != F.col("prev"))
    )
    nxt = F.lead("o_orderdate").over(w)
    return chg.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").cast("long").alias("valid_from"),
        nxt.cast("long").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


#: time-travel point for scd2_snapshot_at (mid-range of the 1995-2001
#: order span; epoch seconds for 1998-01-01T00:00:00Z)
_ASOF_EPOCH = 883612800


@_register(
    "scd2_snapshot_at",
    f"""
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    chg AS (
      SELECT * FROM ordered WHERE prev IS NULL OR o_orderstatus <> prev),
    hist AS (
      SELECT o_custkey,
             o_orderstatus AS status,
             floor(epoch(o_orderdate))::BIGINT AS valid_from,
             floor(epoch(lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))::BIGINT
               AS valid_to
      FROM chg)
    SELECT status, count(*) AS n_customers
    FROM hist
    WHERE valid_from <= {_ASOF_EPOCH}
      AND (valid_to IS NULL OR valid_to > {_ASOF_EPOCH})
    GROUP BY status
    """,
    description=(
        "Time travel over the SCD2 dimension: reconstruct the customer-"
        "status directory AS OF 1998-01-01 by slicing the change "
        "intervals ([valid_from, valid_to) containing the instant — the "
        "query a lakehouse answers from a snapshot, answered here from "
        "the history table. Per customer exactly one interval can "
        "contain the instant (intervals partition the timeline), so the "
        "rollup is a plain filter + groupBy on top of the history "
        "build's single shuffle."
    ),
    tags=("sql", "cdc", "window-frame"),
)
def q_scd2_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _scd2_history(spark, sf_dir)
    return (
        hist.filter(
            (F.col("valid_from") <= F.lit(_ASOF_EPOCH))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(_ASOF_EPOCH)))
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_V1 = ("2024-01-01 00:00:00", "2024-01-16 00:00:00")
_V2 = ("2024-01-16 00:00:00", "2024-02-01 00:00:00")


def _profile(ev: DataFrame, lo: str, hi: str) -> DataFrame:
    """Per-user activity profile over one snapshot window: event count
    plus an order-independent DECIMAL value sum (the two fields whose
    drift defines an 'update')."""
    return (
        ev.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("v"),
        )
    )


@_register(
    "snapshot_diff_changeset",
    f"""
    WITH a AS (
      SELECT user_id, count(*) AS n,
             round(sum(CAST(value AS DECIMAL(20,6))), 2)::DOUBLE AS v
      FROM events
      WHERE ts >= TIMESTAMP '{_V1[0]}' AND ts < TIMESTAMP '{_V1[1]}'
      GROUP BY user_id),
    b AS (
      SELECT user_id, count(*) AS n,
             round(sum(CAST(value AS DECIMAL(20,6))), 2)::DOUBLE AS v
      FROM events
      WHERE ts >= TIMESTAMP '{_V2[0]}' AND ts < TIMESTAMP '{_V2[1]}'
      GROUP BY user_id)
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           CASE WHEN a.user_id IS NULL THEN 'insert'
                WHEN b.user_id IS NULL THEN 'delete'
                WHEN a.n <> b.n OR a.v <> b.v THEN 'update'
                ELSE 'unchanged' END AS action,
           a.n AS old_n, b.n AS new_n,
           a.v AS old_value, b.v AS new_value
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    description=(
        "CDC changeset between two snapshot builds (the diff a MERGE "
        "INTO would apply): the per-user activity-profile dimension is "
        "built at two consecutive windows, full-outer-joined on the "
        "user key, and each row classified insert / delete / update / "
        "unchanged. Both snapshot aggregations collapse map-side; the "
        "one full-outer shuffle is on the unbounded user key. Profile "
        "equality compares an exact DECIMAL sum, so 'unchanged' is a "
        "real byte-stable claim, not a float coincidence."
    ),
    tags=("sql", "cdc", "join"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    a = _profile(ev, *_V1).alias("a")
    b = _profile(ev, *_V2).alias("b")
    j = a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full")
    return j.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        F.when(F.col("a.user_id").isNull(), F.lit("insert"))
        .when(F.col("b.user_id").isNull(), F.lit("delete"))
        .when(
            (F.col("a.n") != F.col("b.n")) | (F.col("a.v") != F.col("b.v")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("action"),
        F.col("a.n").alias("old_n"),
        F.col("b.n").alias("new_n"),
        F.col("a.v").alias("old_value"),
        F.col("b.v").alias("new_value"),
    )


def _pagerank_oracle(n_iter: int) -> str:
    """Unrolled n_iter-step integer PageRank as DuckDB CTEs — the same
    exact fixed-point arithmetic as operators/graph.py, so the final
    scaled ranks hash-match bit-for-bit. ``//`` is DuckDB integral
    division (= Spark's ``div`` on ANY sign — both truncate toward
    zero; ranks here are positive anyway); every sum is an
    integer sum cast back to BIGINT (DuckDB widens to HUGEINT)."""
    base = 15 * SCALE // 100
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(
            f"""r{k} AS (
      SELECT n.id, ({base} + (85 * COALESCE(s.c, 0)) // 100)::BIGINT AS rank
      FROM n LEFT JOIN (
        SELECT e.dst AS id, sum(r.rank // d.outdeg)::BIGINT AS c
        FROM e JOIN r{k-1} r ON r.id = e.src JOIN deg d ON d.src = e.src
        GROUP BY e.dst) s ON s.id = n.id)"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
    e AS (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM li a JOIN li b ON a.ok = b.ok AND a.item <> b.item),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    n AS (SELECT src AS id FROM deg),
    r0 AS (SELECT id, {SCALE}::BIGINT AS rank FROM n),
    {chain}
    SELECT id AS part_id, rank AS rank_scaled FROM r{n_iter}
    """


@_register(
    "pagerank_copurchase",
    _pagerank_oracle(5),
    description=(
        "Five iterations of damped PageRank over the part co-purchase "
        "graph (parts sharing an order), in exact fixed-point integer "
        "arithmetic — the iterative-graph twin of the dedup connected-"
        "components loop, and the rare case of an iterative algorithm "
        "with a full hash-exact SQL oracle (five unrolled CTEs). Edge "
        "build is an order-key self-join whose fan-out is bounded by "
        "lines-per-order squared (a data-model constant); each round "
        "is one edge⋈rank join + one map-side-combined groupBy(dst), "
        "with the static edge⋈degree relation checkpointed once. "
        "Driver-controlled rounds, localCheckpoint lineage cuts, no "
        "collect() — same discipline as k-means/BPE/components."
    ),
    tags=("graph", "iterative", "extension"),
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # co-purchase edges are symmetric → every node receives; the
    # per-round node left-join is skippable (operators/graph.py)
    ranks = pagerank(copurchase_edges(li), n_iter=5, all_nodes_receive=True)
    return ranks.select(
        F.col("id").alias("part_id"), F.col("rank").alias("rank_scaled")
    )
