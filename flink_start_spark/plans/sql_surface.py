"""General SQL surface over the TPC-H-ish tables (SURVEY §7 step 7).

The reference implements none of these (SURVEY §2 "categories with NO
reference implementation": joins, sorts/top-k, set ops, grouping sets,
ranking/analytic functions, scalar function library). The engine gets
them from Spark SQL / Catalyst; declaring them as catalog queries widens
the oracle-verified surface and exercises the physical plans that matter
at 100 TB:

- multi-way joins with **broadcast hints** on dimension tables (region/
  nation/supplier are tiny at any scale factor — a shuffle join there
  would be the classic 100 TB mistake);
- partial aggregation before shuffles (Catalyst default);
- deterministic top-k: rank on rounded measures with a unique tie-break
  key so Spark and DuckDB agree bit-for-bit;
- rollup grouping sets, set operations, analytic window functions,
  sessionization via lag(), and the semi-structured JSON path
  (``events.props``).

Float convention (see plans/catalog.py): money sums rounded to 2
decimals, ratios/averages to 6, on BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_start_spark.plans.catalog import _register, money_sum
from flink_start_spark.sources.catalog import load_table


# ---------------------------------------------------------------------
# Aggregation / scan shape
# ---------------------------------------------------------------------

@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2)::DOUBLE AS sum_qty,
           round(sum(CAST(l_extendedprice AS DECIMAL(20,6))), 2)::DOUBLE AS sum_base_price,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS sum_disc_price,
           round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(20,6))), 2)::DOUBLE AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description=(
        "TPC-H Q1-style pricing summary: scan-heavy groupBy with 8 "
        "aggregates. Catalyst pushes the l_shipdate filter to the parquet "
        "scan and plans partial+final HashAggregate — the shuffle carries "
        "only |groups| rows per partition."
    ),
    tags=("sql", "aggregation"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), "sum_qty"),
            money_sum(F.col("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "forecast_revenue_change",
    """
    SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(20,6))), 2)::DOUBLE AS potential_revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    description=(
        "TPC-H Q6 shape: pure filter + global aggregate. The whole "
        "WHERE clause must reach the parquet scan as PushedFilters — "
        "the query that shows pushdown pays at 100 TB (scan-bound, zero "
        "shuffle beyond the final reduce)."
    ),
    tags=("sql", "filter", "pushdown"),
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * F.col("l_discount"), "potential_revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "promo_revenue_share",
    """
    SELECT (year(o.o_orderdate) * 100 + month(o.o_orderdate))::BIGINT AS order_month,
           -- NULLIF: a month whose lines are all full-discount/zero-
           -- price has denominator 0 — share is NULL, not a crash
           -- (Spark ANSI raises on /0.0) nor inf
           round(100.0 * (sum(CAST(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                                  AS DECIMAL(20,6)))::DOUBLE)
                 / nullif(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6)))::DOUBLE, 0.0),
                 6) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    description=(
        "TPC-H Q14 shape: promo revenue share per month — conditional "
        "ratio aggregate over a fact-to-dimension join (part broadcast)."
    ),
    tags=("sql", "join", "aggregation"),
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("order_month")
        )
        .agg(
            # zero-denominator month (all lines full-discount/zero
            # price) -> NULL share; ANSI mode would raise on /0.0
            # (try_divide alone suffices: it yields NULL on a 0.0
            # divisor, mirroring the oracle's / NULLIF(den, 0.0))
            F.round(
                F.try_divide(
                    100.0
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev)
                        .otherwise(0.0)
                        .cast("decimal(20,6)")
                    ).cast("double"),
                    F.sum(rev.cast("decimal(20,6)")).cast("double"),
                ),
                6,
            ).alias("promo_share_pct")
        )
    )


@_register(
    "parts_above_brand_average",
    """
    SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice
    FROM part p
    WHERE p_retailprice > 1.05 * (
      SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
    description=(
        "Correlated scalar subquery: parts priced >5% above their "
        "brand's average. Catalyst decorrelates it into an aggregate + "
        "equi-join — never a per-row subquery execution."
    ),
    tags=("sql", "subquery"),
)
def q_parts_above_brand_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    # Correlated scalar subqueries need SQL text, which needs a view
    # name. Analysis is eager (the relation binds at spark.sql()), so
    # the view is dropped immediately. The name is unique PER CALL
    # (uuid), not per sf_dir: two concurrent builds of this same query
    # would otherwise share a name and one thread's finally-drop could
    # land between the other's create and spark.sql (and Python's str
    # hash is PYTHONHASHSEED-salted besides).
    import uuid

    view = f"_part_corr_{uuid.uuid4().hex}"
    p.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice
            FROM {view} p
            WHERE p_retailprice > 1.05 * (
              SELECT avg(p2.p_retailprice) FROM {view} p2 WHERE p2.p_brand = p.p_brand)
            """
        )
    finally:
        spark.catalog.dropTempView(view)


# ---------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------

@_register(
    "top_revenue_orders",
    """
    WITH rev AS (
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY 1, 2, 3
    )
    SELECT o_orderkey, revenue,
           -- floor, not cast-round: Spark's timestamp->long cast is
           -- floorDiv(micros, 1e6); on fractional-second order dates a
           -- bare epoch(..)::BIGINT rounds .5+ up and diverges
           floor(epoch(o_orderdate))::BIGINT AS orderdate_epoch, o_orderpriority
    FROM (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rk
      FROM rev
    ) WHERE rk <= 10
    """,
    description=(
        "TPC-H Q3-style shipping priority: 3-way join + agg + "
        "deterministic top-10 (rank on rounded revenue, orderkey "
        "tie-break). Customer filter is pushed below the join; at scale "
        "AQE converts the filtered-customer side to broadcast."
    ),
    tags=("sql", "join", "topk"),
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # no broadcast hint on the filtered customer side: it is still
    # ~1/5 of an SF-SCALED table, so a hard hint would force a
    # multi-GB broadcast at high SF — AQE converts it to broadcast
    # exactly when its runtime size qualifies (the description's
    # contract)
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )
    # Deterministic global top-10 WITHOUT a global sort: (revenue desc,
    # orderkey) is a total order, so orderBy().limit() — planned as
    # TakeOrderedAndProject, per-partition top-k then a k*P driver-side
    # merge — returns exactly the rows a row_number() filter would.
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)
    return top.select(
        "o_orderkey",
        "revenue",
        F.col("o_orderdate").cast("long").alias("orderdate_epoch"),
        "o_orderpriority",
    )


@_register(
    "regional_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    GROUP BY 1, 2
    """,
    description=(
        "TPC-H Q5-style local-supplier revenue: 6-way join across the "
        "full star schema; region/nation broadcast (fixed 5/25 rows at "
        "any SF); supplier is SF-scaled so it carries no hint — AQE "
        "broadcasts it while small and shuffles it at 100 TB."
    ),
    tags=("sql", "join"),
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, "region", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    # region/nation are FIXED-SIZE dimensions (25/5 rows at any SF) —
    # hard broadcast is safe and removes their shuffles. supplier is
    # SF-SCALED (tpch.py's own rule: part/supplier/customer shuffle),
    # so no hint — AQE broadcasts it while small, shuffles it at scale.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@_register(
    "orders_without_lineitems",
    """
    SELECT o.o_orderkey, o.o_orderstatus, round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    description=(
        "Anti-join (NOT EXISTS): orders with no line items. Plans as a "
        "LeftAnti hash join on the lineitem keys; at scale the distinct "
        "orderkey side shuffles, the probe streams."
    ),
    tags=("sql", "join"),
)
def q_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# ---------------------------------------------------------------------
# Grouping sets / set ops / analytic functions
# ---------------------------------------------------------------------

@_register(
    "order_priority_rollup",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
           coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
           count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2)::DOUBLE AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    description=(
        "ROLLUP grouping sets over orders (status, priority) with "
        "subtotals and a grand total. Spark expands grouping sets before "
        "the shuffle; NULL grouping markers normalized to 'ALL' on both "
        "engines so the hash comparison is well-defined."
    ),
    tags=("sql", "aggregation"),
)
def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice"), "total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@_register(
    "status_priority_cube",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
           coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
           grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS grp_id,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description=(
        "CUBE grouping sets with grouping() markers: all 4 combinations "
        "of (status, priority) subtotals in one pass (Expand before the "
        "shuffle)."
    ),
    tags=("sql", "aggregation"),
)
def q_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias(
                "grp_id"
            ),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.col("grp_id").cast("long"),
            "n_orders",
        )
    )


@_register(
    "embedding_array_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 6) AS linf_norm,
           round(list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END))
                 / len(embedding), 6) AS frac_positive,
           round(list_sum(list_transform(list_slice(embedding, 1, 8), x -> x::DOUBLE)), 6)
             AS head_sum
    FROM embeddings
    """,
    description=(
        "Array function library over vectors: size, element-wise "
        "transform/aggregate (L-inf norm, positive fraction), slice — "
        "the general array surface, all codegen'd."
    ),
    tags=("sql", "array", "scalar"),
)
def q_embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    e = F.col("embedding")
    dbl = lambda c: c.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(e).cast("long").alias("dim"),
        F.round(
            F.array_max(F.transform(e, lambda x: F.abs(dbl(x)))), 6
        ).alias("linf_norm"),
        F.round(
            F.aggregate(
                e, F.lit(0.0), lambda acc, x: acc + F.when(x > 0, 1.0).otherwise(0.0)
            )
            / F.size(e),
            6,
        ).alias("frac_positive"),
        F.round(
            F.aggregate(F.slice(e, 1, 8), F.lit(0.0), lambda acc, x: acc + dbl(x)), 6
        ).alias("head_sum"),
    )


@_register(
    "engaged_users_except_errors",
    """
    (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
     INTERSECT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING count(*) > 10
    """,
    description=(
        "Set operations: users who both signed up and purchased, minus "
        "heavy error-ers (>10 error events). INTERSECT/EXCEPT plan as "
        "left-semi/left-anti joins after aggregation."
    ),
    tags=("sql", "setops"),
)
def q_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    signup = ev.filter(F.col("event_type") == "signup").select("user_id")
    heavy_err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 10)
        .select("user_id")
    )
    return purch.intersect(signup).exceptAll(heavy_err)


@_register(
    "top_customers_per_nation",
    """
    SELECT n_name AS nation, c_name, round(c_acctbal, 2) AS acctbal, rk
    FROM (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             row_number() OVER (
               PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey
             ) AS rk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rk <= 3
    """,
    description=(
        "Top-K per group: 3 highest-balance customers per nation via "
        "row_number() window (deterministic tie-break on custkey). The "
        "canonical 'rank within partition' analytic pattern."
    ),
    tags=("sql", "analytic", "topk"),
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rk",
        )
    )


@_register(
    "user_session_stats",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                       > 86400000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           sum(new_session)::BIGINT AS n_sessions,
           count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    description=(
        "Sessionization via lag(): a session break is a >24h gap between "
        "a user's consecutive events. lag + conditional sum — the "
        "standard batch sessionize; the streaming twin is "
        "session_window() (see streaming module)."
    ),
    tags=("sql", "analytic", "sessionization"),
)
def q_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROsecond gap (unix_micros / epoch_us on both engines): a
    # whole-second cast would floor the gap and miss breaks in
    # (24h, 24h+1s) that the full-precision oracle counts — the ts
    # column carries microsecond fractions
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        ev.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 24 * 3600 * 1_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------
# Scalar-function library / semi-structured
# ---------------------------------------------------------------------

@_register(
    "props_json_metrics",
    """
    SELECT event_type,
           round(avg(CAST((CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) AS DOUBLE)), 6) AS avg_k,
           max(CAST((CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) AS BIGINT)) AS max_k,
           count(*) AS n
    FROM events
    WHERE (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) IS NOT NULL
    GROUP BY event_type
    """,
    description=(
        "Semi-structured path: extract $.k from the JSON props column and "
        "aggregate per event type (get_json_object — JVM-side, no Python). "
        "The multimodal/props pattern from SURVEY §2b."
    ),
    tags=("sql", "json"),
)
def q_props_json_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k")
    return (
        ev.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.avg(k.cast("double")), 6).alias("avg_k"),
            F.max(k.cast("long")).alias("max_k"),
            F.count("*").alias("n"),
        )
    )


@_register(
    "scalar_function_showcase",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           abs(p_size - 25) AS size_dev,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(ln(p_retailprice + 1), 6) AS price_ln,
           CASE WHEN p_size >= 30 THEN 'large'
                WHEN p_size >= 15 THEN 'medium'
                ELSE 'small' END AS size_class
    FROM part
    WHERE p_retailprice > 0
    """,
    description=(
        "Scalar function library (string/math/conditional) — all "
        "codegen'd JVM expressions, zero UDFs. The reference's only "
        "scalar work is an ISO-8601 parse + regex extract (O2/O4); this "
        "declares the general library Spark provides."
    ),
    tags=("sql", "scalar"),
)
def q_scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.filter(F.col("p_retailprice") > 0).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
        F.when(F.col("p_size") >= 30, "large")
        .when(F.col("p_size") >= 15, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@_register(
    "monthly_order_stats",
    """
    SELECT (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS order_month,
           o_orderstatus,
           count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2)::DOUBLE AS total_price,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price
    FROM orders
    GROUP BY 1, 2
    """,
    description=(
        "Date functions + exact median: per-month order stats. Spark "
        "median() and DuckDB quantile_cont(0.5) both compute the exact "
        "continuous median. Month key emitted as yyyymm BIGINT (timezone-"
        "proof)."
    ),
    tags=("sql", "date", "aggregation"),
)
def q_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("order_month"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice"), "total_price"),
            F.round(F.median("o_totalprice"), 6).alias("median_price"),
        )
    )


@_register(
    "part_size_distribution",
    """
    SELECT p_brand,
           count(*) AS n_parts,
           count(CASE WHEN p_size < 15 THEN 1 END) AS small_cnt,
           count(CASE WHEN p_size >= 15 AND p_size < 30 THEN 1 END) AS medium_cnt,
           count(CASE WHEN p_size >= 30 THEN 1 END) AS large_cnt,
           min(p_size) AS min_size, max(p_size) AS max_size
    FROM part GROUP BY p_brand
    """,
    description=(
        "Pivot-style conditional aggregation (the shuffle-free way to "
        "pivot a low-cardinality column) + min/max."
    ),
    tags=("sql", "aggregation"),
)
def q_part_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.count(F.when(F.col("p_size") < 15, 1)).alias("small_cnt"),
        F.count(F.when((F.col("p_size") >= 15) & (F.col("p_size") < 30), 1)).alias(
            "medium_cnt"
        ),
        F.count(F.when(F.col("p_size") >= 30, 1)).alias("large_cnt"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


@_register(
    "supplier_part_enumeration",
    """
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_lines,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_suppkey
    """,
    description=(
        "Exact distinct-count per key. Spark plans count(distinct) as a "
        "two-phase expand+aggregate; at 100 TB prefer "
        "approx_count_distinct when ±2% is acceptable (declared in the "
        "text-analysis module as a rows-only query since HLL sketches "
        "differ across engines)."
    ),
    tags=("sql", "aggregation"),
)
def q_supplier_part_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


@_register(
    "customer_order_distribution",
    """
    WITH co AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT c_count::BIGINT AS c_count, count(*)::BIGINT AS custdist
    FROM co GROUP BY c_count
    """,
    description=(
        "TPC-H Q13 shape: per-customer order counts (left join keeps "
        "zero-order customers) re-aggregated into a distribution "
        "histogram. Two aggregations; the first's groupBy key is the "
        "join key, so AQE plans join + count without an extra exchange "
        "of the customer side; the histogram input is one row per "
        "customer - tiny at any scale."
    ),
    tags=("sql", "join", "aggregation"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    co = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_register(
    "large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    SELECT o.o_orderkey, o.o_custkey,
           floor(epoch(o.o_orderdate))::BIGINT AS orderdate_epoch,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
    """,
    description=(
        "TPC-H Q18 shape (large-volume orders): HAVING over a grouped "
        "sum selects the heavy orders, then a semi-join-shaped filter "
        "back onto orders + lineitem re-aggregates their details. The "
        "HAVING aggregate collapses lineitem to one row per order "
        "map-side-first; both joins are orderkey-equi, so the whole "
        "query rides the same hash partitioning."
    ),
    tags=("sql", "join", "aggregation", "having"),
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select(F.col("l_orderkey").alias("_big_orderkey"))
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["_big_orderkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("long").alias("orderdate_epoch"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@_register(
    "fuzzy_customer_pairs",
    """
    WITH b AS (
      SELECT c_custkey, c_name, substr(c_name, 1, length(c_name) - 2) AS blk
      FROM customer)
    SELECT a.c_custkey AS custkey_a, c.c_custkey AS custkey_b,
           levenshtein(a.c_name, c.c_name)::BIGINT AS edit_distance
    FROM b a JOIN b c ON a.blk = c.blk AND a.c_custkey < c.c_custkey
    WHERE levenshtein(a.c_name, c.c_name) <= 1
    """,
    description=(
        "Entity resolution / fuzzy matching: near-identical customer "
        "names via a BLOCKED self-join (prefix block key) + edit-"
        "distance confirm - the standard record-linkage topology. The "
        "block key bounds each comparison group, so the join never "
        "goes all-pairs; Levenshtein runs only on within-block "
        "candidates. Same blocking discipline as every LSH family in "
        "operators/dedup.py, over strings instead of shingles."
    ),
    tags=("sql", "join", "entity-resolution"),
)
def q_fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    blocked = cust.withColumn(
        "blk", F.expr("substr(c_name, 1, length(c_name) - 2)")
    )
    a = blocked.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("_name_a"),
        "blk",
    )
    b = blocked.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("_name_b"),
        "blk",
    )
    # Thresholded levenshtein (Spark 3.5+) early-exits bands beyond
    # the bound: O(len * k) per pair instead of O(len^2), ~20x less
    # work on non-matching candidates. Returns -1 above the threshold
    # and the EXACT distance at or below it, so the kept pairs and
    # their emitted distances are identical to the unthresholded form
    # (and to the DuckDB oracle, which computes the full distance).
    tdist = F.levenshtein("_name_a", "_name_b", 1)
    return (
        a.join(b, "blk")
        .where(F.col("custkey_a") < F.col("custkey_b"))
        .where(tdist >= 0)
        .select(
            "custkey_a",
            "custkey_b",
            tdist.cast("bigint").alias("edit_distance"),
        )
    )


_PROFILE_COLS = [
    ("o_orderkey", True), ("o_custkey", True), ("o_totalprice", True),
    ("o_orderstatus", False), ("o_orderpriority", False), ("o_orderdate", False),
]


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        mn = f"round(min({c})::DOUBLE, 6)" if numeric else "NULL::DOUBLE"
        mx = f"round(max({c})::DOUBLE, 6)" if numeric else "NULL::DOUBLE"
        parts.append(
            f"SELECT '{c}' AS column_name, count(*)::BIGINT AS n_rows, "
            f"count_if({c} IS NULL)::BIGINT AS n_nulls, "
            f"count(DISTINCT {c})::BIGINT AS n_distinct, "
            f"{mn} AS min_value, {mx} AS max_value FROM orders"
        )
    return "\nUNION ALL ".join(parts)


@_register(
    "table_profile",
    _profile_oracle(),
    description=(
        "Column-level table profiling (the ANALYZE TABLE / data-catalog "
        "stats pass): per column of orders - row count, null count, "
        "exact distinct count, numeric min/max (rounded 6). One Spark "
        "job computes every column's metrics in a single multi-distinct "
        "aggregate then unpivots; at 100 TB swap the exact distincts "
        "for approx_count_distinct (declared rows-only elsewhere) - "
        "the plan shape is otherwise identical."
    ),
    tags=("sql", "aggregation", "profiling"),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "orders", sf_dir)
    aggs, stack_items = [], []
    for c, numeric in _PROFILE_COLS:
        aggs.append(F.count("*").alias(f"nr_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if numeric:
            aggs.append(F.round(F.min(F.col(c)).cast("double"), 6).alias(f"mn_{c}"))
            aggs.append(F.round(F.max(F.col(c)).cast("double"), 6).alias(f"mx_{c}"))
        mn = f"mn_{c}" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if numeric else "CAST(NULL AS DOUBLE)"
        stack_items.append(f"'{c}', nr_{c}, nn_{c}, nd_{c}, {mn}, {mx}")
    agg = li.agg(*aggs)
    return agg.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(stack_items)}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def global_sorted_leads(
    df: DataFrame,
    name_col: str,
    key_col: str,
    w: int = 3,
    n_partitions: int | None = None,
) -> DataFrame:
    """``lead(1..w-1)`` over the GLOBAL ``(name, key)`` order without a
    single-task sort — the scale-safe sorted-neighborhood pass.

    A bare ``Window.orderBy(...)`` plans Exchange SinglePartition +
    Sort: the whole corpus funnels through one task, the exact
    single-reducer hazard the plan-quality sweep bans. This helper gets
    identical output from three bounded pieces:

    1. ``repartitionByRange`` on the sort key (the scalable total-sort
       topology Spark's own ``orderBy`` uses) + ONE per-range window
       pass computing leads, row_number and range size. The pass is
       ``localCheckpoint``-ed: that pins the sampled range boundaries
       and ``spark_partition_id`` values so every downstream branch
       sees the SAME partitioning (re-execution would re-sample — the
       same determinism discipline as operators/graph.py's lineage
       cuts).
    2. A heads table: the first w-1 rows of every range, collected into
       ONE sorted array of (pid, name, key) structs — bounded by
       (w-1) x shuffle-partitions (cluster config, NOT corpus size;
       ~400 KB even at 100k partitions), the same bounded class as the
       allowlisted 1-row totals broadcasts.
    3. Tail patch: only the last w-1 rows of each range have incomplete
       in-range leads; they cross-join the 1-row heads array and fill
       the missing leads from ``slice(filter(heads, h -> h.pid > pid),
       1, w-1)`` — pure JVM array functions. Range partitioning
       guarantees every key in pid p+1 sorts after every key in pid p,
       and short/empty ranges are handled for free because the array
       holds ALL ranges' heads in global order.

    Returns one row per input row with ``k1/n1 .. k{w-1}/n{w-1}`` lead
    columns; trailing leads at the very end of the table are NULL,
    exactly like the single-task formulation.
    """
    nm, ky = F.col(name_col), F.col(key_col)
    if n_partitions is None:
        ranged = df.repartitionByRange(nm.asc(), ky.asc())
    else:  # explicit count: tests force 1-row/empty boundary ranges
        ranged = df.repartitionByRange(n_partitions, nm.asc(), ky.asc())
    base = ranged.withColumn("pid", F.spark_partition_id())
    pw = Window.partitionBy("pid").orderBy(nm.asc(), ky.asc())
    cols = [key_col, name_col, "pid"]
    for i in range(1, w):
        cols.append(F.lead(ky, i).over(pw).alias(f"k{i}"))
        cols.append(F.lead(nm, i).over(pw).alias(f"n{i}"))
    r = base.select(
        *cols,
        F.row_number().over(pw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("cnt"),
    ).localCheckpoint(eager=False)

    heads_arr = (
        r.where(F.col("rn") <= w - 1)
        .select(F.struct(F.col("pid"), nm, ky).alias("h"))
        .agg(F.sort_array(F.collect_list("h")).alias("heads"))
    )
    from_end = F.col("cnt") - F.col("rn")  # 0 = last row of its range
    out_cols = [key_col, name_col, "pid"] + [
        f"{p}{i}" for i in range(1, w) for p in ("k", "n")
    ]
    mains = r.where(from_end >= w - 1).select(*out_cols)
    patched = [F.col(key_col), F.col(name_col), F.col("pid")]
    for i in range(1, w):
        # lead i is intact in-range iff i <= from_end (that many rows
        # follow within the range); the missing TRAILING leads continue
        # into the heads array at 0-based offset i - 1 - from_end.
        # Gate on POSITION, not coalesce-on-NULL: a legitimately-NULL
        # name/key value in an intact lead must stay NULL, not be
        # papered over with the next range's head.
        in_range = F.lit(i) <= from_end
        take = F.get(F.col("succ"), F.lit(i - 1) - from_end)
        patched.append(
            F.when(in_range, F.col(f"k{i}")).otherwise(take[key_col]).alias(f"k{i}")
        )
        patched.append(
            F.when(in_range, F.col(f"n{i}")).otherwise(take[name_col]).alias(f"n{i}")
        )
    tails = (
        r.where(from_end < w - 1)
        .crossJoin(F.broadcast(heads_arr))
        .withColumn(
            "succ",
            F.slice(
                F.filter(F.col("heads"), lambda h: h["pid"] > F.col("pid")),
                1,
                w - 1,
            ),
        )
        .select(*patched)
    )
    # drop the internal partition-id: its values change with cluster
    # config and the documented contract is (key, name, k1/n1..) only
    return mains.unionByName(tails).drop("pid")


@_register(
    "sorted_neighborhood_pairs",
    """
    WITH r AS (
      SELECT c_custkey, c_name,
             lead(c_custkey, 1) OVER (ORDER BY c_name, c_custkey) AS k1,
             lead(c_name, 1)    OVER (ORDER BY c_name, c_custkey) AS n1,
             lead(c_custkey, 2) OVER (ORDER BY c_name, c_custkey) AS k2,
             lead(c_name, 2)    OVER (ORDER BY c_name, c_custkey) AS n2
      FROM customer)
    SELECT custkey_a, custkey_b, edit_distance FROM (
      SELECT c_custkey AS custkey_a, k1 AS custkey_b,
             levenshtein(c_name, n1)::BIGINT AS edit_distance
      FROM r WHERE k1 IS NOT NULL
      UNION ALL
      SELECT c_custkey, k2, levenshtein(c_name, n2)::BIGINT
      FROM r WHERE k2 IS NOT NULL)
    WHERE edit_distance <= 1
    """,
    description=(
        "Sorted-neighborhood record linkage (Hernandez '95) - the "
        "second classic blocking discipline next to fuzzy_customer_"
        "pairs' prefix blocking: sort by the match key, compare each "
        "row only to its w-1 successors (w=3), Levenshtein confirm. "
        "O(n*w) comparisons regardless of block sizes - robust where "
        "prefix blocks skew. The sort is range-partitioned with "
        "per-range lead() and a bounded heads-array boundary patch "
        "(global_sorted_leads) - NO single-task total sort; the oracle "
        "states the same semantics as one global window."
    ),
    tags=("sql", "join", "entity-resolution", "analytic"),
)
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    r = global_sorted_leads(cust, "c_name", "c_custkey", w=3)
    p1 = r.where(F.col("k1").isNotNull()).select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("k1").alias("custkey_b"),
        F.levenshtein("c_name", "n1", 1).alias("_d"),
    )
    p2 = r.where(F.col("k2").isNotNull()).select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("k2").alias("custkey_b"),
        F.levenshtein("c_name", "n2", 1).alias("_d"),
    )
    return (
        p1.unionAll(p2)
        .where(F.col("_d") >= 0)
        .select(
            "custkey_a", "custkey_b", F.col("_d").cast("bigint").alias("edit_distance")
        )
    )


@_register(
    "revenue_grouping_sets",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
           coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
           round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2)::DOUBLE AS revenue,
           count(*)::BIGINT AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    description=(
        "Explicit GROUPING SETS (the general form ROLLUP/CUBE sugar "
        "over): per-priority AND per-status revenue in ONE scan - "
        "Spark plans a single Expand + aggregate instead of a UNION of "
        "two scans, the multi-dimensional-report shape that halves "
        "scan cost at 100 TB. Coalesced labels keep the two grouping "
        "shapes distinguishable in a flat result."
    ),
    tags=("sql", "aggregation", "grouping-sets"),
)
def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame.groupingSets (Spark 4.0+) keeps this a pure plan build —
    # no createOrReplaceTempView mutating shared session catalog state
    # (two concurrent builds in one session would race on a fixed view
    # name).
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupingSets(
            [[F.col("o_orderpriority")], [F.col("o_orderstatus")]],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2
            ).alias("revenue_dec"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.col("revenue_dec").cast("double").alias("revenue"),
            "n_orders",
        )
    )
