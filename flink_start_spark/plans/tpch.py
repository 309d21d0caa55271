"""TPC-H completion family: the canonical ad-hoc OLAP shapes not yet
represented elsewhere in the catalog (Q8, Q9, Q10, Q15, Q17, Q19, Q21,
Q22 — adapted to this data model where a column is absent).

The reference (mainul098/flink-start, FlinkWindowLearning.scala) has no
join/subquery surface at all — SURVEY.md §2 lists these categories as
"NO reference implementation"; this module widens the engine's declared
SQL surface so a user gets the full decision-support suite over the
same star schema the other `sql`-tagged queries use. Q1/Q3/Q4/Q5/Q6/Q7/
Q13/Q14/Q18 shapes already exist (``sql_surface.py``, ``advanced.py``).

Adaptations forced by the test data model (documented per query):

- no ``partsupp`` table → Q2/Q11/Q16/Q20 are out of the data model
  (their core metric *is* partsupp's availqty/supplycost); Q9 drops the
  supplycost term from profit.
- no ``l_shipmode``/``l_commitdate``/``l_receiptdate`` → Q12 is out
  (Q4's late-shipment adaptation already covers the available
  semantics); Q21 defines "late" as shipped > 90 days after the order
  date.
- no ``c_phone`` → Q22 substitutes nation-key groups for phone country
  codes.

Scale notes common to the family: nation/region are O(10) rows at ANY
scale factor and always broadcast; part/supplier/customer grow with SF,
so joins against them shuffle on their keys and AQE picks broadcast when
a filter makes a side small. Money aggregates go through the
DECIMAL-before-sum discipline (`money_sum` docstring) so results are
partitioning-independent; ranking queries order on the EXACT decimal
aggregate with a key tie-break, so top-k sets are engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_start_spark import cache as C
from flink_start_spark.plans.catalog import _register, money_sum
from flink_start_spark.sources.catalog import load_table

def _rev():
    """Discounted line revenue; built lazily (Column exprs need an
    active session, and this module imports before any exists)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@_register(
    "nation_market_share",
    """
    SELECT year(o.o_orderdate)::BIGINT AS o_year,
           -- NULLIF: a year whose qualifying lines are all full-
           -- discount/zero-price sums to 0 revenue — NULL share, not
           -- a crash (Spark ANSI raises on /0.0) nor inf
           round(sum(CAST(CASE WHEN ns.n_name = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                          AS DECIMAL(20,6)))::DOUBLE
                 / nullif(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6)))::DOUBLE, 0.0),
                 6) AS mkt_share,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
                   AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    GROUP BY 1
    """,
    description=(
        "TPC-H Q8 (national market share): NATION_7's share of STANDARD-"
        "part revenue sold into ASIA, by order year. Two roles for the "
        "nation dimension (customer-side region filter, supplier-side "
        "share bucket) — both broadcast; the fact-side joins shuffle on "
        "their keys and AQE broadcasts the filtered part/order sides "
        "when selective. Share is a ratio of exact DECIMAL sums, rounded "
        "once."
    ),
    tags=("sql", "join", "tpch"),
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "STANDARD")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    nc = load_table(spark, "nation", sf_dir).alias("nc")
    ns = load_table(spark, "nation", sf_dir).alias("ns")
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns.n_nationkey"))
    )
    num = F.sum(
        F.when(F.col("ns.n_name") == "NATION_7", _rev())
        .otherwise(F.lit(0.0))
        .cast("decimal(20,6)")
    )
    den = F.sum(_rev().cast("decimal(20,6)"))
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        # zero-revenue year -> NULL share (ANSI /0.0 would raise;
        # try_divide alone yields NULL on a 0.0 divisor, mirroring
        # the oracle's / NULLIF(den, 0.0))
        F.round(
            F.try_divide(num.cast("double"), den.cast("double")),
            6,
        ).alias("mkt_share"),
        F.count("*").alias("n_lines"),
    )


@_register(
    "product_profit_by_nation",
    """
    SELECT ns.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    description=(
        "TPC-H Q9 shape (product-type profit), adapted: no partsupp "
        "table in the data model, so profit omits the supplycost term "
        "and is discounted revenue on '%gear%' parts, grouped by "
        "supplier nation and order year. The LIKE filter cannot be a "
        "parquet pushdown (infix match) but prunes before the join; "
        "nation broadcasts, the fact joins shuffle."
    ),
    tags=("sql", "join", "tpch"),
)
def q_product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, "supplier", sf_dir)
    ns = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == ns.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(money_sum(_rev(), "profit"))
    )


@_register(
    "returned_items_top_customers",
    """
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))) AS r
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
                     AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
                     AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
    )
    SELECT c_custkey, c_name, round(r, 2)::DOUBLE AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM (SELECT *, row_number() OVER (ORDER BY r DESC, c_custkey) AS rk FROM rev)
    WHERE rk <= 20
    """,
    description=(
        "TPC-H Q10 (returned-item ranking): top-20 customers by revenue "
        "lost to returns in one quarter. Top-k is orderBy().limit() — "
        "TakeOrderedAndProject (per-partition top-k + k*P driver merge), "
        "never a global sort; ordered on the EXACT decimal sum with "
        "custkey tie-break so the set is engine-identical."
    ),
    tags=("sql", "join", "topk", "tpch"),
)
def q_returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev().cast("decimal(20,6)")).alias("_r"))
    )
    top = rev.orderBy(F.col("_r").desc(), F.col("c_custkey")).limit(20)
    return top.select(
        "c_custkey",
        "c_name",
        F.round("_r", 2).cast("double").alias("revenue"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "n_name",
    )


@_register(
    "top_supplier_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, round(rev.r, 2)::DOUBLE AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = (SELECT max(r) FROM rev)
    """,
    description=(
        "TPC-H Q15 (top supplier): supplier(s) with the maximum 3-month "
        "revenue. The max is a 1-row aggregate equi-joined back "
        "(BroadcastHashJoin on the exact DECIMAL value — exact integer "
        "arithmetic, so the max matches bit-for-bit on any engine or "
        "partitioning; a float max here could tie-break differently). "
        "The winners relation (~1 row) broadcasts into the supplier "
        "dimension join, so the big supplier table never shuffles."
    ),
    tags=("sql", "join", "scalar-subquery", "tpch"),
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    rev = C.track(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev().cast("decimal(20,6)")).alias("_r"))
    )
    mx = rev.agg(F.max("_r").alias("_r"))
    winners = rev.join(F.broadcast(mx), "_r")
    return s.join(F.broadcast(winners), s.s_suppkey == winners.l_suppkey).select(
        "s_suppkey",
        "s_name",
        F.round("_r", 2).cast("double").alias("total_revenue"),
    )


@_register(
    "small_quantity_revenue",
    """
    WITH li_b AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'
    )
    SELECT round(sum(CAST(l_extendedprice AS DECIMAL(20,6)))::DOUBLE / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM li_b
    JOIN (SELECT l_partkey AS pk, avg(l_quantity) AS qa FROM li_b GROUP BY 1) a
      ON a.pk = li_b.l_partkey
    WHERE l_quantity < 0.5 * qa
    """,
    description=(
        "TPC-H Q17 shape (small-quantity-order revenue), adapted: no "
        "p_container column, so the part filter is brand-only and the "
        "threshold is 0.5*avg (keeps the result non-trivial at the "
        "test SFs). The correlated per-part average decorrelates into "
        "a groupBy + equi-join back — both sides pre-filtered to the "
        "brand's parts (part determines brand, so the average over the "
        "filtered relation equals the per-part average). Quantities are "
        "small integers, so the double avg is exact on any engine. The "
        "filtered relation is cache-tracked: one lineitem-join-part "
        "evaluation feeds both the average and the probe."
    ),
    tags=("sql", "join", "subquery", "tpch"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#4")
    li_b = C.track(
        li.join(p, li.l_partkey == p.p_partkey).select(
            "l_partkey", "l_quantity", "l_extendedprice"
        )
    )
    avg_q = li_b.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("qa")
    )
    return (
        li_b.join(avg_q, li_b.l_partkey == avg_q.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("qa"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(20,6)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "disjunctive_discounted_revenue",
    """
    SELECT round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1  AND 15 AND l.l_quantity BETWEEN 1  AND 20)
       OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#8'  AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    description=(
        "TPC-H Q19 shape (disjunctive predicates), adapted to the "
        "available part columns (brand+size for container+brand). The "
        "OR-of-ANDs stays a residual on the partkey hash join; Catalyst "
        "derives the single-side implications (p_brand IN (...), "
        "p_size/l_quantity range hulls) and pushes them below the join "
        "— the pattern that decides whether a 100 TB scan reads 3 "
        "brands or all of them."
    ),
    tags=("sql", "join", "pushdown", "tpch"),
)
def q_disjunctive_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    cond = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#8")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(money_sum(_rev(), "revenue"), F.count("*").alias("n_lines"))
    )


@_register(
    "suppliers_kept_orders_waiting",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    w AS (
      SELECT l1.l_suppkey, count(*) AS numwait
      FROM late l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY 1
    )
    SELECT s_name, numwait FROM (
      SELECT s.s_name, w.numwait,
             row_number() OVER (ORDER BY w.numwait DESC, s.s_name) AS rk
      FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
    ) WHERE rk <= 20
    """,
    description=(
        "TPC-H Q21 (suppliers who kept orders waiting), adapted: no "
        "commit/receipt dates, so 'late' = shipped > 90 days after the "
        "order date. The EXISTS is a LeftSemi and the NOT EXISTS a "
        "LeftAnti hash join, both equi on l_orderkey with the suppkey "
        "inequality as residual — co-partitioned with the late relation "
        "so the three passes share one shuffle key. The late relation "
        "is cache-tracked (probe + anti build). Top-20 via "
        "TakeOrderedAndProject on (numwait desc, s_name)."
    ),
    tags=("sql", "join", "semi-anti", "topk", "tpch"),
)
def q_suppliers_kept_orders_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o_f = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = load_table(spark, "supplier", sf_dir)
    late = C.track(
        li.join(o_f, li.l_orderkey == o_f.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    waiting = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    # counts has up to one row per supplier — an SF-SCALED bound, so no
    # broadcast hint: a hard hint would force an O(|supplier|) broadcast
    # at high SF; AQE broadcasts it while its runtime size qualifies
    counts = waiting.groupBy("l_suppkey").agg(F.count("*").alias("numwait"))
    named = s.join(counts, s.s_suppkey == counts.l_suppkey)
    return (
        named.orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
        .select("s_name", "numwait")
    )


@_register(
    "dormant_customer_balance",
    """
    WITH pool AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(20,6)) AS bal
      FROM customer WHERE c_nationkey IN (3, 5, 7, 11, 13, 17, 19)
    ),
    t AS (SELECT sum(bal) AS tot, count(*) AS n FROM pool WHERE bal > 0)
    SELECT c_nationkey, count(*) AS n_custs,
           round(sum(bal), 2)::DOUBLE AS total_acctbal
    FROM pool p CROSS JOIN t
    WHERE p.bal * t.n > t.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1
    """,
    description=(
        "TPC-H Q22 (global sales opportunity), adapted: nation-key "
        "groups substitute for phone country codes (no c_phone), and "
        "'no orders' becomes 'no orders since 1999' (dormant, not "
        "never-ordered — the data generator gives almost every customer "
        "some order). The above-average test is cross-multiplied into "
        "exact DECIMAL integer arithmetic (bal*n > tot) so no float "
        "average can flip a boundary customer between engines; the "
        "(tot, n) row is a 1-row broadcast. The NOT EXISTS is a "
        "LeftAnti against the date-filtered orders."
    ),
    tags=("sql", "join", "anti", "scalar-subquery", "tpch"),
)
def q_dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = C.track(
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_nationkey").isin(3, 5, 7, 11, 13, 17, 19))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(20,6)").alias("bal"),
        )
    )
    t = pool.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("tot"), F.count("*").alias("n")
    )
    recent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        pool.crossJoin(F.broadcast(t))
        .filter(F.col("bal") * F.col("n") > F.col("tot"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("bal"), 2).cast("double").alias("total_acctbal"),
        )
    )
