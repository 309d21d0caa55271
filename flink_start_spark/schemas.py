"""Explicit schemas for every table the engine touches.

The reference hard-codes a three-field record type
(``case class UserActivity(userId, activity, timestamp)``,
/root/reference/src/main/scala/generators/useractivity/package.scala:10) and
derives event time by parsing the ISO-8601 string on demand
(package.scala:11). We make the schema explicit and typed once at the edge
(never inferred on the hot path — schema inference forces an extra pass
over 100 TB of input) and carry event time as a native ``TimestampType``
so Catalyst windows/watermarks operate on it directly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference data model (SURVEY §1) -----------------------------------

#: The reference's UserActivity record (package.scala:10), raw form: the
#: timestamp arrives as an ISO-8601 *string* and is parsed by O4.
USER_ACTIVITY_RAW = T.StructType(
    [
        T.StructField("userId", T.StringType(), True),
        T.StructField("activity", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
    ]
)

#: Typed form after event-time extraction (SURVEY O4): ts is a real
#: timestamp; arrival preserves file order for the count-trigger operator.
USER_ACTIVITY = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("activity", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("arrival", T.LongType(), False),
    ]
)

# --- Driver-provided tables (TESTDATA.md) --------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

#: The streaming table — the Spark-side role of the reference's
#: UserActivity stream (activity → event_type, register → signup; F3 in
#: FIXTURES.md). ``props`` is a JSON string column (semi-structured path).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

#: table name -> schema, for the loader.
TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
