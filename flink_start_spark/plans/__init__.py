"""Query catalog: every declared query + its DuckDB oracle SQL.

Importing this package registers the full query surface (each submodule
adds its queries to ``catalog.QUERIES`` at import time).
"""

from flink_start_spark.plans.catalog import QUERIES, Query, oracle_sql_map, query_map
from flink_start_spark.plans import advanced, cdc, extensions, monitoring, pipeline, sql_surface, tpch  # noqa: F401  (registers queries)

__all__ = ["QUERIES", "Query", "query_map", "oracle_sql_map"]
