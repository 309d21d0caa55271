"""Query catalog: every declared query + its DuckDB oracle SQL."""

from flink_start_spark.plans.catalog import QUERIES, Query, oracle_sql_map, query_map

__all__ = ["QUERIES", "Query", "query_map", "oracle_sql_map"]
