"""The strictest local approximation of the driver's correctness gate:
run every catalog query on a BARE SparkSession (no session-factory
configs — exactly what the driver provides) and require EXACT sorted-
tuple equality with the DuckDB oracle after 6-decimal rounding.

This sweep caught three bugs the tolerant factory-session comparison
passed: a floor-vs-round epoch disagreement, cent flips from
order-dependent double summation, and the nanos-parquet session
dependency. Run it before every round end:

    python scripts/vanilla_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("vanilla_gate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from flink_start_spark import cache
    from flink_start_spark.plans import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:
        # a typo'd name silently filtered out would print "0/0 passed"
        # and exit 0 — the strictest gate must not vacuously pass
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    queries = {n: q for n, q in QUERIES.items() if not only or n in only}
    fails = 0
    for name, q in queries.items():
        try:
            sdf = q.spark(spark, sf).toPandas()
            if q.oracle is None:
                print(f"ROWS-ONLY {name}: {len(sdf)} rows")
                continue
            odf = con.execute(q.oracle).df()
            s = sdf.reindex(sorted(sdf.columns), axis=1).round(6)
            o = odf.reindex(sorted(odf.columns), axis=1).round(6)
            # multiset equality over null-normalized tuples: NaN != NaN
            # would fail rows with legitimate NULLs (outer-join misses),
            # and Counter needs no sort (None isn't orderable)
            from collections import Counter

            def rows(df):
                return Counter(
                    map(tuple, df.astype(object).where(df.notna(), None).itertuples(index=False))
                )

            if list(s.columns) != list(o.columns):
                print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
                fails += 1
            elif rows(s) != rows(o):
                print(f"FAIL {name}: values differ (exact comparison)")
                fails += 1
            else:
                print(f"OK   {name}: {len(s)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {str(e).splitlines()[0][:140]}")
            fails += 1
        finally:
            cache.release()  # per-query cache ownership (cache.py)
    print(f"\nvanilla exact gate: {len(queries) - fails}/{len(queries)} passed")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
