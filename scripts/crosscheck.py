"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB at a given
sf dir, compares row count, column names, and an order-insensitive
value hash (floats rounded). Usage:

    python scripts/crosscheck.py [sf_dir] [query ...]
    python scripts/crosscheck.py --json OUT.json [sf_dir] [query ...]

--json records a machine-readable artifact (per-query status + rows +
wall seconds, plus corpus metadata) — the round-7 CROSSCHECK_SF1.json
correctness-at-scale evidence is produced this way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from flink_start_spark import cache
from flink_start_spark.plans import QUERIES
from flink_start_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            # integers compare EXACTLY. assert_frame_equal's rtol would
            # otherwise grant epoch columns ~1e3-second slack (rtol *
            # 1.7e9), which masked a real floor-vs-round epoch bug.
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("usage: crosscheck.py [--json OUT.json] [sf_dir] [query ...]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or list(QUERIES)
    spark = get_spark("crosscheck")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (e.g. the synthesized sf1 corpus):
            # a directory of part files rather than one parquet file
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    results: dict[str, dict] = {}

    def record(name: str, status: str, rows: int | None, t0: float, detail: str = ""):
        results[name] = {
            "status": status,
            "rows": rows,
            "sec": round(time.monotonic() - t0, 3),
            **({"detail": detail[:400]} if detail else {}),
        }

    for name in names:
        q = QUERIES[name]
        t0 = time.monotonic()
        try:
            sdf = q.spark(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            record(name, "spark_error", None, t0, str(e))
            failures += 1
            continue
        finally:
            cache.release()  # per-query cache ownership (cache.py)
        if q.oracle is None:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            record(name, "rows_only", len(sdf), t0)
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            record(name, "oracle_error", len(sdf), t0, str(e))
            failures += 1
            continue
        s, o = _normalize(sdf), _normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            record(name, "columns_differ", len(s), t0)
            failures += 1
        elif len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            record(name, "rows_differ", len(s), t0, f"oracle={len(o)}")
            failures += 1
        else:
            try:
                int_cols = [c for c in s.columns if s[c].dtype.kind in "iu"]
                # round-then-cast, and catch EVERY comparison exception:
                # an oracle NULL in a Spark-int column raises ValueError
                # from astype ("cannot convert non-finite"), which must
                # report as this query's FAIL, not abort the whole sweep
                if int_cols and not s[int_cols].equals(
                    o[int_cols].round().astype("int64")
                ):
                    raise AssertionError(f"integer columns differ: {int_cols}")
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
                )
                print(f"OK   {name}: {len(s)} rows")
                record(name, "ok", len(s), t0)
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: values differ: {str(e)[:400]}")
                record(name, "values_differ", len(s), t0, str(e))
                failures += 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if json_out:
        table_rows = {
            t: con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
            for t in TABLES
            if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
        }
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "table_rows": table_rows,
                    "n_queries": len(names),
                    "n_passed": len(names) - failures,
                    "n_failed": failures,
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
