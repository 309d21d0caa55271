"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``flink_start_spark`` package; this module
is a thin adapter over its query catalog
(``flink_start_spark/plans/catalog.py``).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from flink_start_spark.plans import oracle_sql_map, query_map  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tumbling-window conditional signup count — the
    Spark-native form of the reference's signature pipeline
    (FlinkWindowLearning.scala:61-89) over the sf0.001 events table."""
    return query_map()["tumbling_signup_count"](spark, SMOKE_SF_DIR)


def _last_verified_round() -> dict[str, int]:
    """Per-query: the latest round whose CORRECTNESS_r{N}.json checked it.

    The driver's per-round correctness budget covers a prefix of
    ``queries()``; with a growing catalog a fixed registration order
    leaves the same suffix unverified every round. Reading the recorded
    correctness runs lets the ordering rotate automatically so every
    query is driver-verified within two rounds of its last check.
    """
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                checked = json.load(f)
        except (OSError, ValueError):
            continue
        for name in checked:
            last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2b),
    ordered least-recently-driver-verified first (never-verified at the
    very front) so the driver's correctness budget always lands on the
    stalest entries. Ties keep registration order (deterministic)."""
    qm = query_map()
    last = _last_verified_round()
    order = {n: i for i, n in enumerate(qm)}  # registration-order tie-break
    names = sorted(qm, key=lambda n: (last.get(n, -1), order[n]))
    return {n: qm[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return oracle_sql_map()
