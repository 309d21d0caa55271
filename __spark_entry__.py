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


def _last_verified_round() -> dict[str, tuple[int, bool]]:
    """Per-query: ``(latest round checked, hash-green at that round)``.

    The driver's per-round correctness budget covers a prefix of
    ``queries()``; with a growing catalog a fixed registration order
    leaves the same suffix unverified every round. Reading the recorded
    correctness runs lets the ordering rotate automatically so every
    query is driver-verified within two rounds of its last check.

    A check only counts as *verified* if it was full hash-green
    (rows + schema + value-hash all true): a ``no_oracle``/err sample
    must not push a query to the back of the rotation, or a query that
    gains an oracle after a rows-only sample waits a full rotation for
    its first hash check (this happened to the BPE pair in round 5).
    """
    last: dict[str, tuple[int, bool]] = {}
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
        for name, rec in checked.items():
            green = bool(
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            )
            prev = last.get(name)
            if prev is None or rnd > prev[0]:
                last[name] = (rnd, green)
    return last


def _content_fingerprints() -> dict[str, str]:
    """Per-query md5 of (registered oracle SQL + query function
    source) — the definition a driver check certifies. Computed live;
    compared against the committed QUERY_FINGERPRINTS.json snapshot
    (scripts/update_fingerprints.py maintains it at round open)."""
    import hashlib
    import inspect

    qm, om = query_map(), oracle_sql_map()
    out = {}
    for name, fn in qm.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):  # builtins / exec'd defs
            src = getattr(fn, "__name__", repr(fn))
        out[name] = hashlib.md5((om.get(name, "") + src).encode()).hexdigest()
    return out


def _recorded_fingerprints() -> dict[str, str]:
    """name -> fingerprint covered by the latest hash-green driver
    check, from the committed QUERY_FINGERPRINTS.json (empty if the
    file is missing/corrupt — every entry then counts as changed,
    which fails safe: over-checking, never under-checking)."""
    try:
        with open(os.path.join(_REPO_ROOT, "QUERY_FINGERPRINTS.json")) as f:
            rec = json.load(f)
        return {n: v.get("fp", "") for n, v in rec.items() if isinstance(v, dict)}
    except (OSError, ValueError):
        return {}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2b),
    ordered least-recently-driver-verified first so the driver's
    correctness budget always lands on the stalest entries. A query
    whose *latest* sample was not full hash-green (never checked,
    errored, or checked before it had an oracle) outranks every
    hash-green one — and so does a query whose DEFINITION (oracle SQL
    + function source) changed since the fingerprint its last green
    check certified (round-9 verdict item 2: a green round rank is
    only as current as the code it ran against). Ties keep
    registration order (deterministic)."""
    qm = query_map()
    last = _last_verified_round()
    current_fp = _content_fingerprints()
    recorded_fp = _recorded_fingerprints()
    order = {n: i for i, n in enumerate(qm)}  # registration-order tie-break

    def key(n: str) -> tuple[int, int, int]:
        rnd, green = last.get(n, (-1, False))
        if green and recorded_fp.get(n) != current_fp.get(n):
            green = False  # definition changed since that check
        return (1 if green else 0, rnd, order[n])

    names = sorted(qm, key=key)
    return {n: qm[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return oracle_sql_map()
