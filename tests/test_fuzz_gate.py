"""Seeded-fuzz oracle gate: a pinned seed of scripts/fuzz_corpus.py
(randomized mixes of normal and degenerate values — the COMBINATION
space the handpicked adversarial rows miss) run through a
representative catalog subset with full Spark-vs-DuckDB parity.

The full sweep is `python scripts/fuzz_corpus.py <seed> --check`
(seeds 1-12 are 135/135 as of round 6; seeds 1-4 each caught a real
bug first: NULL-user funnel phantom, DuckDB integer `//` truncation
vs Spark's floor on pre-epoch session bounds, and two ANSI
divide-by-zero crashes on zero-revenue ratio groups). This pytest
keeps one seed's cross-family subset in the default gate.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from fuzz_corpus import build  # noqa: E402
from crosscheck import TABLES, _normalize  # noqa: E402

from flink_start_spark.plans import QUERIES  # noqa: E402

_SEED = 2  # caught the promo_revenue_share ANSI /0 on first contact

#: One query per bug class the fuzzer caught, plus ratio/window/funnel
#: family representatives whose degenerate-group hazards it probes.
_SUBSET = [
    "promo_revenue_share",        # zero-revenue month ratio
    "nation_market_share",        # zero-revenue year ratio
    "signup_purchase_funnel",     # NULL-user phantom funnel
    "three_step_funnel",          # identified-users contract
    "weekly_cohort_retention",    # NULL-user phantom cohort
    "session_windows_per_user",   # pre-epoch session bound floor
    "peak_concurrent_sessions",   # pmod-floor instant decode
    "asof_latest_order_per_event",  # NULL-key as-of
    "daily_revenue_gapfill",      # pre-epoch fractional spine
    "top_revenue_orders",         # fractional orderdate epoch + ties
    "pricing_summary",            # full-discount/zero-qty aggregates
    "table_profile",              # random degenerate relational mix
]


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    return build(_SEED, str(tmp_path_factory.mktemp("sf_fuzz")), spark=spark)


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(fuzz_dir, t + '.parquet')}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _SUBSET)
def test_fuzz_oracle_parity(spark, fuzz_dir, fuzz_con, name):
    import pandas as pd

    q = QUERIES[name]
    s = _normalize(q.spark(spark, fuzz_dir).toPandas())
    o = _normalize(fuzz_con.execute(q.oracle).df())
    assert list(s.columns) == list(o.columns), name
    pd.testing.assert_frame_equal(
        s, o, check_dtype=False, rtol=0, atol=1e-6
    )
