"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"window_start", "window_end", "signup_cnt"}


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query
    assert set(os_) <= set(qs)


def test_each_query_runs_smoke(spark):
    from tests.conftest import SF_SMOKE

    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()
