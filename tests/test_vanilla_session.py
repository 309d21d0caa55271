"""The driver contract's hardest environmental requirement: entry() and
queries() must work on a SparkSession the DRIVER built — without any of
our session factory's configs (nanos parquet handling, UTC timezone).

In-session regression: unset the critical confs, then verify the catalog
loader restores them and reads succeed. A true vanilla-JVM check lives
in the verify drive (subprocess with a bare SparkSession.builder).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_start_spark.sources.catalog import _REQUIRED_CONFS, load_table

from tests.conftest import SF_SMOKE


def test_load_table_restores_required_confs(spark):
    originals = {k: spark.conf.get(k, None) for k in _REQUIRED_CONFS}
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        df = load_table(spark, "events", SF_SMOKE)
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # and the nanos timestamp column actually reads
        assert df.select(F.min("ts")).collect()[0][0] is not None
    finally:
        for k, v in originals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_entry_epochs_are_timezone_stable(spark):
    # epochs emitted by the flagship query must not depend on session tz
    import __spark_entry__ as m

    before = spark.conf.get("spark.sql.session.timeZone", None)
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        rows = {
            r["window_start"]: r["signup_cnt"] for r in m.entry(spark).collect()
        }
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows_utc = {
            r["window_start"]: r["signup_cnt"] for r in m.entry(spark).collect()
        }
        assert rows == rows_utc
    finally:
        if before is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", before)
