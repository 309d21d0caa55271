"""Skew-mitigation equivalence + storage-format round-trips +
partition-pruning plan checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_start_spark.operators.skew import salted_agg, salted_count_distinct
from flink_start_spark.sources.catalog import load_table

from tests.conftest import SF_SMOKE


def test_salted_count_distinct_equals_plain(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    plain = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        r["event_type"]: r["n_distinct"]
        for r in salted_count_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert salted == plain


def test_salted_sum_equals_plain(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    plain = {
        r["event_type"]: round(r["s"], 6)
        for r in ev.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    salted = {
        r["event_type"]: round(r["agg"], 6)
        for r in salted_agg(ev, ["event_type"], F.col("value"), "sum", alias="agg").collect()
    }
    assert salted == plain


def test_aqe_splits_skewed_join(spark):
    # The runtime half of the skew story (the salted operators are the
    # static half): with one hot key, AQE must detect the oversized
    # shuffle partition at execution time and split it (skew=true on
    # the join in the FINAL adaptive plan). Thresholds are lowered so
    # test-sized data crosses them; production keeps the defaults.
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") < 90_000, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's QueryExecution, finalizing
        # the adaptive plan (df.write would execute a separate one)
        assert len(joined.collect()) == 100_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    # write events partitioned by event_type; a filtered read must scan
    # only the matching partition (PartitionFilters, not a post-filter)
    out = str(tmp_path / "events_parted")
    ev = load_table(spark, "events", SF_SMOKE)
    ev.write.partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "signup")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(event_type" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == ev.filter(F.col("event_type") == "signup").count()


def test_csv_json_orc_roundtrip(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE).select(
        "event_id", "user_id", "event_type", "value"
    )
    expected = ev.count()
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / f"rt_{fmt}")
        writer = ev.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        getattr(writer, fmt)(path)
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", "true").schema(
                "event_id long, user_id long, event_type string, value double"
            )
        back = getattr(reader, fmt)(path)
        assert back.count() == expected, fmt
        assert set(back.columns) == set(ev.columns), fmt


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    # Co-located join via bucketing — the 100 TB discipline for repeated
    # large-large joins on the same key: both sides written bucketBy the
    # join key join WITHOUT a shuffle (no Exchange hashpartitioning in
    # the plan; each task zips matching buckets).
    ev = load_table(spark, "events", SF_SMOKE).select("event_id", "user_id", "value")
    users = (
        load_table(spark, "events", SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    for name, df in (("ev_bkt", ev), ("usr_bkt", users)):
        (
            df.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        a, b = spark.table("ev_bkt"), spark.table("usr_bkt")
        joined = a.join(b.hint("merge"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        expected = ev.join(users, "user_id").count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bkt")
        spark.sql("DROP TABLE IF EXISTS usr_bkt")


def test_sliding_window_plan_has_single_expand_shuffle(spark):
    # the sliding window should expand rows (one per overlapping window)
    # then aggregate with ONE exchange — no join, no extra shuffle
    from flink_start_spark.plans import QUERIES

    df = QUERIES["sliding_signup_count"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Spark injects a bloom filter built from a selective dimension
    filter into the fact-side scan (runtime semi-join reduction) — at
    100 TB this is what keeps a filtered dim join from shuffling the
    whole fact table. Local datasets sit under the default application-
    side threshold (10 GB), so the test lowers it to prove the
    mechanism fires."""
    conf = spark.conf
    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {k: conf.get(k, None) for k in keys}
    try:
        conf.set(keys[0], "true")
        conf.set(keys[1], "0")
        conf.set(keys[2], str(64 << 20))
        # force a shuffle join: broadcast joins skip runtime filters
        conf.set(keys[3], "-1")
        orders = load_table(spark, "orders", SF_SMOKE).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        lineitem = load_table(spark, "lineitem", SF_SMOKE)
        joined = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "might_contain" in plan.lower(), plan[:2000]
        # and the filtered result is still correct
        n = joined.collect()
        assert len(n) == 1
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
