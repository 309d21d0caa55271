"""Find each streaming family's TRUE capacity ceiling (round-9 verdict
item 5): round 9 left all 10 families input-bound at the 2M rows/s
generator, which makes 2M a lower bound, not a measurement.

    python scripts/streaming_ceiling.py [--seconds N] [--families a,b]

Per family, a rate LADDER (2M -> 4M -> 8M -> 16M rows/s) runs until the
family stops keeping up with the generator (input_bound flips false) —
that measured steady-state rate is the knee. A bare source->noop
"passthrough" lane runs first: any family whose knee matches it is
bounded by source+projection, not its stateful stage; below that the
bottleneck is named by the family's execution class (JVM windowed
aggregation / RocksDB vs Arrow applyInPandasWithState vs foreachBatch
store rewrite).

Writes BENCH_STREAMING.json (same `families.<name>.rows_per_sec` shape
bench.py's full-run embed reads, plus `ladder`/`knee`/`bottleneck`).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402
from flink_start_spark.session import get_spark  # noqa: E402

RATES = [2_000_000, 4_000_000, 8_000_000, 16_000_000]

#: families whose stateful stage is an Arrow-batched python worker
PANDAS_FAMILIES = {"quantiles", "drift_psi", "heavy_hitters", "count_trigger"}


def _measure(q, seconds: int, rate: int) -> dict:
    err = None
    try:
        time.sleep(seconds)
        exc = q.exception()
        err = str(exc) if exc is not None else None
        if err is None and not q.isActive:
            exc = q.exception()
            err = str(exc) if exc is not None else "query died mid-window"
        progresses = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
        q.awaitTermination(60)
    if err is not None:
        return {"rate": rate, "rows_per_sec": None, "error": err[:400]}
    rps, n = B._steady_state_rows_per_sec(progresses)
    return {
        "rate": rate,
        "rows_per_sec": rps,
        "steady_batches": n,
        "input_bound": bool(rps is not None and rps > 0.9 * rate),
    }


def _start_upsert(spark, rate: int):
    from flink_start_spark.streaming.upsert import latest_per_key

    store_dir = tempfile.mkdtemp(prefix="sceil_upsert_store_")
    store = os.path.join(store_dir, "store.parquet")
    ckpt = tempfile.mkdtemp(prefix="sceil_upsert_ckpt_")

    def _merge(batch, batch_id):
        import glob as _glob
        import os as _os
        import shutil as _shutil

        upd = latest_per_key(batch, ["user_id"], ["event_id"])
        tmp = store + "._tmp"
        if _os.path.exists(store) and _glob.glob(_os.path.join(store, "part-*")):
            cur = spark.read.parquet(store).select(*upd.columns)
            merged = latest_per_key(cur.unionByName(upd), ["user_id"], ["event_id"])
        else:
            merged = upd
        merged.write.mode("overwrite").parquet(tmp)
        if _os.path.exists(store):
            _shutil.rmtree(store)
        _os.rename(tmp, store)

    return (
        B._rate_events(spark, rate)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .start()
    )


def _ladder(spark, name: str, seconds: int) -> dict:
    points = []
    for rate in RATES:
        if name == "passthrough":
            ckpt = tempfile.mkdtemp(prefix=f"sceil_{name}_")
            q = (
                B._rate_events(spark, rate)
                .writeStream.format("noop")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )
        elif name == "upsert":
            q = _start_upsert(spark, rate)
        else:
            build, mode = B._throughput_builders(spark, rate)[name]
            ckpt = tempfile.mkdtemp(prefix=f"sceil_{name}_")
            q = (
                build()
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .start()
            )
        pt = _measure(q, seconds, rate)
        points.append(pt)
        print(json.dumps({"family": name, **pt}), file=sys.stderr)
        if pt.get("error") or not pt.get("input_bound"):
            break
    last = points[-1]
    return {
        "rows_per_sec": last.get("rows_per_sec"),
        "input_bound": bool(last.get("input_bound")),
        "knee_rate": last.get("rate"),
        "ladder": points,
        **({"error": last["error"]} if last.get("error") else {}),
    }


def main() -> int:
    seconds = 20
    only = None
    argv = sys.argv[1:]
    if "--seconds" in argv:
        i = argv.index("--seconds")
        seconds = int(argv[i + 1])
    if "--families" in argv:
        i = argv.index("--families")
        only = set(argv[i + 1].split(","))

    spark = get_spark("streaming_ceiling")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", B.ROCKSDB_PROVIDER
    )
    # python-worker pool warm-up (pandas-state families reuse it)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    names = ["passthrough"] + list(B._throughput_builders(spark, RATES[0])) + [
        "upsert"
    ]
    if only:
        names = [n for n in names if n in only or n == "passthrough"]
    results: dict[str, dict] = {}
    for name in names:
        results[name] = _ladder(spark, name, seconds)

    # bottleneck attribution
    pt_max = results.get("passthrough", {}).get("rows_per_sec") or float("inf")
    for name, rec in results.items():
        if name == "passthrough" or rec.get("error"):
            continue
        rps = rec.get("rows_per_sec")
        if rec["input_bound"]:
            rec["bottleneck"] = (
                f"source (still input-bound at {rec['knee_rate']} rows/s)"
            )
        elif rps is not None and rps >= 0.85 * pt_max:
            rec["bottleneck"] = (
                "source+projection ceiling (knee matches passthrough)"
            )
        elif name in PANDAS_FAMILIES:
            rec["bottleneck"] = "python stateful stage (applyInPandasWithState)"
        elif name == "upsert":
            rec["bottleneck"] = "foreachBatch latest-per-key store rewrite"
        else:
            rec["bottleneck"] = "jvm windowed aggregation / RocksDB state store"

    out = {
        "metric": "streaming_steady_state_rows_per_sec",
        "mode": "rate_ladder",
        "rates": RATES,
        "rate_rows_per_sec": RATES[-1],
        "seconds_per_family_per_rate": seconds,
        "state_store": "rocksdb",
        "load_avg_start": round(os.getloadavg()[0], 2),
        "families": results,
    }
    with open(os.path.join(REPO, "BENCH_STREAMING.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
