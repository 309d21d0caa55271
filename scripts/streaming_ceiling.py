"""Measure each streaming family's TRUE capacity ceiling (round-9
verdict item 5): round 9 left all 10 families input-bound at the 2M
rows/s wall-clock rate source, which makes 2M a lower bound, not a
measurement.

    python scripts/streaming_ceiling.py [--seconds N] [--families a,b]
    python scripts/streaming_ceiling.py --one <family> <rows_per_batch> <seconds>

Design (second iteration — the first used a wall-clock `rate` ladder
and OOM-killed the shared JVM: with no batch cap, a family slower than
the configured rate accrues an unbounded backlog, and a 16M rows/s
window means a several-hundred-million-row catch-up batch):

- **`rate-micro-batch` source**: every micro-batch carries EXACTLY
  rows_per_batch rows and event time advances 1 s per batch, so state
  is bounded, there is no backlog, and measured rows/sec = processing
  capacity directly — no input-bound ambiguity, no ladder needed.
  Every family runs the full batch-size curve (2M → 4M → 8M rows per
  batch; early-stop only on error) and capacity = the best point —
  per-batch fixed costs (planning, state-store commit) amortize with
  batch size, and the recorded curve shows where they flatten. A
  family still climbing at 8M (mean_batch_sec < 1 s) is reported at
  its 8M point, i.e. its ceiling reads trigger-overhead-bound — the
  per-point mean_batch_sec makes that visible in the artifact.
- **Per-family subprocess isolation** (`--one` recursion): a family
  that kills its JVM cannot take the rest of the sweep with it.
- **Attribution**: a bare source→noop `passthrough` lane measures the
  harness ceiling; a family within 0.85 of it is source-capped, below
  that the bottleneck is the family's own stage, named by execution
  class (JVM windowed aggregation / RocksDB vs Arrow
  applyInPandasWithState vs foreachBatch store rewrite).

Writes BENCH_STREAMING.json (same `families.<name>.rows_per_sec` shape
bench.py's full-run embed reads, plus per-family `rows_per_batch`,
`steady_batches`, `mean_batch_sec`, `bottleneck`).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: families whose stateful stage is an Arrow-batched python worker
PANDAS_FAMILIES = {"quantiles", "drift_psi", "heavy_hitters", "count_trigger"}

FAMILIES = [
    "passthrough",
    "tumbling",
    "keyed_tumbling",
    "sliding",
    "session_windows",
    "dedup_within_watermark",
    "quantiles",
    "drift_psi",
    "heavy_hitters",
    "count_trigger",
    "upsert",
]

BATCH_SIZES = [2_000_000, 4_000_000, 8_000_000]


def _mb_events(spark, rows_per_batch: int):
    """rate-micro-batch source in bench._event_shape's shared event
    projection — same columns as the wall-clock rate benches by
    construction, but with a FIXED per-batch row count and event time
    advancing 1 s per batch (bounded state, zero backlog)."""
    import bench as B

    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("advanceMillisPerBatch", 1000)  # event time: 1 s/batch
        .option("numPartitions", parts)
        .load()
    )
    return B._event_shape(src)


def _build_query(spark, name: str, rows_per_batch: int):
    """Start the family's streaming query against the micro-batch
    source; returns the StreamingQuery."""
    import bench as B

    ev = _mb_events(spark, rows_per_batch)
    if name == "passthrough":
        ckpt = tempfile.mkdtemp(prefix="sceil_pt_")
        return (
            ev.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
    if name == "upsert":
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
                merged = latest_per_key(
                    cur.unionByName(upd), ["user_id"], ["event_id"]
                )
            else:
                merged = upd
            merged.write.mode("overwrite").parquet(tmp)
            if _os.path.exists(store):
                _shutil.rmtree(store)
            _os.rename(tmp, store)

        return (
            ev.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .start()
        )
    # stateful families share bench.py's builders; monkey-patch the
    # source factory so they read the micro-batch source instead of
    # the wall-clock rate source
    orig = B._rate_events
    B._rate_events = lambda s, rps: _mb_events(s, rows_per_batch)
    try:
        build, mode = B._throughput_builders(spark, rows_per_batch)[name]
        ckpt = tempfile.mkdtemp(prefix=f"sceil_{name}_")
        return (
            build()
            .writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .start()
        )
    finally:
        B._rate_events = orig


def _one(name: str, rows_per_batch: int, seconds: int) -> None:
    """Subprocess body: measure ONE family at one batch size and print
    a single JSON line."""
    import bench as B
    from flink_start_spark.session import get_spark

    spark = get_spark("streaming_ceiling")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", B.ROCKSDB_PROVIDER
    )
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    q = _build_query(spark, name, rows_per_batch)
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
        print(json.dumps({"rows_per_sec": None, "error": err[:400]}))
        return
    rps, n = B._steady_state_rows_per_sec(progresses)
    durs = [
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in progresses
        if p.get("numInputRows", 0) > 0
        and p.get("durationMs", {}).get("triggerExecution")
    ]
    print(
        json.dumps(
            {
                "rows_per_sec": rps,
                "steady_batches": n,
                "mean_batch_sec": round(sum(durs) / len(durs), 2) if durs else None,
            }
        )
    )


def _spawn(name: str, rows_per_batch: int, seconds: int) -> dict:
    """Run one (family, batch size) measurement in an isolated python
    subprocess; a JVM death there becomes an error record, not a sweep
    abort."""
    try:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--one",
                name,
                str(rows_per_batch),
                str(seconds),
            ],
            capture_output=True,
            text=True,
            timeout=seconds + 240,
        )
    except subprocess.TimeoutExpired:
        # a WEDGED child (JVM hung rather than dead — the exact case
        # isolation exists for) must become an error record like any
        # other child failure, not abort the sweep and lose every
        # family already measured
        return {
            "rows_per_sec": None,
            "error": f"subprocess timeout after {seconds + 240}s (hung JVM)",
        }
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    return {"rows_per_sec": None, "error": " | ".join(tail)[:400]}


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--one":
        _one(argv[1], int(argv[2]), int(argv[3]))
        return 0

    seconds = 30
    only = None
    if "--seconds" in argv:
        seconds = int(argv[argv.index("--seconds") + 1])
    if "--families" in argv:
        only = set(argv[argv.index("--families") + 1].split(","))
    load_start = round(os.getloadavg()[0], 2)  # before the sweep inflates it

    results: dict[str, dict] = {}
    for name in FAMILIES:
        if only and name not in only and name != "passthrough":
            continue
        curve = []
        for rpb in BATCH_SIZES:
            pt = _spawn(name, rpb, seconds)
            pt["rows_per_batch"] = rpb
            curve.append(pt)
            print(json.dumps({"family": name, **pt}), file=sys.stderr, flush=True)
            if pt.get("error"):
                break
        # capacity = best point on the batch-size curve (per-batch
        # fixed costs — planning, state-store commit — amortize with
        # batch size; the curve shows where it flattens)
        best = max(
            (p for p in curve if p.get("rows_per_sec")),
            key=lambda p: p["rows_per_sec"],
            default=curve[-1],
        )
        results[name] = {**best, "curve": curve}

    pt_max = results.get("passthrough", {}).get("rows_per_sec") or float("inf")
    for name, rec in results.items():
        if name == "passthrough" or rec.get("error"):
            continue
        rps = rec.get("rows_per_sec")
        if rps is not None and rps >= 0.85 * pt_max:
            rec["bottleneck"] = "source+projection ceiling (matches passthrough)"
        elif name in PANDAS_FAMILIES:
            rec["bottleneck"] = "python stateful stage (applyInPandasWithState)"
        elif name == "upsert":
            rec["bottleneck"] = "foreachBatch latest-per-key store rewrite"
        else:
            rec["bottleneck"] = "jvm windowed aggregation / RocksDB state store"

    out = {
        "metric": "streaming_steady_state_rows_per_sec",
        "mode": "rate_micro_batch_capacity",
        "batch_sizes": BATCH_SIZES,
        "seconds_per_measurement": seconds,
        "state_store": "rocksdb",
        "load_avg_start": load_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
        "families": results,
    }
    with open(os.path.join(REPO, "BENCH_STREAMING.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
