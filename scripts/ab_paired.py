"""Paired old-vs-new A/B on this flapping host: alternate single-run
subset benches between two git trees within one window so host drift
cancels, then compare per-query MINs.

    python scripts/ab_paired.py <old_tree> <new_tree> <reps> q1 q2 ...

Each invocation of bench.py is a fresh JVM (same as the driver's
methodology); BENCH_SUBSET.json is harvested after every run. Output:
one JSON line with per-query {old_min, new_min, ratio} plus the
interleaving order and per-rep totals for window-health forensics.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_once(tree: str, queries: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    subprocess.run(
        [sys.executable, "bench.py", "--runs", "1", "--queries", *queries],
        cwd=tree,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(tree, "BENCH_SUBSET.json")) as f:
        return json.load(f)["queries"]


def main() -> None:
    old_tree, new_tree, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    queries = sys.argv[4:]
    samples: dict[str, dict[str, list[float]]] = {
        "old": {q: [] for q in queries},
        "new": {q: [] for q in queries},
    }
    for rep in range(reps):
        # alternate which side goes first each rep so slow-drift
        # windows do not systematically favor one side
        order = [("old", old_tree), ("new", new_tree)]
        if rep % 2:
            order.reverse()
        for label, tree in order:
            got = run_once(tree, queries)
            for q in queries:
                if q in got:
                    samples[label][q].append(got[q])
            print(
                f"rep {rep} {label}: total "
                f"{round(sum(got.get(q, 0.0) for q in queries), 2)}s",
                file=sys.stderr,
            )
    out = {}
    for q in queries:
        o, n = min(samples["old"][q]), min(samples["new"][q])
        out[q] = {
            "old_min": round(o, 3),
            "new_min": round(n, 3),
            "ratio": round(n / o, 3) if o else None,
            "old_all": [round(x, 3) for x in samples["old"][q]],
            "new_all": [round(x, 3) for x in samples["new"][q]],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
