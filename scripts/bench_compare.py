"""Compare two bench artifacts with noise classification.

    python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.3]

For every query present in both artifacts, classifies the min-time
ratio new/old as:

- ``noise``     — the ratio is inside either artifact's own min-median
                  spread (the run-to-run noise measured on that host
                  window), so the delta carries no signal;
- ``regressed`` / ``improved`` — outside both spreads AND beyond the
  threshold.

This is the round-over-round forensics the r2→r3 comparison had to do
by hand (unchanged queries drifting 1.5-2x from neighbor load read as
regressions until medians disambiguated them). Artifacts produced
before bench.py recorded medians fall back to threshold-only
classification.
"""

from __future__ import annotations

import argparse
import json


def classify(old_min, new_min, old_med, new_med, threshold):
    if not new_min:
        # a sub-0.5ms min rounds to 0.0; guard the symmetric direction
        # too (1/ratio below would raise ZeroDivisionError)
        return ("improved" if old_min else "noise"), 0.0
    ratio = new_min / old_min if old_min else float("inf")
    spread = 1.0
    if old_med and old_min:
        spread = max(spread, old_med / old_min)
    if new_med and new_min:
        spread = max(spread, new_med / new_min)
    if max(ratio, 1 / ratio) <= max(threshold, spread):
        return "noise", ratio
    return ("regressed" if ratio > 1 else "improved"), ratio


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]
    om = old.get("queries_median", {})
    nm = new.get("queries_median", {})
    out = {"regressed": [], "improved": [], "noise": []}
    for k in sorted(set(oq) & set(nq)):
        cls, ratio = classify(oq[k], nq[k], om.get(k), nm.get(k), args.threshold)
        out[cls].append((k, oq[k], nq[k], round(ratio, 2)))
    print(
        f"totals: old={round(sum(oq.values()), 1)}s "
        f"new={round(sum(nq.values()), 1)}s  "
        f"(old load {old.get('load_avg_start')}, new load "
        f"{new.get('load_avg_start')})"
    )
    for cls in ("regressed", "improved"):
        if out[cls]:
            print(f"\n{cls} (name old new ratio):")
            for row in sorted(out[cls], key=lambda r: -abs(r[3] - 1)):
                print("  ", *row)
    print(f"\nnoise-classified: {len(out['noise'])} queries")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new-only:", ", ".join(f"{k}={nq[k]}" for k in only_new))


if __name__ == "__main__":
    main()
