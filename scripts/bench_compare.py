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

Besides the per-query lists, emits an overall VERDICT separating the
two ways a pair of artifacts can disagree (the round-6 judge item):

- ``uniform inflation (host tenancy)`` — the per-query ratio
  distribution is shifted but FLAT (p90/p10 spread tight around the
  median): every query moved by ~the same factor, which is what
  neighbor load does and what a code change never does;
- ``per-query regression/improvement`` — outliers beyond the uniform
  shift carry real signal (named explicitly);
- ``equivalent`` — median ratio ~1 and no outliers.

The driver's BENCH_r{N}.json vs the committed quiet-window
BENCH_FULL.json at the same HEAD is the canonical use: round 6
measured uniform 1.28x median inflation, worst 1.72, zero per-query
signal — tenancy, not code.
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


def _ruler_line(old: dict, new: dict):
    """Ruler normalization (round-9): both artifacts carry
    ``ruler_sec`` — the same fixed synthetic Spark job timed in each
    artifact's own window — so host drift divides out of the totals
    ratio. Returns the ruler ratio (new/old) or None."""
    ro, rn = old.get("ruler_sec"), new.get("ruler_sec")
    if not ro or not rn:
        return None
    print(f"ruler: old={ro}s new={rn}s (host ratio {rn / ro:.2f})")
    ov, nv = old.get("value"), new.get("value")
    if ov and nv:
        raw = nv / ov
        norm = (nv / rn) / (ov / ro)
        print(
            f"ruler-normalized totals ratio: {norm:.2f} "
            f"(raw {raw:.2f} / host {rn / ro:.2f})"
        )
    return rn / ro


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    # the driver's BENCH_r{N}.json wraps the payload under 'parsed'
    # (and carries no per-query map — totals only)
    old = old.get("parsed", old)
    new = new.get("parsed", new)
    ruler_ratio = _ruler_line(old, new)
    if "queries" not in old or "queries" not in new:
        for label, art in (("old", old), ("new", new)):
            print(
                f"{label}: total={art.get('value')}s "
                f"median_total={art.get('median_total')}s "
                f"load={art.get('load_avg_start')}"
            )
        ov, nv = old.get("value"), new.get("value")
        if ov and nv:
            print(
                f"verdict: totals-only ratio {nv / ov:.2f} — no per-query "
                "map in one artifact; compare its quiet-window twin "
                "(BENCH_FULL.json at the same HEAD) for attribution"
            )
        else:
            # never exit silently: the round-close docs are required to
            # quote a verdict line, so say WHY one can't be computed
            print(
                "verdict: none — missing/zero 'value' in "
                f"{'old' if not ov else 'new'} artifact; cannot form the "
                "totals-only ratio"
            )
        return
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

    # Overall verdict: uniform shift (tenancy) vs per-query signal.
    ratios = sorted(
        nq[k] / oq[k] for k in set(oq) & set(nq) if oq[k] and nq[k]
    )
    if len(ratios) >= 5:
        med = ratios[len(ratios) // 2]
        p10 = ratios[len(ratios) // 10]
        p90 = ratios[(len(ratios) * 9) // 10]
        spread = p90 / p10 if p10 else float("inf")
        shifted = med > 1.15 or med < 1 / 1.15
        # outliers are measured RELATIVE TO the median shift (max of
        # r/med, med/r): the absolute form max(r, 1/r) > med*1.5 made
        # every query of a uniform DEFLATION an "outlier" (1/0.72 >
        # 0.72*1.5) so that branch was unreachable, and hid genuine
        # improvements under an inflation shift
        outliers = [r for r in out["regressed"] + out["improved"]
                    if r[3] and max(r[3] / med, med / r[3]) > 1.5]
        if shifted and spread <= 1.6 and not outliers:
            corroboration = ""
            if ruler_ratio:
                agrees = max(med / ruler_ratio, ruler_ratio / med) <= 1.2
                corroboration = (
                    f"; ruler {'corroborates' if agrees else 'DISPUTES'} "
                    f"the shift (host ratio {ruler_ratio:.2f}, "
                    f"ruler-normalized median {med / ruler_ratio:.2f})"
                )
            verdict = (
                f"UNIFORM {'INFLATION' if med > 1 else 'DEFLATION'} "
                f"(host tenancy signature): median ratio {med:.2f}, "
                f"p10-p90 {p10:.2f}-{p90:.2f} — flat across unrelated "
                f"queries, no per-query signal" + corroboration
            )
        elif out["regressed"] or out["improved"]:
            names = ", ".join(r[0] for r in (out["regressed"] + out["improved"])[:6])
            verdict = (
                f"PER-QUERY SIGNAL beyond the {med:.2f} median shift: "
                f"{len(out['regressed'])} regressed / "
                f"{len(out['improved'])} improved ({names})"
            )
        else:
            verdict = (
                f"EQUIVALENT: median ratio {med:.2f}, "
                f"p10-p90 {p10:.2f}-{p90:.2f}, no outliers"
            )
        # cross-ROUND verdicts quote the RULER-NORMALIZED median
        # (round-9 verdict item 4: cross-day totals on this host class
        # are only comparable through the ruler) — appended to every
        # branch that doesn't already carry it in its corroboration text
        if ruler_ratio and "ruler-normalized median" not in verdict:
            verdict += (
                f" | ruler-normalized median {med / ruler_ratio:.2f} "
                f"(host ratio {ruler_ratio:.2f})"
            )
        print(f"\nverdict: {verdict}")


if __name__ == "__main__":
    main()
