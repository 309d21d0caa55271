"""Exact-ground-truth recall audit for the SemDeDup cell topologies.

The cell-keyed self-join (semdedup_flags) only scores WITHIN-cell
pairs — by design (Abbas '23: pairwise cost bounded by |cell|). This
audit measures what that costs, separating the two approximation
layers the shipped catalog instance stacks:

  1. the within-cell restriction itself (flat argmin assignment), and
  2. the two-level coarse-quantizer tree on top (the O(n*sqrt(k))
     scale path, shipped default since round 8) at super_probe 1..P.

Ground truth is a blocked-numpy ALL-PAIRS cosine scan (no candidate
pruning at all): a vector is exact-flagged iff some smaller-id vector
has cosine >= threshold. Feasible to ~10^5 vectors locally; this is
an AUDIT tool, not a pipeline operator — the pipeline-scale recall
instrument for the banded families is the lsh_recall_audit catalog
entry.

Round-8 measurement (sf1 corpus, 20k vectors, threshold 0.8 — chosen
because the corpus has no >=0.99 pairs, so these are boundary-hugging
worst cases; per_cell=128 -> 156 cells; fp = 0 in EVERY row below):

    exact flagged: 249
    flat                 recall 0.386
    two sp=1             recall 0.317
    two sp=2             recall 0.297
    two sp=3             recall 0.301
    flat cp=2            recall 0.707
    flat cp=3            recall 0.859
    flat cp=4            recall 0.948
    two sp=1 cp=2        recall 0.466
    two sp=1 cp=3..4     recall 0.494   (capped: one super's members)
    two sp=2 cp=2        recall 0.582
    two sp=2 cp=3        recall 0.763
    two sp=3 cp=3        recall 0.783

Readings: cell_probe is the dial that actually buys pair recall —
super_probe alone cannot (it splits as many boundary pairs as it
joins), but it UNLOCKS cell_probe under the two-level tree by widening
the member pool the p cells are drawn from (sp=1 caps cp at 0.494;
sp=2 lifts cp=3 to 0.763, within 0.1 of flat cp=3's 0.859 while
keeping the O(n*sqrt(k)) assignment scan). Candidate pair work grows
~cell_probe^2-fold — the budget knob stays per_cell. (At the 0.99
operating threshold near-identical vectors share distances to every
centroid and co-locate under any consistent argmin, so the shipped
catalog point needs no probe.)

The sweep regenerates the table above (all rows except sp=1 cp=4,
which only confirms the sp=1 cap): flat, two-level at super_probe
1..MAX_PROBE, flat cell_probe 2..MAX_PROBE+1, and the
(super_probe, cell_probe) grid over {1,2,3} x {2,3}.

Usage:
    python scripts/semdedup_recall_audit.py [SF_DIR] [THRESHOLD] [MAX_PROBE]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_start_spark import cache as C
from flink_start_spark.operators import similarity as S
from flink_start_spark.plans.extensions import (
    CATALOG_PER_CELL,
    _two_level_assign_fn,
)
from flink_start_spark.session import get_spark
from flink_start_spark.sources.catalog import load_table


def exact_flags(ids: np.ndarray, X: np.ndarray, thr: float, block: int = 2000):
    """Smaller-id-neighbor-above-threshold flag per vector, by blocked
    all-pairs cosine (rows are L2-normalized first)."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(ids)
    out = np.zeros(n, dtype=bool)
    for i in range(0, n, block):
        sims = Xn[i : i + block] @ Xn.T
        for r in range(sims.shape[0]):
            gi = i + r
            js = np.where(sims[r] >= thr)[0]
            out[gi] = any(ids[j] < ids[gi] for j in js if j != gi)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    max_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("semdedup_recall_audit")
    emb = load_table(spark, "embeddings", sf_dir)
    pdf = (
        emb.select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = pdf.vec_id.to_numpy()
    X = np.vstack(pdf.embedding.values).astype(np.float64)
    truth = pd.DataFrame({"vec_id": ids, "exact": exact_flags(ids, X, thr)})
    n_exact = int(truth.exact.sum())
    print(f"corpus {sf_dir}: n={len(ids)} threshold={thr} exact_flagged={n_exact}")

    def audit_kwargs(tag: str, kwargs: dict) -> None:
        got = (
            S.semdedup_flags(
                emb, threshold=thr, per_cell=CATALOG_PER_CELL, **kwargs
            )
            .select("vec_id", "pruned")
            .toPandas()
        )
        C.release()
        spark.catalog.clearCache()
        m = got.merge(truth, on="vec_id")
        tp = int((m.pruned & m.exact).sum())
        fp = int((m.pruned & ~m.exact).sum())
        rec = tp / n_exact if n_exact else float("nan")
        print(f"{tag:10s} tp={tp} fp={fp} recall={rec:.3f}")

    def audit(tag: str, assign_fn) -> None:
        audit_kwargs(tag, dict(assign_fn=assign_fn))

    audit("flat", None)
    for p in range(1, max_probe + 1):
        audit(f"two sp={p}", _two_level_assign_fn(p))
    # the cell_probe recall dial: flat path, then the (sp, cp) grid
    # under the two-level tree (sp=1 caps cp at one super's members;
    # the docstring table's sp=2/3 rows come from this grid)
    # grid bounds follow MAX_PROBE (round-9 ADVICE: the fixed {1,2,3} x
    # {2,3} grid silently ignored a larger CLI argument)
    for cp in range(2, max_probe + 2):
        audit_kwargs(f"flat cp={cp}", dict(cell_probe=cp))
    for sp in range(1, max_probe + 1):
        for cp in range(2, max_probe + 1):
            audit_kwargs(
                f"two sp={sp} cp={cp}",
                dict(assign_fn=_two_level_assign_fn(sp, cp)),
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
