"""Maintain QUERY_FINGERPRINTS.json — the change-aware half of the
driver-rotation state (round-9 verdict item 2).

    python scripts/update_fingerprints.py          # merge-update
    python scripts/update_fingerprints.py --print  # show stale entries
    python scripts/update_fingerprints.py --invalidate NAME...
        # drop recorded entries whose UNDERLYING implementation changed

The driver's correctness rotation (__spark_entry__.queries()) ranks
queries by the round of their last hash-green check — but a check
certifies the DEFINITION that existed when it ran. This file records,
per query, the content fingerprint (md5 of registered oracle SQL +
query function source) that the latest green check actually covered;
the rotation treats an entry whose CURRENT fingerprint differs as
never-checked, so a rewritten query/oracle pair goes to the front of
the next driver rotation instead of waiting out its green-round rank
(in round 9 the three ladder-rewritten LSH queries waited a full
round by construction).

Merge rule (safe to run any time, but the round-open ritual runs it
FIRST, before any code changes): an entry updates only when a NEWER
hash-green driver check exists for it (CORRECTNESS_r{N}.json round >
the recorded round). Mid-round reruns are no-ops — no new driver
artifact, no update — so an edited query can never overwrite the
fingerprint its last check certified.

``--invalidate``: the fingerprint hashes only the registered query
function's own source + its oracle SQL — a rewrite INSIDE an operator
module the query calls (e.g. round 10's similarity.py Arrow kernels)
does not flip it. When an optimization round rewrites a query's
underlying operator, drop its recorded entry here: with no recorded
fingerprint the rotation treats the query as never-certified and
front-ranks it for the next driver correctness sample, which is the
truthful state — the last green check certified code that no longer
exists.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FP_PATH = os.path.join(REPO, "QUERY_FINGERPRINTS.json")


def main() -> int:
    import __spark_entry__ as entry

    current = entry._content_fingerprints()
    last = entry._last_verified_round()
    try:
        with open(FP_PATH) as f:
            recorded = json.load(f)
    except (OSError, ValueError):
        recorded = {}

    if "--invalidate" in sys.argv:
        names = sys.argv[sys.argv.index("--invalidate") + 1 :]
        unknown = [n for n in names if n not in current]
        if unknown or not names:
            print(f"unknown or missing query names: {unknown or '(none given)'}")
            return 1
        dropped = [n for n in names if recorded.pop(n, None) is not None]
        with open(FP_PATH, "w") as f:
            json.dump(dict(sorted(recorded.items())), f, indent=1)
        print(f"invalidated {len(dropped)}: {' '.join(dropped)}")
        return 0

    if "--print" in sys.argv:
        stale = sorted(
            n
            for n, fp in current.items()
            if recorded.get(n, {}).get("fp") != fp
        )
        print(f"{len(stale)} entries stale vs recorded fingerprints:")
        for n in stale:
            print(" ", n)
        return 0

    latest_round = max((rnd for rnd, _ in last.values()), default=-1)
    updated = 0
    for name, fp in current.items():
        rnd, green = last.get(name, (-1, False))
        if not green:
            continue
        rec = recorded.get(name)
        if rec is None:
            # first-time recording: the CURRENT fingerprint only
            # certifies the check if nothing was edited since it ran —
            # which the round-open ritual (run before any edits) only
            # guarantees for the just-closed round. An older green
            # check with no recorded fingerprint (bootstrap gap,
            # previously-dropped entry) must NOT be stamped with
            # post-edit content; leaving it unrecorded fails safe (the
            # rotation front-ranks it until its next driver check).
            if rnd == latest_round:
                recorded[name] = {"fp": fp, "round": rnd}
                updated += 1
        elif rnd > rec.get("round", -1):
            recorded[name] = {"fp": fp, "round": rnd}
            updated += 1
    # drop entries for queries no longer in the catalog
    gone = [n for n in recorded if n not in current]
    for n in gone:
        del recorded[n]
    with open(FP_PATH, "w") as f:
        json.dump(dict(sorted(recorded.items())), f, indent=1)
    print(
        f"updated {updated} fingerprints, dropped {len(gone)}; "
        f"{len(recorded)}/{len(current)} recorded"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
