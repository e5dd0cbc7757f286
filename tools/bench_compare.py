#!/usr/bin/env python3
"""Diff two bench.py JSON reports and flag per-query regressions.

    python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints one JSON line: total delta, queries slower than ``threshold``x
(default 1.5), queries that disappeared/appeared.  A drift only counts
as a regression when it clears THREE bars at once:

  1. ratio:    t_new > t_old * threshold
  2. absolute: t_new - t_old > 0.25 s (local[32] jitter floor; a 2x
     regression on a 50 ms query is noise, on a 2 s query it's a
     plan change)
  3. spread:   t_new - t_old > old_spread + new_spread, when the
     reports carry bench.py's per-query "spread" map (steady-state
     |run2 - run3|) — the round-5 lesson: the box's ±12% run-to-run
     band drowned real deltas, so only above-noise drift is signal.

Exit 1 if any regression passes all applicable bars.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old, new = old_doc["queries"], new_doc["queries"]
    old_sp = old_doc.get("spread", {})
    new_sp = new_doc.get("spread", {})
    regressions = {}
    for q, t_new in new.items():
        t_old = old.get(q)
        if not t_old:
            continue
        delta = t_new - t_old
        noise = old_sp.get(q, 0.0) + new_sp.get(q, 0.0)
        if (t_new > t_old * threshold and delta > 0.25 and delta > noise):
            regressions[q] = {"old": t_old, "new": t_new,
                              "ratio": round(t_new / t_old, 2),
                              "noise_band": round(noise, 3)}
    report = {
        "old_total": round(sum(old.values()), 2),
        "new_total": round(sum(new.values()), 2),
        "common": len(set(old) & set(new)),
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "regressions": regressions,
    }
    print(json.dumps(report))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
