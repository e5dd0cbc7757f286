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

When a report carries bench.py's "reprobe" map (standalone end-of-run
re-measurement of queries that regressed vs the previous record), the
reprobe value — and its reprobe_spread — are used for that query on
BOTH sides: a contention-inflated median that re-probed clean is not a
regression, and comparing against an old record's inflated median
would equally mask a real new regression.

Exit 1 if any regression passes all applicable bars.
"""

from __future__ import annotations

import json
import sys


def effective(doc: dict) -> tuple[dict, dict]:
    """(timings, spreads) with reprobe values substituted when present."""
    q = dict(doc["queries"])
    sp = dict(doc.get("spread", {}))
    for name, t in doc.get("reprobe", {}).items():
        q[name] = t
        sp[name] = doc.get("reprobe_spread", {}).get(name, sp.get(name, 0.0))
    return q, sp


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old, old_sp = effective(old_doc)
    new, new_sp = effective(new_doc)
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
            if q in new_doc.get("reprobe", {}):
                # survived a standalone re-probe: NOT box contention
                regressions[q]["confirmed_by_reprobe"] = True
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
