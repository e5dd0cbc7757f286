#!/usr/bin/env python3
"""Diff two bench.py JSON reports and flag per-query regressions.

    python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints one JSON line: total delta, queries slower than ``threshold``x
(default 1.5), queries that disappeared/appeared.  Exit 1 if any
regression exceeds the threshold AND is slower by >0.25 s absolute
(local[32] timings jitter; a 2x regression on a 50 ms query is
noise, on a 2 s query it's a plan change).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    regressions = {}
    for q, t_new in new.items():
        t_old = old.get(q)
        if t_old and t_new > t_old * threshold and t_new - t_old > 0.25:
            regressions[q] = {"old": t_old, "new": t_new,
                              "ratio": round(t_new / t_old, 2)}
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
