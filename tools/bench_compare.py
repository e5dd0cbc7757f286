#!/usr/bin/env python3
"""Diff two bench.py JSON reports and flag per-query regressions.

    python tools/bench_compare.py OLD.json[,OLD2.json...] NEW.json [threshold]

OLD may be several comma-separated records (e.g. the previous round
AND the one before): a drift only counts as a regression when it
clears the bars against EVERY old record that carries the query — a
noisy query whose one lucky-fast record would otherwise flag every
later honest measurement (the round-7 q41 lesson: its mid-round
median was the outlier, and the prior round's own record already
bracketed the "regressed" value).

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
    old_paths, new_path = sys.argv[1].split(","), sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_docs = [json.load(open(p)) for p in old_paths]
    new_doc = json.load(open(new_path))
    olds = [effective(d) for d in old_docs]
    old, old_sp = olds[0]     # headline totals/added/removed vs the first
    new, new_sp = effective(new_doc)
    regressions = {}
    for q, t_new in new.items():
        # regression only if it clears all three bars vs EVERY old
        # record carrying the query — a query absent from the FIRST
        # old record but present in a later one must still be judged
        # (verdicts stays empty only when NO old record carries it)
        verdicts = []
        for o, o_sp in olds:
            t_old = o.get(q)
            if not t_old:
                continue
            delta = t_new - t_old
            noise = o_sp.get(q, 0.0) + new_sp.get(q, 0.0)
            verdicts.append(t_new > t_old * threshold and delta > 0.25
                            and delta > noise)
        if verdicts and all(verdicts):
            # report against the first old record carrying the query
            t_old = next(o[q] for o, _ in olds if o.get(q))
            noise = old_sp.get(q, 0.0) + new_sp.get(q, 0.0)
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
