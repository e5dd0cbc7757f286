#!/usr/bin/env python3
"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is materialized through the `noop` sink — full computation,
no collect/driver transfer, so the number measures the plan, not the
result shuttle.  A bare count() would let Catalyst prune the very
expressions under test.

Per-query numbers are the MEDIAN of three runs (run 1 doubles as
warm-up); BENCH_FULL.json additionally carries a per-query "spread"
map (|run2 - run3|, steady-state repeatability) so
tools/bench_compare.py can flag only above-noise drifts.

AUTO-REPROBE (round-6 judge ask #5): a shared box can inflate a
query's median through no fault of the plan — round 6 committed q40 at
7.03 s when a standalone re-probe measured 1.16 s, and adjudicating
that required a manual session.  So after the main sweep, any query
whose median regressed vs the PREVIOUS committed BENCH_FULL.json past
all three bench_compare bars (ratio > 1.5x, delta > 0.25 s, delta >
old_spread + new_spread) is re-run standalone at the very end, and
BENCH_FULL carries BOTH values: the original median under "queries"
and the re-probe median under "reprobe" (+ "reprobe_spread").
tools/bench_compare.py uses reprobe-when-present, so a
contention-inflated median that re-probes clean never reads as a
regression, while a REAL plan regression re-probes slow and still
trips the gate.

SPREAD-TRIGGERED REPROBE (round-7 judge ask #1): history comparison
alone lets an INTRA-RUN-noisy query slip through un-reprobed — round 7
committed q55 at 5.38 s (spread 4.00) and q04 at 3.52 s (spread 4.25,
exceeding the median itself!) because neither regressed vs the prior
record past the bars; the judge had to re-probe them manually.  So any
query whose own steady-state spread exceeds max(0.5 x median, 0.5 s)
is also re-probed standalone, regardless of history — the measurement
is self-evidently unstable, whatever the previous round said.  The
committed record therefore never carries a median with spread > 50%
and no reprobe value beside it.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbms_spark import get_spark  # noqa: E402
from dbms_spark import queries as Q  # noqa: E402


def flag_regressions(prev: dict, timings: dict[str, float],
                     spreads: dict[str, float]) -> list[str]:
    """Queries whose new median clears ALL THREE bench_compare bars vs
    the previous record (ratio > 1.5x, delta > 0.25 s, delta above the
    summed spread band).  The previous record's own reprobe values are
    its best estimate, so they substitute in before comparing."""
    prev_q = {**prev.get("queries", {}), **prev.get("reprobe", {})}
    prev_sp = {**prev.get("spread", {}), **prev.get("reprobe_spread", {})}
    flagged = []
    for q, t_new in timings.items():
        t_old = prev_q.get(q)
        if not t_old:
            continue
        delta = t_new - t_old
        noise = prev_sp.get(q, 0.0) + spreads.get(q, 0.0)
        if t_new > t_old * 1.5 and delta > 0.25 and delta > noise:
            flagged.append(q)
    return flagged


def flag_unstable(timings: dict[str, float],
                  spreads: dict[str, float]) -> list[str]:
    """Queries whose OWN run-to-run spread marks the median unstable:
    spread > max(0.5 x median, 0.5 s).  The relative bar catches the
    q55 shape (5.38 s median, 4.00 spread); the 0.5 s absolute floor
    keeps sub-second queries whose 0.1-vs-0.3 s jitter is harmless
    local[32] noise from triggering pointless re-runs."""
    return [q for q, t in timings.items()
            if spreads.get(q, 0.0) > max(0.5 * t, 0.5)]


def clear_persistent_rdds(spark) -> None:
    """Between-query cleanup, round 10: ``spark.catalog.clearCache()``
    only drops SQL-cache entries — ``localCheckpoint()`` blocks (the
    iterative operators and the streaming-store folds create them)
    stay in the BlockManager until the JVM-side RDD is GC'd, so a
    long bench session accumulates blocks and late queries pay the
    memory pressure of early ones (measured: q311 5.3 s in a session
    carrying prior store-gate blocks vs 4.6 s with the blocks
    dropped).  Same spirit as the existing clearCache+gc cleanup:
    queries must not bill each other."""
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # The driver requires EXACTLY ONE stdout line.  PySpark/JVM startup can
    # write chatter ("Setting default log level ...") straight to fd 1, so
    # point fd 1 at stderr for the whole run and keep a private dup of the
    # real stdout for the final JSON line.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    spark = get_spark("dbms_spark_bench")

    # one tiny warm-up action so JVM/codegen startup isn't billed to q01
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    # three runs per query, report the MEDIAN plus the steady-state
    # SPREAD (round-5 judge ask: the ±12% box band drowned real
    # per-query deltas, so round-over-round compares need a per-query
    # noise floor).  Run 1 doubles as the warm-up (one-off
    # codegen/python-worker spawn) — the median of three picks the
    # middle value, which lands on the steady state whenever run 1 is
    # the outlier; spread = |run2 - run3| measures steady-state
    # repeatability, deliberately excluding the warm-up run so it
    # gates regressions, not codegen cost.  tools/bench_compare.py
    # flags only drifts above old_spread + new_spread.
    # The driver captures only the TAIL of this process's output and parses
    # the final JSON line out of it.  With 150+ registered queries the full
    # "q41_avg_row_length_top"-style keys push the line past the capture
    # window and the driver records parsed=null (this happened in round 2).
    # Report under the short "q41" prefix instead — the long name's numeric
    # prefix is unique by construction in the registry.
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    only = os.environ.get("SPARK_GRAFT_BENCH_FILTER")  # "q01,q217" dev aid
    sel = [(n, f) for n, f in sorted(Q.queries().items())
           if not only or n.split("_", 1)[0] in only.split(",")]
    for i, (name, fn) in enumerate(sel):
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        short = name.split("_", 1)[0]
        timings[short] = round(sorted(runs)[1], 3)
        spreads[short] = round(abs(runs[1] - runs[2]), 3)
        # drop accumulated broadcast/plan state so a long run doesn't bill
        # later queries for earlier queries' GC pressure; a full System.gc()
        # on this heap costs real wall clock, so only every 10th query
        spark.catalog.clearCache()
        clear_persistent_rdds(spark)
        if i % 10 == 9:
            spark.sparkContext._jvm.System.gc()

    # ---- auto-reprobe (see module docstring) -------------------------
    # Compare against the previous committed record BEFORE we overwrite
    # it; the previous record's own reprobe values are its best estimate,
    # so compare against reprobe-when-present there too.
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip() or "default"
    reprobe: dict[str, float] = {}
    reprobe_spread: dict[str, float] = {}
    # Round-11 (judge ask #2): the record is PER CORE COUNT.  Round 10's
    # 8-core control run rewrote BENCH_FULL.json and clobbered the 32-core
    # session's per-query reprobe values, so the judge had to adjudicate a
    # 30 s q302 spike from three artifacts.  Compare against (and write to)
    # BENCH_FULL_c{N}.json; the unsuffixed BENCH_FULL.json stays as a
    # compat copy of the LAST run for existing tooling.
    prev_path = os.path.join(here, f"BENCH_FULL_c{cpus}.json")
    if not os.path.exists(prev_path):
        prev_path = os.path.join(here, "BENCH_FULL.json")
    if not only:
        prev = {}
        if os.path.exists(prev_path):
            try:
                prev = json.load(open(prev_path))
            except (json.JSONDecodeError, OSError):
                prev = {}
        by_short = {n.split("_", 1)[0]: f for n, f in sel}
        hist = flag_regressions(prev, timings, spreads)
        unstable = [q for q in flag_unstable(timings, spreads)
                    if q not in hist]
        flagged = hist + unstable
        if flagged:
            print(f"bench: re-probing {len(flagged)} queries standalone "
                  f"(vs-history: {hist}; spread-unstable: {unstable})",
                  file=sys.stderr)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        for q in flagged:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                by_short[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                runs.append(time.perf_counter() - t0)
            reprobe[q] = round(sorted(runs)[1], 3)
            reprobe_spread[q] = round(abs(runs[1] - runs[2]), 3)
            spark.catalog.clearCache()
            clear_persistent_rdds(spark)

    total = round(sum(timings.values()), 3)
    total_reprobed = round(sum(reprobe.get(q, t) for q, t in
                               timings.items()), 3)
    spark.stop()

    # Full per-query record to a file next to this script: the stdout
    # line is tail-window-truncated to the slowest ~120 entries, so the
    # judge/driver can diff EVERY query round-over-round from here.
    full = {"queries": timings, "spread": spreads, "sf": sf, "unit": "sec",
            "metric": "total_query_wall_seconds", "value": total,
            "n_queries": len(timings)}
    if reprobe:
        full["reprobe"] = reprobe
        full["reprobe_spread"] = reprobe_spread
        full["value_reprobed"] = total_reprobed
    # filtered dev runs must not clobber the committed full record
    if only:
        fnames = ["BENCH_FILTERED.json"]
    else:
        fnames = [f"BENCH_FULL_c{cpus}.json", "BENCH_FULL.json"]
    for fname in fnames:
        full_path = os.path.join(here, fname)
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
        print(f"bench: full per-query timings -> {full_path}", file=sys.stderr)

    # The driver captures only a ~3.9 KB TAIL of this process's output and
    # parses the final JSON line out of it (round 3: the line's FRONT was
    # clipped, losing the headline total).  Two defenses: (1) key order puts
    # "queries" first and metric/value last, so a front-clipped tail still
    # carries the totals; (2) if the line would crowd the window, keep only
    # the slowest-N per-query entries rather than letting the capture clip
    # arbitrarily.
    def render(qmap: dict[str, float], omitted: int) -> str:
        payload: dict = {"queries": qmap}
        if omitted:
            payload["queries_omitted"] = omitted
        if reprobe:
            # Round-11 (judge ask #2): PER-QUERY reprobe values in the
            # driver-visible line, not just the count — a q302-style
            # contention spike (raw 30.2 s, standalone re-probe 3.5 s)
            # must adjudicate itself from this one artifact.  Placed
            # before the totals so a front-clipped tail still carries
            # metric/value.
            payload["reprobe"] = reprobe
            payload["reprobed"] = len(reprobe)
            payload["value_reprobed"] = total_reprobed
        payload.update({"sf": sf, "unit": "sec",
                        "metric": "total_query_wall_seconds", "value": total})
        return json.dumps(payload) + "\n"

    line = render(timings, 0)
    # Shrink the per-query map until the line fits the driver's ~3.9 KB
    # tail capture window; the reprobe map is never dropped (it is the
    # adjudication record and is small — only flagged queries appear).
    if len(line) > 3000:
        for n_keep in range(120, 14, -15):
            slowest = dict(
                sorted(timings.items(), key=lambda kv: -kv[1])[:n_keep])
            line = render(slowest, len(timings) - len(slowest))
            if len(line) <= 3000:
                print(f"bench: JSON line exceeded tail window, kept slowest "
                      f"{n_keep} of {len(timings)} queries", file=sys.stderr)
                break
    os.write(real_stdout, line.encode())


if __name__ == "__main__":
    main()
