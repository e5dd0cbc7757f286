#!/usr/bin/env python3
"""Per-query profiling aid for the optimization rounds.

Usage:
    python tools/profile_query.py q244 q192 [--plan-dir plans/r10 --suffix before]

For each query prefix: captures ``explain("formatted")`` into
``<plan-dir>/<prefix>_<suffix>.txt`` and times three noop-sink runs
(median + spread), printing one line per query.  Mirrors bench.py's
methodology (same session factory, same noop sink, same median-of-3)
so numbers here are comparable to BENCH_FULL.json entries.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_spark import get_spark  # noqa: E402
from dbms_spark import queries as Q  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", nargs="+", help="query prefixes, e.g. q244")
    ap.add_argument("--plan-dir", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-time", action="store_true",
                    help="capture plans only (skip timed runs)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_query")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()

    reg = {n.split("_", 1)[0]: (n, f) for n, f in Q.queries().items()}
    for p in args.prefixes:
        name, fn = reg[p]
        df = fn(spark, sf_dir)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plan_dir, f"{p}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(f"# {name} — explain('formatted'), {args.suffix}\n")
                f.write(buf.getvalue())
            print(f"{p}: plan -> {path}", file=sys.stderr)
        if args.no_time:
            continue
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile {p}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        # match bench.py: drop localCheckpoint blocks between queries
        it = (spark.sparkContext._jsc.getPersistentRDDs()
              .entrySet().iterator())
        while it.hasNext():
            it.next().getValue().unpersist(False)
        med = sorted(runs)[len(runs) // 2]
        print(f"{p} median={med:.3f} runs={[round(r, 3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
