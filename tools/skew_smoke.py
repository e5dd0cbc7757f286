#!/usr/bin/env python3
"""Skew stress: measure salted vs unsalted aggregation and join wall
time on a Zipf-skewed key (one key owns ~half the rows).  Companion
evidence for plans/skew.py — prints one JSON line per case.

    python tools/skew_smoke.py [rows] [fanout]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402


def _stage_api(spark, suffix: str):
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{suffix}") as r:
        return json.load(r)


def _completed_stages(spark) -> set[tuple[int, int]]:
    return {(s["stageId"], s["attemptId"])
            for s in _stage_api(spark, "stages?status=COMPLETE")}


def _max_task_ms(spark, before: set[tuple[int, int]]) -> int:
    """Longest single task (executorRunTime ms) across the stages that
    completed since ``before`` — the straggler metric skew mitigation
    must bound: wall time hides a stuck reducer behind parallel
    neighbours, max-task-time doesn't."""
    worst = 0
    for sid, att in _completed_stages(spark) - before:
        try:
            d = _stage_api(spark, f"stages/{sid}/{att}/taskSummary?quantiles=1.0")
            worst = max(worst, int(d["executorRunTime"][0]))
        except Exception:
            pass  # stage evicted from the status store: skip
    return worst


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark("skew_smoke", extra_conf={"spark.ui.enabled": "true"})
    # AQE's skew mitigation would mask what we're measuring at the
    # operator level; the production answer is AQE on TOP of salting
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # ~50% of rows on key 0, the rest uniform over 10k keys
    skewed = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.hash("id"), 10_000)).alias("k"),
        (F.col("id") % 997).alias("v"),
    ).persist()
    skewed.count()

    def timed(name, df):
        before = _completed_stages(spark)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"case": name, "sec": wall,
                          "max_task_ms": _max_task_ms(spark, before)}),
              flush=True)

    from dbms_spark.plans.skew import salted_agg

    timed("agg_unsalted",
          skewed.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")))
    timed("agg_salted", salted_agg(skewed, ["k"], {"v": "sum"}))

    dim = spark.range(10_000).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    from dbms_spark.plans.skew import salted_join

    # force the shuffle join (broadcast would hide the skew entirely —
    # at real scale the dim side may be too big to broadcast)
    nb = dim.hint("shuffle_hash")
    timed("join_unsalted", skewed.join(nb, "k"))
    timed("join_salted", salted_join(skewed, dim, "k", n_salts=16))

    # -- dedup-side skew: a mega-cluster of identical docs -------------
    # fanout identical docs share one LSH bucket; full expansion mines
    # O(c²) pairs from it, the capped hub-star O(c).
    fanout = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    from dbms_spark.llm.dedup import (lsh_candidate_pairs,
                                      lsh_candidate_pairs_capped,
                                      minhash_signatures)

    n_docs = fanout * 5
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < fanout,
               F.lit("mirrored boilerplate page content served verbatim"))
        .otherwise(F.concat(F.lit("unique document body number "),
                            F.col("id").cast("string"),
                            F.lit(" with distinct tail words "),
                            (F.col("id") * 17).cast("string"))).alias("text"))
    sigs = minhash_signatures(docs).persist()
    sigs.count()
    t0 = time.perf_counter()
    n_full = lsh_candidate_pairs(sigs).count()
    t_full = round(time.perf_counter() - t0, 2)
    print(json.dumps({"case": "lsh_pairs_full", "cluster": fanout,
                      "pairs": n_full, "sec": t_full}), flush=True)
    t0 = time.perf_counter()
    n_cap = lsh_candidate_pairs_capped(sigs, bucket_cap=64).count()
    t_cap = round(time.perf_counter() - t0, 2)
    print(json.dumps({"case": "lsh_pairs_capped", "cluster": fanout,
                      "pairs": n_cap, "sec": t_cap}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
