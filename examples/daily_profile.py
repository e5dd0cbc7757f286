#!/usr/bin/env python3
"""Daily corpus profiling ledger: summarize once, answer forever —

    day 0: corpus -> persisted histogram sketches (global + per-source
                     n_chars distribution), HLL registers (doc NDV),
                     KMV bottom-k sketch (uniform distinct-doc sample)
    day N: batch  -> the SAME sketches over just the batch
           merge  -> elementwise SUM / register MAX / re-top-k — the
                     rolled-forward summaries are EXACTLY the sketches
                     of corpus + batch (lossless, proven in tests)
           report -> quantile drift (p50/p95 before vs after), NDV
                     growth, refreshed sample — all answered from the
                     <= nbins/64/k-row summary relations; the corpus
                     is read once, on day 0.

At 100 TB the profile queries a monitoring dashboard needs every day
(length percentiles per source, distinct-doc growth, a stable sample)
would each cost a full corpus scan; this ledger answers them from a
few hundred summary rows that roll forward with each batch.  Run:

    python examples/daily_profile.py [sf_dir] [work_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.operators.sketch import (  # noqa: E402
    hist_build, hist_by, hist_merge, hist_quantiles, hll_estimate,
    hll_merge, hll_registers, kmv_build, kmv_merge, kmv_ndv)
from dbms_spark.sources.catalog import load_table  # noqa: E402

_LO, _HI, _NBINS = 0.0, 2000.0, 50   # n_chars range of the documents table
_K = 64                              # KMV sample size


def main(sf_dir: str | None = None, work: str | None = None,
         spark=None) -> list[dict]:
    """Runs the profiling ledger flow; returns the stage dicts it
    prints.  Pass an existing ``spark`` to reuse a session — the
    function only stops sessions it created."""
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    work = work or tempfile.mkdtemp(prefix="profile_")
    owned = spark is None
    if owned:
        spark = get_spark("daily_profile")
    stages: list[dict] = []

    def emit(d: dict) -> None:
        stages.append(d)
        print(json.dumps(d))

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 <> 7")
    batch = docs.filter("doc_id % 10 = 7")

    # ---- day 0: ONE corpus read -> four persisted summaries ----------
    paths = {n: os.path.join(work, n)
             for n in ("hist", "hist_src", "hll", "kmv")}
    hist_build(corpus, "n_chars", _LO, _HI, _NBINS) \
        .write.mode("overwrite").parquet(paths["hist"])
    hist_by(corpus, "source", "n_chars", _LO, _HI, _NBINS) \
        .write.mode("overwrite").parquet(paths["hist_src"])
    hll_registers(corpus, "doc_id") \
        .write.mode("overwrite").parquet(paths["hll"])
    kmv_build(corpus, "doc_id", _K) \
        .write.mode("overwrite").parquet(paths["kmv"])
    day0_q = {f"p{int(r.p * 100)}": round(r.value, 1) for r in
              hist_quantiles(spark.read.parquet(paths["hist"]),
                             [0.5, 0.95], _LO, _HI, _NBINS).collect()}
    day0_ndv = hll_estimate(corpus, "doc_id").first().hll_est
    emit({"stage": "day0_summaries",
          "hist_rows": spark.read.parquet(paths["hist"]).count(),
          "hist_src_rows": spark.read.parquet(paths["hist_src"]).count(),
          "quantiles": day0_q, "ndv_estimate": int(day0_ndv)})

    # ---- day N: sketch the batch, merge — corpus never re-read -------
    merged_hist = hist_merge(
        spark.read.parquet(paths["hist"]),
        hist_build(batch, "n_chars", _LO, _HI, _NBINS))
    merged_src = hist_merge(
        spark.read.parquet(paths["hist_src"]),
        hist_by(batch, "source", "n_chars", _LO, _HI, _NBINS),
        group_col="source")
    merged_hll = hll_merge(
        spark.read.parquet(paths["hll"]), hll_registers(batch, "doc_id"))
    merged_kmv = kmv_merge(
        spark.read.parquet(paths["kmv"]), kmv_build(batch, "doc_id", _K),
        k=_K)
    for name, df in (("hist", merged_hist), ("hist_src", merged_src),
                     ("hll", merged_hll), ("kmv", merged_kmv)):
        df.write.mode("overwrite").parquet(paths[name] + "_next")
    emit({"stage": "rollforward",
          "batch_rows": batch.count(),
          "merged_hist_total": int(
              merged_hist.groupBy().sum("cnt").first()[0])})

    # ---- drift report: answered from the summary relations alone -----
    day1_q = {f"p{int(r.p * 100)}": round(r.value, 1) for r in
              hist_quantiles(spark.read.parquet(paths["hist"] + "_next"),
                             [0.5, 0.95], _LO, _HI, _NBINS).collect()}
    # register-MAX merge estimates the UNION's NDV — compare against a
    # direct sketch of corpus+batch to show the merge is lossless
    merged_est = _hll_est_from_registers(
        spark.read.parquet(paths["hll"] + "_next"))
    direct_est = hll_estimate(docs, "doc_id").first().hll_est
    sample_ndv = kmv_ndv(
        spark.read.parquet(paths["kmv"] + "_next"), _K).first().ndv_estimate
    emit({"stage": "drift_report",
          "day0_quantiles": day0_q, "day1_quantiles": day1_q,
          "ndv_day0": int(day0_ndv), "ndv_merged": int(merged_est),
          "ndv_direct": int(direct_est), "kmv_ndv": int(sample_ndv),
          "merge_lossless": bool(merged_est == direct_est)})
    if owned:
        spark.stop()
    return stages


def _hll_est_from_registers(registers):
    """Estimate from a persisted register relation — hll_estimate's
    exact BIGINT aggregation (it sketches raw rows; merged ledgers
    start from registers, which always carry all m buckets)."""
    from pyspark.sql import functions as F

    from dbms_spark.operators.sketch import _HLL_M, _HLL_WBITS

    num = 709 * _HLL_M * _HLL_M * (1 << (_HLL_WBITS + 1))
    return registers.agg(
        F.expr(f"CAST({num} DIV (1000 * SUM(CAST(POW(2, {_HLL_WBITS + 1}"
               f" - register) AS BIGINT))) AS BIGINT)").alias("e")).first().e


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         sys.argv[2] if len(sys.argv) > 2 else None)
