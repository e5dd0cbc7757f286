#!/usr/bin/env python3
"""The reference's core story end-to-end: migrate a table, corrupt the
target the way real cutovers get corrupted (a lost row, a mutated
value, a stray extra row), then run the one-verb acceptance —

    struct diff -> count/checksum compare -> per-key I/U/D worklist ->
    contract rules -> dialect repair SQL

Run:

    python examples/migrate_verify.py [sf_dir] [work_dir]

Prints one JSON line per phase; exits 1 if verification (correctly)
finds the corruption, 0 only on a clean target — the same contract as
`python -m dbms_spark verify`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.engine import DbmsEngine  # noqa: E402
from dbms_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str | None = None, work: str | None = None,
         spark=None) -> list[dict]:
    """Runs migrate->corrupt->verify->repair; returns the phase dicts
    it prints (the 'done' phase carries the clean verdict).  Pass an
    existing ``spark`` to reuse a session — only sessions created here
    are stopped."""
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    work = work or "/tmp/dbms_spark_migrate_verify"
    owned = spark is None
    if owned:
        spark = get_spark("migrate_verify_example")
    phases: list[dict] = []

    def emit(d: dict) -> None:
        phases.append(d)
        print(json.dumps(d))

    eng = DbmsEngine(spark)

    src = load_table(spark, sf_dir, "orders")

    # 1. "migrate": chunked write of the source into the target store
    from dbms_spark.operators.migrate import write_sorted_parquet

    tgt_path = os.path.join(work, "orders_target")
    write_sorted_parquet(src, tgt_path, ["o_orderkey"], num_files=8)
    emit({"phase": "migrate", "rows": spark.read.parquet(tgt_path).count()})

    # 2. corrupt the target: drop one row, mutate one value, add one row
    tgt = spark.read.parquet(tgt_path)
    some = [r["o_orderkey"] for r in tgt.select("o_orderkey").orderBy("o_orderkey")
            .limit(3).collect()]
    corrupted = (
        tgt.filter(F.col("o_orderkey") != some[0])                      # lost row
        .withColumn("o_totalprice",
                    F.when(F.col("o_orderkey") == some[1],
                           F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice")))
        .unionByName(tgt.filter(F.col("o_orderkey") == some[2])
                     .withColumn("o_orderkey", F.col("o_orderkey") + 900000000))
    )
    bad_path = os.path.join(work, "orders_corrupted")
    corrupted.write.mode("overwrite").parquet(bad_path)
    emit({"phase": "corrupt", "lost": some[0], "mutated": some[1],
          "extra_from": some[2]})

    # 3. one-verb acceptance
    dst = spark.read.parquet(bad_path)
    rep = eng.full_verify(src, dst, "orders", ["o_orderkey"], dialect="mysql")
    changes = {r["change_type"]: r["n"] for r in
               rep["key_diff"].groupBy("change_type")
               .agg(F.count(F.lit(1)).alias("n")).collect()} if "key_diff" in rep else {}
    emit({"phase": "verify", "struct_equal": rep["struct_equal"],
          "data_equal": rep["compare"].equal, "changes": changes})

    # 4. repair SQL the operator would apply to the target
    for stmt in (rep.get("fix_sql") or [])[:5]:
        emit({"phase": "repair_sql", "stmt": stmt})

    ok = rep["struct_equal"] and rep["compare"].equal
    emit({"phase": "done", "clean": ok})
    if owned:
        spark.stop()
    return phases


if __name__ == "__main__":
    out = main(sys.argv[1] if len(sys.argv) > 1 else None,
               sys.argv[2] if len(sys.argv) > 2 else None)
    sys.exit(0 if out[-1].get("clean") else 1)
