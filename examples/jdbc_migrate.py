#!/usr/bin/env python3
"""The reference's live migrate loop against a REAL JDBC database —
executable in this repo with zero setup because Spark ships Apache
Derby (its Hive-metastore engine) on every classpath:

    seed source table -> plan chunk boundaries from statistics ->
    chunk-predicate partitioned read (one remote range scan per task)
    -> transform -> stage on the target via the executor JDBC sink ->
    ONE set-based MERGE apply -> checksum-verify target vs source

Swap the URL for jdbc:mysql://... / jdbc:postgresql://... (driver jar
on spark.jars) and the same code runs against a production pair —
that is the point of the exercise (reference:
database/oracle/data_migrate.go:350-465 chunked extract,
database/processor/stmt_migrate_row.go:206-304 batched apply).

Run:

    python examples/jdbc_migrate.py [work_dir]

Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.operators.compare import compare_table  # noqa: E402
from dbms_spark.operators.migrate import jdbc_upsert  # noqa: E402
from dbms_spark.plans import chunker as CH  # noqa: E402
from dbms_spark.sources import jdbc as J  # noqa: E402
from dbms_spark.sources import jdbc_exec as X  # noqa: E402


def main(work: str | None = None, spark=None) -> list[dict]:
    """Runs the JDBC seed->chunked-read->merge->verify demo on an
    embedded Derby DB; returns the phase dicts it prints.  Pass an
    existing ``spark`` to reuse a session — only sessions created here
    are stopped."""
    work = work or tempfile.mkdtemp(prefix="jdbc_demo_")
    url = f"jdbc:derby:{os.path.join(work, 'db')};create=true"
    owned = spark is None
    if owned:
        spark = get_spark("jdbc_migrate_example")
    phases: list[dict] = []

    def emit(d: dict) -> None:
        phases.append(d)
        print(json.dumps(d))

    # -- seed a source table -------------------------------------------
    X.execute(spark, url, [
        "CREATE TABLE APP.ORDERS_SRC ("
        "ID BIGINT NOT NULL PRIMARY KEY, REGION VARCHAR(16), CENTS BIGINT)",
    ])
    X.execute_batch(
        spark, url, "INSERT INTO APP.ORDERS_SRC VALUES (?, ?, ?)",
        [(i, ["eu", "us", "ap"][i % 3], i * 137) for i in range(2_000)])
    emit({"phase": "seed", "rows": 2000})

    # -- plan chunks, read partitioned ---------------------------------
    src = J.JdbcSource(url=url, table="APP.ORDERS_SRC", fetch_size=1000)
    whole = J.read_query(spark, src, "SELECT ID, REGION, CENTS FROM APP.ORDERS_SRC")
    plan = CH.plan_chunks(whole, ["ID"], n_chunks=8)
    preds = CH.predicates(plan, dialect="derby")
    df = J.read_partitioned(spark, src, preds)
    emit({"phase": "chunked_read", "chunks": len(preds),
          "partitions": df.rdd.getNumPartitions(),
          "rows": df.count()})

    # -- transform + MERGE apply onto the target -----------------------
    X.execute(spark, url, [
        "CREATE TABLE APP.ORDERS_TGT ("
        "ID BIGINT NOT NULL PRIMARY KEY, REGION VARCHAR(16), CENTS BIGINT)",
    ])
    batch = df.select("ID", "REGION", (F.col("CENTS") + 1).alias("CENTS"))
    affected = jdbc_upsert(
        batch, url, "APP.ORDERS_TGT", "APP.ORDERS_STG", ["ID"],
        num_partitions=8,
        properties={"createTableColumnTypes": "REGION VARCHAR(16)"})
    emit({"phase": "merge_apply", "affected": affected})

    # -- verify: checksum target against the expected frame ------------
    got = spark.read.jdbc(url=url, table="APP.ORDERS_TGT", properties={})
    rep = compare_table(got, batch)
    emit({"phase": "verify", "equal": rep.equal,
          "src_rows": rep.src_cnt, "dst_rows": rep.dst_cnt})
    if owned:
        spark.stop()
    return phases


if __name__ == "__main__":
    out = main(sys.argv[1] if len(sys.argv) > 1 else None)
    sys.exit(0 if out[-1].get("equal") else 1)
