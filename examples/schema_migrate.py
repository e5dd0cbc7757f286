#!/usr/bin/env python3
"""The reference's STRUCT migration story end-to-end: harvest a source
schema (Oracle-ish declarations), map it through the datatype /
default-value rule tables, render target DDL — tables, sequences with
the cache-headroom START adjustment, index DDL — then diff against a
drifted "already migrated" target and emit the ALTER worklist
(columns, defaults, indexes, FK / check constraints, partitions).

Run:

    python examples/schema_migrate.py

Prints one JSON line per phase.  Everything here is rule DATA plus
DataFrame diffs — the same operators the q38/q48/q49/q179/q180 gates
hash-check against DuckDB.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.operators import structm as S  # noqa: E402


def main(spark=None) -> list[dict]:
    """Runs the struct-migration story; returns the phase dicts it
    prints.  Pass an existing ``spark`` to reuse a session — only
    sessions created here are stopped."""
    owned = spark is None
    if owned:
        spark = get_spark("schema_migrate_example", shuffle_partitions=8)
    phases: list[dict] = []

    def emit(phase: str, **kw) -> None:
        phases.append({"phase": phase, **kw})
        print(json.dumps({"phase": phase, **kw}))

    # -- 1. harvested source declarations (what GetDatabaseTableColumnInfo
    #       returns from DBA_TAB_COLUMNS) --------------------------------
    src_cols = [
        S.ColumnSpec("order_id", "NUMBER", precision=12, nullable=False),
        S.ColumnSpec("cust_name", "VARCHAR2", length=80, default="'unknown'"),
        S.ColumnSpec("amount", "NUMBER", precision=18, scale=2),
        S.ColumnSpec("created_at", "TIMESTAMP(6)", default="SYSDATE"),
        S.ColumnSpec("notes", "CLOB"),
    ]
    ddl = S.render_create_table("dwh.orders", src_cols)
    emit("table_ddl", ddl=ddl)

    # -- 2. sequences: START headroom + NOMAXVALUE ceiling --------------
    seqs = S.sequences_to_df(spark, "ODS", [
        S.SequenceSpec("seq_orders", last_number=987654, cache_size=100),
        S.SequenceSpec("seq_audit", last_number=42, cache_size=0,
                       max_value="99999999"),
    ])
    for r in S.sequence_migrate(seqs, "DWH", if_not_exists=True).collect():
        emit("sequence_ddl", name=r["sequence_name"], start=r["start_with"],
             ddl=r["ddl"])

    # -- 3. struct drift: the target someone half-migrated --------------
    dst_cols = [
        S.ColumnSpec("order_id", "NUMBER", precision=12, nullable=False),
        S.ColumnSpec("cust_name", "VARCHAR2", length=60),          # narrower + lost default
        S.ColumnSpec("amount", "NUMBER", precision=18, scale=2),
        S.ColumnSpec("created_at", "TIMESTAMP(6)", default="SYSDATE"),
        # notes column missing entirely
    ]
    diff = S.struct_compare(
        S.specs_to_df(spark, "orders", src_cols),
        S.specs_to_df(spark, "orders", dst_cols))
    for r in diff.collect():
        emit("column_drift", kind=r["kind"], column=r["col_name"],
             alter=r["alter_sql"])

    # -- 4. constraint drift: FK rule change + missing check ------------
    fk_src = S.fks_to_df(spark, "orders", [
        S.ForeignKeySpec("fk_ord_cust", ("cust_id",), "DWH", "customer",
                         ("cust_id",), delete_rule="CASCADE")])
    fk_dst = S.fks_to_df(spark, "orders", [
        S.ForeignKeySpec("fk_ord_cust", ("cust_id",), "DWH", "customer",
                         ("cust_id",))])                            # lost ON DELETE
    for r in S.fk_compare(fk_src, fk_dst, "DWH").collect():
        emit("fk_drift", kind=r["kind"], alter=r["alter_sql"])
    ck_src = S.checks_to_df(spark, "orders", [("ck_amount_pos", "(amount > 0)")])
    ck_dst = S.checks_to_df(spark, "orders", [])
    for r in S.check_compare(ck_src, ck_dst, "DWH").collect():
        emit("check_drift", kind=r["kind"], alter=r["alter_sql"])

    # -- 5. default-value translation rules -----------------------------
    emit("default_rules",
         sysdate=S.map_default_value("SYSDATE"),
         sys_guid=S.map_default_value("SYS_GUID()"))
    if owned:
        spark.stop()
    return phases


if __name__ == "__main__":
    main()
    sys.exit(0)
