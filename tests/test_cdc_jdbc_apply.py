"""Regression tests for the CDC-to-JDBC apply path: multi-table
routing, DDL barrier execution against the live target, and the
paren-aware createTableColumnTypes scoping."""

import pytest
from pyspark.sql import functions as F

from dbms_spark.sources import jdbc_exec as X
from dbms_spark.streaming import cdc

ROW_TYPES = {"ID": "bigint", "V": "string"}


def _batch(spark, rows):
    """rows: (table, qt, ts, key_json, new_json, is_ddl, ddl_query)."""
    return spark.createDataFrame(
        [("db", t, qt, ts, k, n, None, d, q) for t, qt, ts, k, n, d, q in rows],
        "schema_name string, table_name string, query_type string, "
        "commit_ts bigint, key_json string, new_json string, "
        "old_json string, is_ddl boolean, ddl_query string",
    )


@pytest.fixture()
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path / 'db'};create=true"
    X.execute(spark, url, [
        "CREATE TABLE APP.T1 (ID BIGINT NOT NULL PRIMARY KEY, V VARCHAR(16))",
        "CREATE TABLE APP.T2 (ID BIGINT NOT NULL PRIMARY KEY, V VARCHAR(16))",
    ])
    return url


def test_multi_table_feed_routes_only_target(spark, derby):
    """A feed carrying T1 and T2 events applied toward APP.T1 must not
    cross-apply T2's rows — and T2's event for the SAME key must not
    shadow T1's during terminal-event dedup."""
    batch = _batch(spark, [
        ("T1", "INSERT", 1, '{"ID": 1}', '{"ID": 1, "V": "t1a"}', False, None),
        ("T2", "INSERT", 2, '{"ID": 1}', '{"ID": 1, "V": "t2a"}', False, None),
        ("T2", "INSERT", 3, '{"ID": 9}', '{"ID": 9, "V": "t2b"}', False, None),
    ])
    out = cdc.apply_cdc_batch_jdbc(batch, derby, "APP.T1", ["ID"], ROW_TYPES)
    assert out["upserts"] == 1
    got = X.query(spark, derby, "SELECT ID, V FROM APP.T1")
    assert {(r[0], r[1]) for r in got} == {(1, "t1a")}
    assert X.query(spark, derby, "SELECT COUNT(*) FROM APP.T2")[0][0] == 0


def test_ddl_barrier_executes_on_target(spark, derby):
    """A DDL event splits the batch and executes (rewritten) against
    the live target between its DML segments — the parquet twin's
    C3/C7 semantics on the JDBC leg."""
    batch = _batch(spark, [
        ("T1", "INSERT", 1, '{"ID": 1}', '{"ID": 1, "V": "pre"}', False, None),
        ("T1", None, 2, None, None, True, "CREATE INDEX T1_V ON db.T1 (V)"),
        ("T1", "INSERT", 3, '{"ID": 2}', '{"ID": 2, "V": "post"}', False, None),
    ])
    out = cdc.apply_cdc_batch_jdbc(
        batch, derby, "APP.T1", ["ID"], ROW_TYPES,
        ddl_rules={"db.T1": "APP.T1"})
    assert out == {"deletes": 0, "upserts": 2, "ddls": 1}
    got = X.query(spark, derby, "SELECT ID, V FROM APP.T1")
    assert {(r[0], r[1]) for r in got} == {(1, "pre"), (2, "post")}
    # the index exists on the target (Derby catalog says so)
    n_idx = X.query(
        spark, derby,
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES WHERE CONGLOMERATENAME = 'T1_V'")
    assert n_idx[0][0] == 1


def test_split_type_specs_paren_aware():
    assert cdc._split_type_specs(
        "ID DECIMAL(20,0), NAME VARCHAR(64)") == [
        "ID DECIMAL(20,0)", "NAME VARCHAR(64)"]
    # trailing comma and spacing tolerated
    assert cdc._split_type_specs("A INT, ") == ["A INT"]
    assert cdc._split_type_specs("X NUMERIC(10, 2)") == ["X NUMERIC(10, 2)"]


def test_scoped_types_survive_decimal_args(spark, derby):
    """createTableColumnTypes carrying DECIMAL(p,s) must reach the
    delete-staging write intact for the key subset."""
    X.execute(spark, derby, [
        "CREATE TABLE APP.T3 (ID DECIMAL(20,0) NOT NULL PRIMARY KEY, V VARCHAR(16))",
        "INSERT INTO APP.T3 VALUES (5, 'stale')",
    ])
    batch = _batch(spark, [
        ("T3", "DELETE", 2, '{"ID": 5}', None, False, None),
    ])
    out = cdc.apply_cdc_batch_jdbc(
        batch, derby, "APP.T3", ["ID"], {"ID": "decimal(20,0)", "V": "string"},
        properties={"createTableColumnTypes": "ID DECIMAL(20,0), V VARCHAR(16)"})
    assert out["deletes"] == 1
    assert X.query(spark, derby, "SELECT COUNT(*) FROM APP.T3")[0][0] == 0
