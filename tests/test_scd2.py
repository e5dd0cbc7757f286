"""SCD2 history tracking: every CDC event becomes a version with a
validity interval; deletes close without replacement; storage reuses
the atomic bucket-manifest store."""

import json
import os

import pytest

from dbms_spark.streaming import cdc, scd2


def ev(table, qtype, ts, key, new=None, old=None):
    return (
        "db", table, qtype, ts,
        json.dumps(key) if key is not None else None,
        json.dumps(new) if new is not None else None,
        json.dumps(old) if old is not None else None,
        False, None,
    )


@pytest.fixture()
def hstore(spark, tmp_path):
    base = str(tmp_path / "scd2")
    os.makedirs(base)
    return scd2.Scd2TableStore(
        spark, base,
        schemas={"t1": "id bigint, v string"},
        key_cols={"t1": ["id"]},
    )


def test_scd2_kernel_chains_versions(spark):
    history = spark.createDataFrame([], scd2.scd2_schema("id bigint, v string"))
    events = spark.createDataFrame([
        ev("t1", "INSERT", 1, {"id": 1}, {"id": 1, "v": "a"}),
        ev("t1", "UPDATE", 5, {"id": 1}, {"id": 1, "v": "b"}),
        ev("t1", "UPDATE", 9, {"id": 1}, {"id": 1, "v": "c"}),
        ev("t1", "INSERT", 2, {"id": 2}, {"id": 2, "v": "x"}),
        ev("t1", "DELETE", 7, {"id": 2}),
    ], cdc.CDC_EVENT_SCHEMA)
    out = scd2.scd2_apply(history, events, ["id"], "id bigint, v string")
    rows = sorted((r["id"], r["valid_from"], r["valid_to"], r["is_current"], r["v"])
                  for r in out.collect())
    assert rows == [
        (1, 1, 5, False, "a"),
        (1, 5, 9, False, "b"),
        (1, 9, None, True, "c"),
        (2, 2, 7, False, "x"),   # closed by the DELETE, no successor
    ]


def test_scd2_closes_prior_history(spark):
    history = spark.createDataFrame(
        [(1, "old", 0, None, True), (3, "keep", 0, None, True)],
        scd2.scd2_schema("id bigint, v string"),
    )
    events = spark.createDataFrame([
        ev("t1", "UPDATE", 10, {"id": 1}, {"id": 1, "v": "new"}),
    ], cdc.CDC_EVENT_SCHEMA)
    out = {(r["id"], r["valid_from"]): r for r in
           scd2.scd2_apply(history, events, ["id"], "id bigint, v string").collect()}
    assert out[(1, 0)]["valid_to"] == 10 and out[(1, 0)]["is_current"] is False
    assert out[(1, 10)]["is_current"] is True and out[(1, 10)]["v"] == "new"
    assert out[(3, 0)]["is_current"] is True  # untouched key untouched


def test_scd2_store_end_to_end(hstore, spark):
    b1 = spark.createDataFrame([
        ev("t1", "INSERT", 1, {"id": 1}, {"id": 1, "v": "a"}),
        ev("t1", "INSERT", 2, {"id": 2}, {"id": 2, "v": "x"}),
    ], cdc.CDC_EVENT_SCHEMA)
    hstore.apply_dml("t1", b1)
    b2 = spark.createDataFrame([
        ev("t1", "UPDATE", 8, {"id": 1}, {"id": 1, "v": "b"}),
        ev("t1", "DELETE", 9, {"id": 2}),
    ], cdc.CDC_EVENT_SCHEMA)
    hstore.apply_dml("t1", b2)
    hist = sorted((r["id"], r["valid_from"], r["valid_to"], r["is_current"])
                  for r in hstore.read("t1").collect())
    assert hist == [(1, 1, 8, False), (1, 8, None, True), (2, 2, 9, False)]
    # live snapshot = current versions, row columns only
    assert {(r["id"], r["v"]) for r in hstore.current("t1").collect()} == {(1, "b")}
    # replay is a no-op (watermark guard)
    hstore.apply_dml("t1", b2)
    assert hstore.read("t1").count() == 3


def test_scd2_rename_ddl_preserves_history(hstore, spark):
    """RENAME COLUMN through the inherited DDL path must rewrite the
    history buckets WITH the validity metadata intact."""
    hstore.apply_dml("t1", spark.createDataFrame([
        ev("t1", "INSERT", 1, {"id": 1}, {"id": 1, "v": "a"}),
        ev("t1", "UPDATE", 5, {"id": 1}, {"id": 1, "v": "b"}),
    ], cdc.CDC_EVENT_SCHEMA))
    hstore.execute_ddl("ALTER TABLE t1 RENAME COLUMN v TO label")
    hist = sorted((r["label"], r["valid_from"], r["valid_to"], r["is_current"])
                  for r in hstore.read("t1").collect())
    assert hist == [("a", 1, 5, False), ("b", 5, None, True)]
