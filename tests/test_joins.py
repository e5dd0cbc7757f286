"""As-of join, range join, sessionization semantics."""

import datetime

from pyspark.sql import functions as F

from dbms_spark.operators import joins as J


def ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_asof_backward(spark):
    left = spark.createDataFrame(
        [(1, ts(5)), (1, ts(10)), (1, ts(2)), (2, ts(7))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(3), 100.0), (1, ts(9), 200.0), (2, ts(8), 300.0)], "k int, t timestamp, v double"
    )
    out = J.asof_join(left, right, by="k", left_ts="t", right_ts="t", value_cols=["v"])
    got = {(r["k"], r["t"].minute): r["asof_v"] for r in out.collect()}
    assert got[(1, 5)] == 100.0     # latest right at-or-before :05 is :03
    assert got[(1, 10)] == 200.0    # :09
    assert got[(1, 2)] is None      # nothing before :02
    assert got[(2, 7)] is None      # right :08 is after


def test_asof_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, ts(5))], "k int, t timestamp")
    right = spark.createDataFrame([(1, ts(5), 9.0)], "k int, t timestamp, v double")
    out = J.asof_join(left, right, by="k", left_ts="t", right_ts="t", value_cols=["v"])
    assert out.collect()[0]["asof_v"] == 9.0


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, ts(5))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, ts(3), 1.0), (1, ts(8), 2.0), (1, ts(12), 3.0)], "k int, t timestamp, v double"
    )
    out = J.asof_join(left, right, by="k", left_ts="t", right_ts="t",
                      value_cols=["v"], direction="forward")
    assert out.collect()[0]["asof_v"] == 2.0  # earliest at-or-after :05


def test_range_join(spark):
    points = spark.createDataFrame([(1, 5), (2, 15), (3, 25), (4, 99)], "id int, x int")
    intervals = spark.createDataFrame(
        [(10, 0, 10), (20, 10, 30), (30, 90, 100)], "iid int, lo int, hi int"
    )
    out = J.range_join(points, intervals, "x", "lo", "hi", bucket_width=8)
    got = {r["id"]: r["iid"] for r in out.collect()}
    assert got == {1: 10, 2: 20, 3: 20, 4: 30}


def test_range_join_boundary_semantics(spark):
    # inclusive lo, exclusive hi
    points = spark.createDataFrame([(1, 10)], "id int, x int")
    intervals = spark.createDataFrame([(1, 0, 10), (2, 10, 20)], "iid int, lo int, hi int")
    out = J.range_join(points, intervals, "x", "lo", "hi", bucket_width=4).collect()
    assert len(out) == 1 and out[0]["iid"] == 2


def test_sessionize(spark):
    rows = [(1, ts(0)), (1, ts(10)), (1, ts(50)), (1, ts(55)), (2, ts(0))]
    df = spark.createDataFrame(rows, "user_id int, t timestamp")
    out = J.sessionize(df, "user_id", "t", gap_minutes=30)
    got = sorted((r["user_id"], r["t"].minute, r["session_id"]) for r in out.collect())
    assert got == [(1, 0, 1), (1, 10, 1), (1, 50, 2), (1, 55, 2), (2, 0, 1)]


def test_blocked_fuzzy_match_blocks_and_thresholds(spark):
    from dbms_spark.operators.linkage import blocked_fuzzy_match

    left = spark.createDataFrame([
        (1, "alice smith", "A", 100),
        (2, "bob jones", "B", 50),
    ], "id long, name string, blk string, amt long")
    right = spark.createDataFrame([
        (10, "alice smyth", "A", 101),   # 1 edit, same block -> match
        (11, "alice smith", "B", 100),   # identical name, WRONG block -> no match
        (12, "bob stones", "B", 50),     # 2 edits, same block -> match
        (13, "bob jones", "B", 999),     # numeric delta too large -> no match
    ], "id long, name string, blk string, amt long")
    got = {(r["l_id"], r["r_id"]) for r in blocked_fuzzy_match(
        left, right, ["blk"], "name", max_edit=2,
        numeric_col="amt", max_numeric_delta=10).collect()}
    assert got == {(1, 10), (2, 12)}
