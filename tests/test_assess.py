"""Unit tests for the assessment aggregation pack (operators/assess.py);
the bulk of the pack is exercised end-to-end by the differential gates
(q41-q47, q60-q63, q181-q184 in test_queries_parity)."""


def test_assessment_pack2(spark):
    """Generic name-length operator + index-count / code-object /
    partition-type rollups (assess_migrate.go:415-1036)."""
    from dbms_spark.operators.assess import (
        code_object_summary, index_counts_over_limit,
        object_name_length_over_limit, partition_type_counts)

    names = spark.createDataFrame(
        [("short",), ("a_very_long_index_name",)], "object_name string")
    over = object_name_length_over_limit(names, "object_name", "INDEX", 10).collect()
    assert [(r["object_type"], r["object_name"], r["name_length"]) for r in over] == \
        [("INDEX", "a_very_long_index_name", 22)]

    idx = spark.createDataFrame(
        [("t1", "i1"), ("t1", "i2"), ("t1", "i3"), ("t2", "i4")],
        "table_name string, index_name string")
    oc = index_counts_over_limit(idx, limit=2).collect()
    assert [(r["table_name"], r["index_counts"]) for r in oc] == [("t1", 3)]

    code = spark.createDataFrame(
        [("p", "PROCEDURE", 10), ("q", "PROCEDURE", 30), ("f", "FUNCTION", 5)],
        "object_name string, object_type string, lines bigint")
    summ = {r["object_type"]: r for r in code_object_summary(code).collect()}
    assert summ["PROCEDURE"]["n_objects"] == 2
    assert summ["PROCEDURE"]["total_lines"] == 40
    assert summ["PROCEDURE"]["max_lines"] == 30

    parts = spark.createDataFrame(
        [("a", "RANGE", "p1", "x"), ("a", "RANGE", "p2", "y"), ("b", "HASH", "h0", "0")],
        "table_name string, partition_type string, partition_name string, high_value string")
    pt = {r["partition_type"]: r["n_tables"] for r in partition_type_counts(parts).collect()}
    assert pt == {"RANGE": 1, "HASH": 1}   # tables, not partitions
