"""Catalog loading — especially the nanosecond-timestamp path that
Spark 4 refuses natively (events.parquet is timestamp[ns])."""

from pyspark.sql import types as T

from dbms_spark.functions import canonical as C
from dbms_spark.sources.catalog import filter_tables, load_table


def test_events_timestamp_loads(spark, sf_dir):
    """events.ts must load as a (µs-precision) timestamp regardless of
    how the corpus stores it: timestamp[ns] (legacy-long + truncate
    path) or timestamp[us] naive (read natively, as NTZ)."""
    df = load_table(spark, sf_dir, "events")
    ts_type = dict((f.name, f.dataType) for f in df.schema.fields)["ts"]
    assert isinstance(ts_type, (T.TimestampType, T.TimestampNTZType))
    assert df.count() > 0


def test_events_ns_truncation_matches_duckdb(spark, sf_dir, duck):
    """ns→µs truncation must equal DuckDB's TIMESTAMP_NS→TIMESTAMP cast,
    else every canonical checksum over events diverges."""
    df = load_table(spark, sf_dir, "events")
    spark_out = C.table_checksum(df, ["event_id", "ts"]).collect()[0]
    md5_sql = C.row_md5_sql(df.select("event_id", "ts"))
    slices = ", ".join(C.md5_slice_sum_sql("row_md5"))
    duck_out = duck.sql(
        f"SELECT COUNT(*) AS cnt, {slices} FROM "
        f"(SELECT md5(concat_ws('{C.SEP}', COALESCE(CAST(event_id AS VARCHAR), 'NULL'), "
        f"COALESCE(strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f'), 'NULL'))) AS row_md5 FROM events)"
    ).fetchall()[0]
    assert spark_out["cnt"] == duck_out[0]
    for i in range(4):
        assert spark_out[f"h{i}"] == duck_out[i + 1], f"slice h{i} mismatch: {md5_sql}"


def test_filter_tables():
    names = ["orders", "lineitem", "events"]
    assert filter_tables(names, ["*e*"], None) == ["orders", "lineitem", "events"]
    assert filter_tables(names, ["line*"], None) == ["lineitem"]
    assert filter_tables(names, None, ["events"]) == ["orders", "lineitem"]
    assert filter_tables(names, ["*"], ["*s"]) == ["lineitem"]
