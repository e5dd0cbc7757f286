"""Golden + differential tests for the canonicalization/checksum kernel.

Mirrors the reference's unit-test focus on its algorithmic kernels
(reference: database/processor/compare_row_cmp_test.go) but pins the
canonical forms with hand-computed values AND cross-checks Spark vs
DuckDB emission on a typed edge-case table (FIXTURES.md F1 style).
"""

import datetime
import hashlib
from decimal import Decimal

import pytest
from pyspark.sql import functions as F, types as T

from dbms_spark.functions import canonical as C


@pytest.fixture(scope="module")
def typed_df(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("c_int", T.IntegerType()),
        T.StructField("c_dec", T.DecimalType(18, 2)),
        T.StructField("c_double", T.DoubleType()),
        T.StructField("c_str", T.StringType()),
        T.StructField("c_date", T.DateType()),
        T.StructField("c_ts", T.TimestampType()),
    ])
    rows = [
        (1, 0, Decimal("1.10"), 1.5, "abc", datetime.date(1970, 1, 1),
         datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)),
        (2, -7, Decimal("100.00"), 0.1, "", datetime.date(1999, 12, 31),
         datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (3, None, None, None, None, None, None),
        (4, 42, Decimal("-0.50"), -2.25, "x|#|y", datetime.date(2024, 2, 29),
         datetime.datetime(1970, 1, 1, 0, 0, 0)),
    ]
    return spark.createDataFrame(rows, schema)


def collect_canon(df):
    out = df.select("id", C.canonical_row(df, [c for c in df.columns if c != "id"]).alias("canon"))
    return {r["id"]: r["canon"] for r in out.collect()}


def test_canonical_golden(typed_df):
    got = collect_canon(typed_df)
    sep = C.SEP
    assert got[1] == sep.join(["0", "1.1", "1.5", "abc", "1970-01-01", "2024-01-02 03:04:05.123456"])
    assert got[2] == sep.join(["-7", "100", "0.1", "", "1999-12-31", "2024-01-02 03:04:05.000000"])
    assert got[3] == sep.join(["NULL"] * 6)
    assert got[4] == sep.join(["42", "-0.5", "-2.25", "x|#|y", "2024-02-29", "1970-01-01 00:00:00.000000"])


def test_empty_string_oracle_mode(typed_df):
    df = typed_df
    col = C.canon_column(F.col("c_str"), T.StringType(), oracle_empty_is_null=True)
    vals = {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}
    assert vals[1] == "abc"
    assert vals[2] is None  # '' == NULL in oracle mode
    assert vals[3] is None


def test_row_md5_matches_hashlib(typed_df):
    cols = [c for c in typed_df.columns if c != "id"]
    canon = collect_canon(typed_df)
    got = {
        r["id"]: r["h"]
        for r in typed_df.select("id", C.row_md5(typed_df, cols).alias("h")).collect()
    }
    for i, s in canon.items():
        assert got[i] == hashlib.md5(s.encode()).hexdigest()


def test_slice_sum_decimal_not_long(spark):
    # the aggregate type must survive sums far beyond 2^63
    df = spark.range(10).select(F.md5(F.col("id").cast("string")).alias("row_md5"))
    out = df.agg(*C.md5_slice_sum_aggs()).collect()[0]
    for i in range(4):
        assert isinstance(out[f"h{i}"], Decimal)


def test_duckdb_parity_on_typed_table(spark, typed_df, duck, tmp_path):
    """The same canonicalization emitted as DuckDB SQL must produce the
    identical checksum on identical data.  Transport through parquet —
    toPandas would lossily promote nullable ints to float64."""
    p = str(tmp_path / "typed_all.parquet")
    typed_df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE OR REPLACE VIEW typed_all_pd AS SELECT * FROM read_parquet('{p}/*.parquet')")
    cols = [c for c in typed_df.columns if c != "id"]
    spark_out = C.table_checksum(typed_df, cols).collect()[0]

    md5_sql = C.row_md5_sql(typed_df, cols)
    slices = ", ".join(C.md5_slice_sum_sql("row_md5"))
    duck_out = duck.sql(
        f"SELECT COUNT(*) AS cnt, {slices} FROM "
        f"(SELECT {md5_sql} AS row_md5 FROM typed_all_pd)"
    ).fetchall()[0]
    assert spark_out["cnt"] == duck_out[0]
    for i in range(4):
        assert spark_out[f"h{i}"] == duck_out[i + 1], f"slice h{i} mismatch"


def test_duckdb_parity_on_lineitem(spark, sf_dir, duck):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark_out = C.table_checksum(df).collect()[0]
    md5_sql = C.row_md5_sql(df)
    slices = ", ".join(C.md5_slice_sum_sql("row_md5"))
    duck_out = duck.sql(
        f"SELECT COUNT(*) AS cnt, {slices} FROM (SELECT {md5_sql} AS row_md5 FROM lineitem)"
    ).fetchall()[0]
    assert spark_out["cnt"] == duck_out[0]
    for i in range(4):
        assert spark_out[f"h{i}"] == duck_out[i + 1], f"slice h{i} mismatch"
