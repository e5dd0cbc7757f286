"""Randomized cross-engine fuzz of the canonicalization kernel.

One seeded batch of adversarial rows (NULLs everywhere, empty strings,
quotes, separators, unicode, extreme decimals/dates/timestamps) is
written to parquet and checksummed by BOTH engines via the dual
emission; the slice sums must agree exactly.  This is the property
form of SURVEY §5(c): if the canonical spec diverges for any value
class, a commutative sum over 2000 rows will not survive by luck.
"""

import datetime
import random
from decimal import Decimal

from pyspark.sql import types as T

from dbms_spark.functions import canonical as C

SEED = 20260813
N = 2000


def _random_rows():
    rng = random.Random(SEED)
    weird_strings = [
        "", " ", "NULL", "null", C.SEP, "a|#|b", "O'Neil", 'he said "hi"',
        "tab\there", "newline\\n", "héllo wörld", "中文字符", "emoji \U0001f600",
        "trailing space ", " leading", "0", "-0", "1.10",
    ]
    weird_doubles = [
        float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
        1e30, -3.7e33, 9.9e37, 1.00001e38, -4.2e120, 1.5e300, 1e-30,
    ]
    rows = []
    for i in range(N):
        def maybe(v):
            return None if rng.random() < 0.15 else v

        rows.append((
            i,
            maybe(rng.randint(-128, 127)),
            maybe(rng.randint(-(2**62), 2**62)),
            maybe(Decimal(rng.randint(-10**12, 10**12)).scaleb(-2)),
            maybe(Decimal(rng.randint(-10**9, 10**9)).scaleb(-6)),
            maybe(rng.choice(weird_doubles) if rng.random() < 0.2
                  else round(rng.uniform(-1e6, 1e6), rng.randint(0, 4))),
            maybe(rng.choice(weird_strings) if rng.random() < 0.5
                  else "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 30)))),
            maybe(datetime.date(rng.randint(1970, 2100), rng.randint(1, 12), rng.randint(1, 28))),
            maybe(datetime.datetime(
                rng.randint(1970, 2100), rng.randint(1, 12), rng.randint(1, 28),
                rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59),
                rng.randint(0, 999999))),
            maybe(rng.random() < 0.5),
        ))
    return rows


SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("c_tiny", T.IntegerType()),
    T.StructField("c_big", T.LongType()),
    T.StructField("c_dec2", T.DecimalType(18, 2)),
    T.StructField("c_dec6", T.DecimalType(18, 6)),
    T.StructField("c_double", T.DoubleType()),
    T.StructField("c_str", T.StringType()),
    T.StructField("c_date", T.DateType()),
    T.StructField("c_ts", T.TimestampType()),
    T.StructField("c_bool", T.BooleanType()),
])


def test_fuzz_checksum_parity(spark, duck, tmp_path):
    df = spark.createDataFrame(_random_rows(), SCHEMA)
    p = str(tmp_path / "fuzz.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    view = f"(SELECT * FROM read_parquet('{p}/*.parquet'))"

    cols = [c for c in df.columns if c != "id"]
    back = spark.read.parquet(p)
    spark_out = C.table_checksum(back, cols).collect()[0]

    md5_sql = C.row_md5_sql(back, cols)
    slices = ", ".join(C.md5_slice_sum_sql("row_md5"))
    duck_out = duck.sql(
        f"SELECT COUNT(*) AS cnt, {slices} FROM (SELECT {md5_sql} AS row_md5 FROM {view} t)"
    ).fetchall()[0]

    assert spark_out["cnt"] == duck_out[0] == N
    for i in range(4):
        assert spark_out[f"h{i}"] == duck_out[i + 1], f"slice h{i} diverged"


def test_fuzz_checksum_parity_oracle_null_mode(spark, duck, tmp_path):
    """Same property under oracle '' == NULL semantics."""
    df = spark.createDataFrame(_random_rows(), SCHEMA)
    p = str(tmp_path / "fuzz2.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    view = f"(SELECT * FROM read_parquet('{p}/*.parquet'))"

    cols = [c for c in df.columns if c != "id"]
    back = spark.read.parquet(p)
    spark_out = C.table_checksum(back, cols, oracle_empty_is_null=True).collect()[0]
    md5_sql = C.row_md5_sql(back, cols, oracle_empty_is_null=True)
    slices = ", ".join(C.md5_slice_sum_sql("row_md5"))
    duck_out = duck.sql(
        f"SELECT COUNT(*) AS cnt, {slices} FROM (SELECT {md5_sql} AS row_md5 FROM {view} t)"
    ).fetchall()[0]
    for i in range(4):
        assert spark_out[f"h{i}"] == duck_out[i + 1], f"slice h{i} diverged (oracle mode)"
