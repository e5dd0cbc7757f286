import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.sources.catalog import TABLES, table_path  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("dbms_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _norm_cell(v):
    import math
    from datetime import date, datetime
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize_rows(cols, rows):
    """Mimic the driver's order-insensitive, column-name-sorted compare:
    sort columns by name, stringify every cell, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(range(len(cols)), [cols[i] for i in order]))], out


def assert_parity(spark_df, duck_con, sql):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"column mismatch: {sorted(s_cols)} vs {sorted(d_cols)}"
    _, s_norm = normalize_rows(s_cols, s_rows)
    _, d_norm = normalize_rows(d_cols, d_rows)
    assert len(s_norm) == len(d_norm), f"row count: spark={len(s_norm)} duck={len(d_norm)}"
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"
