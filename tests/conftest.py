import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.sources.catalog import TABLES, table_path  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Oracle SQL text is generated at dbms_spark.queries import time; most
# of it derives only the SCHEMA from this dir (identical across SFs),
# but layout-metadata oracles (q138) embed its absolute paths — the
# suite compares at SF_DIR, so the oracle must read the same files.
# Must run before any test module imports dbms_spark.queries.
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


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
    """Stringify one pandas-transport cell FAITHFULLY.

    Crucially this does NOT strip timezones and does NOT unify Decimal
    with float: the driver hashes whatever pandas hands it, so a Spark
    ``Decimal('138014.00')`` vs a DuckDB ``float64 138014.0``, or a
    tz-aware vs naive timestamp, must FAIL here exactly as it fails in
    the driver (the round-1 gate normalized these away and diverged
    from the driver's verdict)."""
    import math
    from datetime import date, datetime
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return "Decimal:" + str(v)  # decimals must not survive to the transport
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")  # keeps tz offset if present -> tz bugs fail
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _pandas_norm(pdf):
    """Column-name-sorted, stringified, row-sorted form of a pandas frame
    (the driver's compare shape)."""
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    return list(pdf.columns), rows


def assert_parity(spark_df, duck_con, sql):
    """Differential gate through the DRIVER'S transport: Spark
    ``toPandas()`` vs DuckDB ``.df()`` — not collect()/fetchall(), which
    preserve Decimal objects on both sides and mask transport-type
    divergence (DuckDB's .df() coerces DECIMAL/HUGEINT to float64)."""
    s_pd = spark_df.toPandas()
    d_pd = duck_con.sql(sql).df()
    s_cols, s_norm = _pandas_norm(s_pd)
    d_cols, d_norm = _pandas_norm(d_pd)
    assert s_cols == d_cols, f"column mismatch: {s_cols} vs {d_cols}"
    assert len(s_norm) == len(d_norm), f"row count: spark={len(s_norm)} duck={len(d_norm)}"
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"row {i} differs (cols {s_cols}):\n  spark={a}\n  duck ={b}"
