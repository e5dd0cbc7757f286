"""Differential gate rehearsal: every registered query must match its
DuckDB oracle exactly (column names, row multiset, stringified values)
— the same comparison shape the driver applies at sf0.01."""

import pytest

from dbms_spark import queries as Q
from tests.conftest import assert_parity

NAMES = sorted(Q.queries())


def test_registry_shape():
    qs, os_ = Q.queries(), Q.oracle_sql()
    assert qs, "registry must not be empty"
    for k in os_:
        assert k in qs


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    fn = Q.queries()[name]
    sql = Q.oracle_sql().get(name)
    df = fn(spark, sf_dir)
    assert df is not None
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_parity(df, duck, sql)
