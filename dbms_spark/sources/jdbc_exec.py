"""Driver-side JDBC statement execution over the Spark JVM gateway.

The reference's migrate/consume loops interleave bulk data movement
with SMALL control statements on the target — CREATE/DROP, MERGE from
a staged batch, DELETE-by-key, metadata queries (reference:
database/processor/stmt_migrate_row.go:206-304 batched apply;
consumer.go:670-807 upsert/delete statements).  In the Spark
re-expression the bulk legs run through ``spark.read.jdbc`` /
``df.write.jdbc`` on EXECUTORS (one connection per task, the scale
path), while these control statements are driver-side one-offs on a
single ``java.sql.DriverManager`` connection obtained through the
session's JVM — no extra Python driver, no row data through py4j.

Scale contract: everything here is O(statements), never O(rows).  The
only row-bearing helper, :func:`execute_batch`, is for TEST SEEDING
and tiny key lists (e.g. a handful of delete-by-key rows); bulk
writes must go through ``operators.migrate.write_jdbc``.

Works against any JDBC driver on the Spark classpath; exercised
end-to-end in-repo against embedded Apache Derby (shipped with Spark
for the Hive metastore), which executes real DDL, batched inserts,
partition-predicate reads and ANSI MERGE in one JVM.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def jdbc_connection(spark: SparkSession, url: str):
    """One driver-side JDBC connection (context-managed)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        yield conn
    finally:
        conn.close()


def execute(spark: SparkSession, url: str, statements: list[str]) -> list[int]:
    """Run DDL/DML statements sequentially on one connection; returns
    each statement's update count (0 for DDL)."""
    counts = []
    with jdbc_connection(spark, url) as conn:
        st = conn.createStatement()
        try:
            for sql in statements:
                counts.append(st.executeUpdate(sql))
        finally:
            st.close()
    return counts


def execute_batch(spark: SparkSession, url: str, sql: str,
                  rows: list[tuple]) -> int:
    """Prepared-statement batch (positional ``?`` placeholders), one
    addBatch per row, single executeBatch — the reference's prepared
    insert/delete batch shape.  Driver-side: keep ``rows`` small."""
    with jdbc_connection(spark, url) as conn:
        ps = conn.prepareStatement(sql)
        try:
            # NULLs must be bound with the column's REAL SQL type —
            # Derby rejects setNull(i, Types.NULL) outright
            pmd = ps.getParameterMetaData()
            ptypes = {i: pmd.getParameterType(i)
                      for i in range(1, pmd.getParameterCount() + 1)}
            for row in rows:
                for i, v in enumerate(row, start=1):
                    if v is None:
                        ps.setNull(i, ptypes[i])
                    else:
                        ps.setObject(i, v)
                ps.addBatch()
            return sum(ps.executeBatch())
        finally:
            ps.close()


def query(spark: SparkSession, url: str, sql: str) -> list[tuple]:
    """Small metadata/verification query, fetched driver-side as
    Python tuples.  For table-sized reads use ``spark.read.jdbc``."""
    with jdbc_connection(spark, url) as conn:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            ncols = rs.getMetaData().getColumnCount()
            out = []
            while rs.next():
                out.append(tuple(rs.getObject(i) for i in range(1, ncols + 1)))
            return out
        finally:
            st.close()


def table_exists(spark: SparkSession, url: str, schema: str, table: str) -> bool:
    """Catalog probe via JDBC DatabaseMetaData (dialect-neutral)."""
    with jdbc_connection(spark, url) as conn:
        rs = conn.getMetaData().getTables(None, schema, table, None)
        return rs.next()
