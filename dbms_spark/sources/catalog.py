"""Parquet-backed table catalog.

The reference discovers schemas dynamically from RDBMS dictionaries
(reference: database/oracle/struct_migrate.go, 1479 LoC of catalog
queries) and freezes them per task.  For the self-contained engine the
catalog is a directory of parquet tables; schema discovery is free via
the parquet footer and column pruning / predicate pushdown reach the
scan natively.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark refuses them
    by default (PARQUET_TYPE_ILLEGAL).  Footer-only read, driver-side."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    out = []
    schema = pq.read_schema(path)
    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            out.append(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table; nanosecond timestamps are read via the
    legacy long path and truncated to microseconds (Spark's native
    precision — matches DuckDB's ns->us cast truncation)."""
    from pyspark.sql import functions as F

    p = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_cols(p)
    if not ns_cols:
        return spark.read.parquet(p)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(p)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every corpus table as a temp view (mirrors the DuckDB
    oracle's pre-registered views so SQL text can be shared)."""
    for name in tables or TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def filter_tables(names: list[str], include: list[str] | None, exclude: list[str] | None) -> list[str]:
    """Glob include/exclude table filter.

    Capability parity with the reference's table filter
    (reference: utils/filter/filter.go:25-40 Parse/MatchTable) — driver-side
    metadata work, so plain fnmatch is the right tool (no Spark job).
    """
    out = names
    if include:
        out = [n for n in out if any(fnmatch.fnmatch(n, pat) for pat in include)]
    if exclude:
        out = [n for n in out if not any(fnmatch.fnmatch(n, pat) for pat in exclude)]
    return out
