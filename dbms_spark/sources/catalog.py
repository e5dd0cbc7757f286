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


#: METADATA memos (round 10, guide §1/§6: schema inference is pure
#: per-call overhead).  ``spark.read.parquet(p)`` re-reads footers and
#: re-infers the schema on EVERY call (~90 ms on this box vs ~16 ms
#: with an explicit schema), and the bench bills query construction to
#: every timed run — across ~500 load_table calls per registry pass
#: that inference is a material fixed cost.  The memo caches only
#: METADATA (schema + ns-column list, keyed by path/mtime/size so a
#: rewritten file invalidates) and the constructed DataFrame *plan*
#: (keyed additionally by Spark application id so plans never leak
#: across sessions).  Execution always re-reads the parquet bytes —
#: nothing about results is cached.
_META_MEMO: dict[tuple, tuple] = {}
_DF_MEMO: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table; nanosecond timestamps are read via the
    legacy long path and truncated to microseconds (Spark's native
    precision — matches DuckDB's ns->us cast truncation)."""
    from pyspark.sql import functions as F

    p = table_path(sf_dir, name)
    st = os.stat(p)
    fkey = (p, st.st_mtime_ns, st.st_size)
    dkey = (spark.sparkContext.applicationId, *fkey)
    df = _DF_MEMO.get(dkey)
    if df is not None:
        return df
    meta = _META_MEMO.get(fkey)
    if meta is None:
        ns_cols = _nanos_timestamp_cols(p)
        if ns_cols:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # infer once per file version; identical to what every
        # subsequent read.schema(...) call would have inferred
        schema = spark.read.parquet(p).schema
        meta = _META_MEMO[fkey] = (schema, ns_cols)
    schema, ns_cols = meta
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(schema).parquet(p)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    _DF_MEMO[dkey] = df
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
