"""Assessment aggregation pack.

The reference builds an AWR-like compatibility report from ~40
dictionary aggregations (reference: database/oracle/assess_migrate.go:
248-1160 — object counts by type, TOP-N tables by rows/size, datatype
distributions, partition/constraint breakdowns; assembled into HTML at
database/oracle/taskflow/assess_detail.go:29-1394).  Against a parquet
catalog the same report is a handful of DataFrame aggregations over
data + footer metadata.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_spark.sources.catalog import TABLES, load_table, table_path


def table_overview(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> DataFrame:
    """Per-table: rows, columns, on-disk bytes — the A7 stats block.
    Row counts come from parquet footers when trustworthy; here we
    count via Spark to exercise the scan path."""
    import pyarrow.parquet as pq

    tables = tables or [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
    rows = []
    for t in tables:
        p = table_path(sf_dir, t)
        meta = pq.read_metadata(p)
        rows.append((t, meta.num_rows, meta.num_columns, os.path.getsize(p)))
    return spark.createDataFrame(
        rows, "table_name string, num_rows long, num_cols int, size_bytes long"
    )


def top_tables_by_rows(spark: SparkSession, sf_dir: str, n: int = 5) -> DataFrame:
    """TOP-N assessment query (reference: GetDatabaseSchemaTableRowsTOP
    assess_migrate.go:351) — counted from data, ranked by window."""
    from pyspark.sql import Window

    counts = [
        load_table(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("num_rows"))
        .select(F.lit(t).alias("table_name"), "num_rows")
        for t in TABLES if os.path.exists(table_path(sf_dir, t))
    ]
    df = reduce(DataFrame.unionAll, counts)
    w = Window.orderBy(F.desc("num_rows"), F.asc("table_name"))
    return (
        df.select("table_name", "num_rows", F.row_number().over(w).cast("bigint").alias("rank"))
        .filter(F.col("rank") <= n)
    )


def column_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datatype distribution across the catalog (reference:
    GetDatabaseSchemaColumnTypeCounts assess_migrate.go:1160) — pure
    footer metadata, no scan."""
    from dbms_spark.functions.canonical import parquet_field_types

    rows: list[tuple[str, str]] = []
    for t in TABLES:
        p = table_path(sf_dir, t)
        if not os.path.exists(p):
            continue
        import pyarrow.parquet as pq

        for f in pq.read_schema(p):
            rows.append((t, str(f.type)))
    df = spark.createDataFrame(rows, "table_name string, data_type string")
    return df.groupBy("data_type").agg(F.count(F.lit(1)).alias("cnt"))


def value_distribution(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Categorical distribution with percentage — the shape of the
    reference's constraint/partition-type breakdown queries."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy()
    return counts.select(
        *group_cols, "cnt",
        (F.col("cnt").cast("double") / F.sum("cnt").over(total)).alias("pct"),
    )
