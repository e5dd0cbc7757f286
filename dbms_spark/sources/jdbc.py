"""JDBC source planning: partition-predicate reads, consistent
snapshots, and hint passthrough.

The reference's chunked extracts (reference: database/oracle/
data_migrate.go:350-465 ROWID chunks; statistics buckets
database/processor/data_compare_divider.go:41; consistent snapshot
clauses database/processor/data_compare_row.go:124-158; SQL hints
database/data_migrate.go:69 SqlHintS) map onto
``spark.read.jdbc(url, table, predicates=[...])`` — one predicate per
chunk, each becoming one remote range scan running in its own task.

Executed end-to-end in-repo against embedded Apache Derby (the JDBC
database Spark ships for its Hive metastore): chunk-predicate reads,
executor-side batch writes, and the staged MERGE apply all run for
real in ``tests/test_jdbc_roundtrip.py``.  Statement builders whose
dialect has no in-container engine (Oracle snapshot clauses, TiDB
IMPORT INTO) remain text-verified.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str                                  # jdbc:postgresql://..., jdbc:mysql://...
    table: str                                # schema-qualified table or subquery alias
    properties: dict[str, str] = field(default_factory=dict)
    fetch_size: int = 10_000
    #: consistent-read clause per dialect (S4), e.g. Oracle
    #: "AS OF SCN 123", TiDB "AS OF TIMESTAMP '...'".
    snapshot_clause: str | None = None
    #: optimizer hint injected into generated queries (reference SqlHintS)
    sql_hint: str | None = None

    def reader_options(self) -> dict[str, str]:
        opts = {"url": self.url, "fetchsize": str(self.fetch_size), **self.properties}
        return opts

    def query_text(self, select_list: str = "*", where: str | None = None) -> str:
        """Render the chunk query the way the reference's generated SQL
        does: hint after SELECT, snapshot clause after the table."""
        hint = f" /*+ {self.sql_hint} */" if self.sql_hint else ""
        snap = f" {self.snapshot_clause}" if self.snapshot_clause else ""
        w = f" WHERE {where}" if where else ""
        return f"SELECT{hint} {select_list} FROM {self.table}{snap}{w}"


def read_partitioned(
    spark: SparkSession,
    source: JdbcSource,
    predicates: list[str],
) -> DataFrame:
    """S1/S2 chunked read: one task per predicate.  Predicates come from
    :mod:`dbms_spark.plans.chunker` (statistics-driven) or any manual
    range list; they must tile the table exactly, which the chunker
    guarantees and its tests assert."""
    return spark.read.jdbc(
        url=source.url,
        table=source.table,
        predicates=predicates,
        properties={"fetchsize": str(source.fetch_size), **source.properties},
    )


def read_numeric_range(
    spark: SparkSession,
    source: JdbcSource,
    column: str,
    lower: int,
    upper: int,
    num_partitions: int,
) -> DataFrame:
    """S2 fast path when the chunk key is single-column numeric: Spark's
    built-in stride partitioning (equivalent to equal-width buckets; the
    chunker's ntile predicates are the equal-count alternative for
    skewed keys)."""
    return spark.read.jdbc(
        url=source.url,
        table=source.table,
        column=column,
        lowerBound=lower,
        upperBound=upper,
        numPartitions=num_partitions,
        properties={"fetchsize": str(source.fetch_size), **source.properties},
    )


def read_query(spark: SparkSession, source: JdbcSource, sql: str) -> DataFrame:
    """S6 custom-SQL scan: user-provided source SQL instead of a table
    (reference: sql_migrate mode, database/data_migrate.go:134-175)."""
    return spark.read.jdbc(
        url=source.url,
        table=f"({sql}) AS q",
        properties={"fetchsize": str(source.fetch_size), **source.properties},
    )


def gen_merge_into(table: str, key_cols: list[str], cols: list[str],
                   source_alias: str = "s") -> str:
    """C4 apply as one MERGE statement (the SQL-generating half of the
    reference's idempotent upsert, processor_translate_mysql.go /
    consumer.go:670-807 — REPLACE INTO and delete+insert collapse into
    MERGE on targets that support it).  Placeholders are positional
    ``?`` for a prepared statement over one batch row."""
    placeholders = ", ".join(["?"] * len(cols))
    src_cols = ", ".join(cols)
    on = " AND ".join(f"t.`{k}` = {source_alias}.`{k}`" for k in key_cols)
    non_key = [c for c in cols if c not in key_cols]
    ins_cols = ", ".join(f"`{c}`" for c in cols)
    ins_vals = ", ".join(f"{source_alias}.`{c}`" for c in cols)
    matched = ""
    if non_key:  # all-key tables have nothing to update on match
        sets = ", ".join(f"t.`{c}` = {source_alias}.`{c}`" for c in non_key)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets} "
    return (
        f"MERGE INTO {table} t USING (SELECT {placeholders}) AS {source_alias} ({src_cols}) "
        f"ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def gen_merge_from_staging(table: str, staging: str, key_cols: list[str],
                           cols: list[str], quote: str = '"') -> str:
    """C4/S9 set-based apply: one MERGE folding an entire STAGED batch
    table into the target — the scale shape of the reference's batched
    upsert (stmt_migrate_row.go:206-304 applies row batches; here the
    batch lands via executor-side ``write_jdbc`` and a single
    statement applies it transactionally).  ANSI form (double-quoted
    identifiers, unqualified SET targets) — runs as-is on Derby /
    Oracle / PostgreSQL 15+; pass ``quote='`'`` for MySQL-family
    targets that accept MERGE."""
    q = lambda c: f"{quote}{c}{quote}"
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    non_key = [c for c in cols if c not in key_cols]
    matched = ""
    if non_key:
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_key)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets} "
    ins_cols = ", ".join(q(c) for c in cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
    return (
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def gen_merge_delete(table: str, staging: str, key_cols: list[str],
                     quote: str = '"') -> str:
    """Set-based delete apply: one MERGE removing every target row
    whose key appears in the staged key table (the DELETE half of the
    reference's batched CDC apply, consumer.go:670-807 — delete-by-PK
    statements collapsed into one set operation)."""
    q = lambda c: f"{quote}{c}{quote}"
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    return (f"MERGE INTO {table} t USING {staging} s ON {on} "
            f"WHEN MATCHED THEN DELETE")


def gen_delete_by_key(table: str, key_cols: list[str]) -> str:
    conds = " AND ".join(f"`{k}` = ?" for k in key_cols)
    return f"DELETE FROM {table} WHERE {conds}"


def gen_import_into(table: str, columns: list[str], csv_dir: str,
                    charset: str = "utf8mb4", separator: str = ",") -> str:
    """S11: TiDB bulk-load statement for CSV chunks this engine wrote
    (reference: database/processor/csv_import_task.go:104-107) — emitted
    as text for the caller to run on the target."""
    cols = ", ".join(f"`{c}`" for c in columns)
    return (
        f"IMPORT INTO {table} ({cols}) FROM '{csv_dir}/*.csv' "
        f"WITH CHARACTER_SET='{charset}', FIELDS_TERMINATED_BY='{separator}', "
        f"SKIP_ROWS=1"
    )
