"""Struct (schema) migration and comparison.

Re-expresses the reference's datatype-mapping rules and struct compare
as plain data + DataFrame diffs:

- the NUMBER precision ladder and per-family type map (reference:
  database/mapping/oracle.go:30-250, built-in rule tables
  utils/constant/buildin_oracle_rule.go:111-242,
  buildin_mysql_rule.go:85-139, buildin_postgres_rule.go:78-117)
- rule priority resolution column > table > schema > task > built-in
  (reference: database/mapping/oracle.go:546-927
  OracleHandleColumnRuleWithPriority)
- struct compare emitting ALTER suggestions (reference:
  database/processor/struct_compare_table.go:45-1034)

All mappings are lookup *data* (broadcastable), not code — the
reference ships them as 1756-line Go tables; here they're dicts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    type_name: str          # source-engine type name, e.g. NUMBER, VARCHAR2
    precision: int | None = None
    scale: int | None = None
    length: int | None = None
    nullable: bool = True
    default: str | None = None
    comment: str | None = None


# ---------------------------------------------------------------------------
# Type mapping ladder (source type -> Spark type + target DDL type)
# ---------------------------------------------------------------------------

_SIMPLE_MAP: dict[str, tuple[T.DataType, str]] = {
    # approximate numerics
    "BINARY_FLOAT": (T.FloatType(), "FLOAT"),
    "BINARY_DOUBLE": (T.DoubleType(), "DOUBLE"),
    "FLOAT": (T.DoubleType(), "DOUBLE"),
    "REAL": (T.DoubleType(), "DOUBLE"),
    "DOUBLE": (T.DoubleType(), "DOUBLE"),
    "DOUBLE PRECISION": (T.DoubleType(), "DOUBLE"),
    # integers with declared names
    "TINYINT": (T.ByteType(), "TINYINT"),
    "SMALLINT": (T.ShortType(), "SMALLINT"),
    "MEDIUMINT": (T.IntegerType(), "INT"),
    "INT": (T.IntegerType(), "INT"),
    "INTEGER": (T.IntegerType(), "INT"),
    "BIGINT": (T.LongType(), "BIGINT"),
    "YEAR": (T.ShortType(), "SMALLINT"),
    # character
    "CHAR": (T.StringType(), "CHAR"),
    "NCHAR": (T.StringType(), "CHAR"),
    "VARCHAR": (T.StringType(), "VARCHAR"),
    "VARCHAR2": (T.StringType(), "VARCHAR"),
    "NVARCHAR2": (T.StringType(), "VARCHAR"),
    "TEXT": (T.StringType(), "TEXT"),
    "TINYTEXT": (T.StringType(), "TEXT"),
    "MEDIUMTEXT": (T.StringType(), "TEXT"),
    "LONGTEXT": (T.StringType(), "TEXT"),
    # LOBs
    "CLOB": (T.StringType(), "LONGTEXT"),
    "NCLOB": (T.StringType(), "LONGTEXT"),
    "LONG": (T.StringType(), "LONGTEXT"),
    "BLOB": (T.BinaryType(), "LONGBLOB"),
    "RAW": (T.BinaryType(), "VARBINARY"),
    "LONG RAW": (T.BinaryType(), "LONGBLOB"),
    "BFILE": (T.StringType(), "VARCHAR"),
    # datetime
    "DATE": (T.DateType(), "DATE"),
    "DATETIME": (T.TimestampType(), "DATETIME"),
    "TIME": (T.StringType(), "TIME"),
    # misc passthrough-as-string
    "ROWID": (T.StringType(), "VARCHAR"),
    "UROWID": (T.StringType(), "VARCHAR"),
    "XMLTYPE": (T.StringType(), "LONGTEXT"),
    "JSON": (T.StringType(), "JSON"),
    "BIT": (T.StringType(), "BIT"),
    "ENUM": (T.StringType(), "VARCHAR"),
    "SET": (T.StringType(), "VARCHAR"),
    "INTERVAL YEAR TO MONTH": (T.StringType(), "VARCHAR"),
    "INTERVAL DAY TO SECOND": (T.StringType(), "VARCHAR"),
}


def map_number(precision: int | None, scale: int | None) -> tuple[T.DataType, str]:
    """Oracle NUMBER(p,s) precision ladder (reference:
    database/mapping/oracle.go:30-250): p<3 TINYINT, 3<=p<5 SMALLINT,
    5<=p<9 INT, 9<=p<19 BIGINT, else DECIMAL(min(p,38),min(s,30));
    p is None (= NUMBER with no precision) -> DECIMAL(38,10)."""
    s = scale or 0
    if precision is None:
        return (T.DecimalType(38, 10), "DECIMAL(38,10)")
    if s == 0:
        if precision < 3:
            return (T.ByteType(), "TINYINT")
        if precision < 5:
            return (T.ShortType(), "SMALLINT")
        if precision < 9:
            return (T.IntegerType(), "INT")
        if precision < 19:
            return (T.LongType(), "BIGINT")
    p = min(precision, 38)
    sc = min(max(s, 0), 30)
    return (T.DecimalType(p, sc), f"DECIMAL({p},{sc})")


def map_type(spec: ColumnSpec) -> tuple[T.DataType, str]:
    """Source column declaration -> (Spark type, target DDL type)."""
    name = spec.type_name.upper().strip()
    if name in ("NUMBER", "NUMERIC", "DECIMAL"):
        return map_number(spec.precision, spec.scale)
    if name.startswith("TIMESTAMP"):
        # TIMESTAMP(n) [WITH [LOCAL] TIME ZONE]; Spark caps precision at 6
        return (T.TimestampType(), "DATETIME(6)")
    if name in _SIMPLE_MAP:
        dt, ddl = _SIMPLE_MAP[name]
        if ddl in ("CHAR", "VARCHAR") and spec.length:
            ddl = f"{ddl}({spec.length})"
        return dt, ddl
    # unknown: carry as string, flag in DDL comment
    return (T.StringType(), "VARCHAR /* unmapped source type: " + name + " */")


# ---------------------------------------------------------------------------
# Rule priority resolution (J4)
# ---------------------------------------------------------------------------

def resolve_rule(
    builtin: dict[str, str],
    task: dict[str, str] | None = None,
    schema: dict[str, str] | None = None,
    table: dict[str, str] | None = None,
    column: dict[str, str] | None = None,
) -> dict[str, str]:
    """Merge rule layers, most-specific last (column > table > schema >
    task > built-in) — the reference's priority chain."""
    out = dict(builtin)
    for layer in (task, schema, table, column):
        if layer:
            out.update(layer)
    return out


# ---------------------------------------------------------------------------
# Struct migrate / compare
# ---------------------------------------------------------------------------

def spark_schema_for(specs: list[ColumnSpec]) -> T.StructType:
    return T.StructType([T.StructField(s.name, map_type(s)[0], s.nullable) for s in specs])


def render_create_table(table: str, specs: list[ColumnSpec]) -> str:
    cols = []
    for s in specs:
        _, ddl = map_type(s)
        null_sql = "" if s.nullable else " NOT NULL"
        default_sql = f" DEFAULT {s.default}" if s.default is not None else ""
        cols.append(f"  `{s.name}` {ddl}{null_sql}{default_sql}")
    return f"CREATE TABLE {table} (\n" + ",\n".join(cols) + "\n);"


def schema_to_df(spark, table: str, schema: T.StructType) -> DataFrame:
    rows = [
        (table, f.name, f.dataType.simpleString(), f.nullable, i)
        for i, f in enumerate(schema.fields)
    ]
    return spark.createDataFrame(
        rows, "table_name string, col_name string, data_type string, nullable boolean, ordinal int"
    )


@dataclass(frozen=True)
class IndexSpec:
    name: str
    columns: tuple[str, ...]
    unique: bool = False
    primary: bool = False


def indexes_to_df(spark, table: str, indexes: list[IndexSpec]) -> DataFrame:
    rows = [
        (table, ix.name, ",".join(ix.columns), ix.unique, ix.primary)
        for ix in indexes
    ]
    return spark.createDataFrame(
        rows, "table_name string, index_name string, columns string, is_unique boolean, is_primary boolean"
    )


def index_compare(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Index/constraint diff keyed on the column tuple + uniqueness
    (names routinely differ across engines; the reference compares by
    definition, struct_compare_table.go index sections).  Emits
    CREATE/DROP INDEX suggestions."""
    key = ["table_name", "columns", "is_unique", "is_primary"]
    s = src.select(*key, F.col("index_name").alias("src_name"))
    d = dst.select(*key, F.col("index_name").alias("dst_name"))
    j = s.join(d, key, "full_outer")
    kind = (
        F.when(F.col("dst_name").isNull(), "MISSING_IN_DST")
        .when(F.col("src_name").isNull(), "EXTRA_IN_DST")
        .otherwise("OK")
    )
    uniq = F.when(F.col("is_primary"), "PRIMARY KEY ").when(F.col("is_unique"), "UNIQUE ").otherwise("")
    cols_sql = F.regexp_replace(F.col("columns"), ",", "`, `")
    alter = (
        F.when(kind == "MISSING_IN_DST",
               F.concat(F.lit("CREATE "), uniq, F.lit("INDEX `"),
                        F.coalesce("src_name", F.lit("ix")), F.lit("` ON "),
                        F.col("table_name"), F.lit(" (`"), cols_sql, F.lit("`);")))
        .when(kind == "EXTRA_IN_DST",
              F.concat(F.lit("DROP INDEX `"), F.col("dst_name"), F.lit("` ON "),
                       F.col("table_name"), F.lit(";")))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        j.select(*key, "src_name", "dst_name", kind.alias("kind"), alter.alias("alter_sql"))
        .filter(F.col("kind") != "OK")
    )


def struct_compare(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Metadata diff of two schema DataFrames (as from
    :func:`schema_to_df`): one row per discrepancy with an ALTER
    suggestion — the reference's struct_compare output re-expressed as
    a full-outer metadata join."""
    s = src.select(
        "table_name", "col_name",
        F.col("data_type").alias("src_type"), F.col("nullable").alias("src_nullable"),
    )
    d = dst.select(
        "table_name", "col_name",
        F.col("data_type").alias("dst_type"), F.col("nullable").alias("dst_nullable"),
    )
    j = s.join(d, ["table_name", "col_name"], "full_outer")
    kind = (
        F.when(F.col("dst_type").isNull(), "MISSING_IN_DST")
        .when(F.col("src_type").isNull(), "EXTRA_IN_DST")
        .when(F.col("src_type") != F.col("dst_type"), "TYPE_MISMATCH")
        .when(F.col("src_nullable") != F.col("dst_nullable"), "NULLABILITY")
        .otherwise("OK")
    )
    alter = (
        F.when(kind == "MISSING_IN_DST",
               F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" ADD COLUMN `"),
                        F.col("col_name"), F.lit("` "), F.col("src_type"), F.lit(";")))
        .when(kind == "EXTRA_IN_DST",
              F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" DROP COLUMN `"),
                       F.col("col_name"), F.lit("`;")))
        .when(kind == "TYPE_MISMATCH",
              F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" MODIFY COLUMN `"),
                       F.col("col_name"), F.lit("` "), F.col("src_type"), F.lit(";")))
        .when(kind == "NULLABILITY",
              F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" MODIFY COLUMN `"),
                       F.col("col_name"), F.lit("` "), F.col("src_type"),
                       F.when(F.col("src_nullable"), F.lit(" NULL")).otherwise(F.lit(" NOT NULL")),
                       F.lit(";")))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        j.select("table_name", "col_name", "src_type", "dst_type", kind.alias("kind"),
                 alter.alias("alter_sql"))
        .filter(F.col("kind") != "OK")
    )
