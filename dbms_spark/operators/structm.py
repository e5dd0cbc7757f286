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
from dbms_spark.plans.parallelism import literal_df


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
# Built-in rule tables as data (reference ships these as Go maps:
# utils/constant/buildin_oracle_rule.go:193-242 O2M datatype names,
# :89-103 default-value maps).  The numbered TIMESTAMP(n)/INTERVAL
# YEAR(n) variants are generated, matching the reference's enumeration.
# ---------------------------------------------------------------------------

def _o2m_datatype_rules() -> list[tuple[str, str]]:
    base = [
        ("NUMBER", "TINYINT/SMALLINT/INT/BIGINT/DECIMAL"),
        ("BFILE", "VARCHAR"), ("CHAR", "CHAR"), ("CHARACTER", "CHAR"),
        ("CLOB", "LONGTEXT"), ("BLOB", "BLOB"), ("DATE", "DATETIME"),
        ("DECIMAL", "DECIMAL"), ("DEC", "DECIMAL"),
        ("DOUBLE PRECISION", "DOUBLE PRECISION"), ("FLOAT", "DOUBLE"),
        ("INTEGER", "INT"), ("INT", "INT"), ("LONG", "LONGTEXT"),
        ("LONG RAW", "LONGBLOB"), ("BINARY_FLOAT", "DOUBLE"),
        ("BINARY_DOUBLE", "DOUBLE"), ("NCHAR", "CHAR"),
        ("NCHAR VARYING", "NCHAR VARYING"), ("NCLOB", "LONGTEXT"),
        ("NUMERIC", "NUMERIC"), ("NVARCHAR2", "VARCHAR"),
        ("RAW", "VARBINARY"), ("REAL", "DOUBLE"), ("ROWID", "VARCHAR"),
        ("SMALLINT", "SMALLINT"), ("UROWID", "VARCHAR"),
        ("VARCHAR2", "VARCHAR"), ("VARCHAR", "VARCHAR"),
        ("XMLTYPE", "LONGTEXT"),
    ]
    for n in range(10):
        base.append((f"INTERVAL YEAR({n}) TO MONTH", "VARCHAR"))
    base.append(("TIMESTAMP", "TIMESTAMP"))
    for n in range(10):
        base.append((f"TIMESTAMP({n})", "TIMESTAMP"))
    for n in range(10):
        base.append((f"TIMESTAMP({n}) WITH TIME ZONE", "TIMESTAMP"))
    for n in range(10):
        base.append((f"TIMESTAMP({n}) WITH LOCAL TIME ZONE", "TIMESTAMP"))
    return base


#: Oracle -> MySQL datatype name rules (71 rows, reference
#: buildin_oracle_rule.go:193-242)
O2M_DATATYPE_RULES: list[tuple[str, str]] = _o2m_datatype_rules()

#: MySQL -> Oracle datatype name rules (reference
#: buildin_mysql_rule.go:111-142)
M2O_DATATYPE_RULES: list[tuple[str, str]] = [
    ("SMALLINT", "NUMBER"), ("TINYINT", "NUMBER"), ("BIGINT", "NUMBER"),
    ("DECIMAL", "DECIMAL"), ("DOUBLE", "BINARY_DOUBLE"),
    ("DOUBLE PRECISION", "BINARY_DOUBLE"), ("FLOAT", "BINARY_FLOAT"),
    ("INT", "NUMBER"), ("INTEGER", "NUMBER"), ("MEDIUMINT", "NUMBER"),
    ("NUMERIC", "NUMBER"), ("REAL", "BINARY_FLOAT"), ("BIT", "RAW"),
    ("DATE", "DATE"), ("DATETIME", "DATE"), ("TIMESTAMP", "TIMESTAMP"),
    ("TIME", "DATE"), ("YEAR", "NUMBER"), ("BLOB", "BLOB"), ("CHAR", "CHAR"),
    ("LONGBLOB", "BLOB"), ("LONGTEXT", "CLOB"), ("MEDIUMBLOB", "BLOB"),
    ("MEDIUMTEXT", "CLOB"), ("TEXT", "CLOB"), ("TINYBLOB", "BLOB"),
    ("TINYTEXT", "VARCHAR2"), ("VARCHAR", "VARCHAR2"), ("BINARY", "RAW"),
    ("VARBINARY", "RAW"),
]


def datatype_rule_join(cat: DataFrame, spark) -> DataFrame:
    """Round-trip every catalog column through the built-in rule
    tables: MySQL-vocabulary catalog type -> Oracle type (M2O rules)
    -> MySQL target type (O2M rules).  Both rule tables are broadcast
    — the reference's in-process map lookups become two broadcast
    joins; columns with no rule (e.g. array types) drop out."""
    m2o = literal_df(spark, M2O_DATATYPE_RULES, "src_type string, oracle_type string")
    o2m = literal_df(spark, O2M_DATATYPE_RULES, "ora_type string, mysql_type string")
    return (
        cat.join(F.broadcast(m2o), cat.data_type == m2o.src_type)
        .join(F.broadcast(o2m), F.col("oracle_type") == o2m.ora_type)
        .select("table_name", "column_name", "data_type", "oracle_type", "mysql_type")
    )


#: Oracle -> MySQL column default-value rules (buildin_oracle_rule.go:89-93)
O2M_DEFAULT_VALUE_RULES: list[tuple[str, str]] = [
    ("SYSDATE", "NOW()"), ("SYS_GUID()", "UUID()"), ("", "NULL"),
]

#: MySQL -> Oracle column default-value rules (buildin_oracle_rule.go:101-103)
M2O_DEFAULT_VALUE_RULES: list[tuple[str, str]] = [
    ("CURRENT_TIMESTAMP", "SYSDATE"), ("NULL", "NULL"),
]


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


def render_create_table(table: str, specs: list[ColumnSpec],
                        translate_defaults: str | None = "o2m") -> str:
    """Target CREATE TABLE from mapped source declarations.  Default
    expressions are translated for the target dialect (SYSDATE →
    NOW() etc., reference buildin_rule_defaultval.go applied at DDL
    render, struct_migrate_task.go) unless ``translate_defaults`` is
    None; literals pass through either way."""
    cols = []
    for s in specs:
        _, ddl = map_type(s)
        null_sql = "" if s.nullable else " NOT NULL"
        dflt = s.default
        if dflt is not None and translate_defaults is not None:
            dflt = map_default_value(dflt, translate_defaults)
        default_sql = f" DEFAULT {dflt}" if dflt is not None else ""
        cols.append(f"  `{s.name}` {ddl}{null_sql}{default_sql}")
    return f"CREATE TABLE {table} (\n" + ",\n".join(cols) + "\n);"


def schema_to_df(spark, table: str, schema: T.StructType) -> DataFrame:
    rows = [
        (table, f.name, f.dataType.simpleString(), f.nullable, i)
        for i, f in enumerate(schema.fields)
    ]
    return literal_df(spark, 
        rows, "table_name string, col_name string, data_type string, nullable boolean, ordinal int"
    )


def specs_to_df(spark, table: str, specs: list[ColumnSpec]) -> DataFrame:
    """Full column-dictionary DataFrame — like :func:`schema_to_df` but
    carrying default values and comments so :func:`struct_compare` can
    diff them (reference struct_compare_table.go:854-1034 compares
    datatype + nullable + default + comment per column)."""
    rows = [
        (table, s.name, map_type(s)[1], s.nullable, s.default, s.comment, i)
        for i, s in enumerate(specs)
    ]
    return literal_df(spark, 
        rows,
        "table_name string, col_name string, data_type string, nullable boolean, "
        "default string, comment string, ordinal int",
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
    return literal_df(spark, 
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
    :func:`schema_to_df` or :func:`specs_to_df`): one row per
    discrepancy with an ALTER suggestion — the reference's
    struct_compare output re-expressed as a full-outer metadata join
    (struct_compare_table.go:854-1034).  Diffs datatype, nullability,
    and — when the inputs carry them — default values and comments."""
    def norm(df: DataFrame, side: str) -> DataFrame:
        cols = [
            F.col("table_name"), F.col("col_name"),
            F.col("data_type").alias(f"{side}_type"),
            F.col("nullable").alias(f"{side}_nullable"),
        ]
        for extra in ("default", "comment"):
            c = F.col(extra) if extra in df.columns else F.lit(None).cast("string")
            cols.append(c.alias(f"{side}_{extra}"))
        return df.select(*cols)

    j = norm(src, "src").join(norm(dst, "dst"), ["table_name", "col_name"], "full_outer")
    kind = (
        F.when(F.col("dst_type").isNull() & F.col("dst_nullable").isNull(), "MISSING_IN_DST")
        .when(F.col("src_type").isNull() & F.col("src_nullable").isNull(), "EXTRA_IN_DST")
        .when(F.col("src_type") != F.col("dst_type"), "TYPE_MISMATCH")
        .when(F.col("src_nullable") != F.col("dst_nullable"), "NULLABILITY")
        .when(~F.col("src_default").eqNullSafe(F.col("dst_default")), "DEFAULT_MISMATCH")
        .when(~F.col("src_comment").eqNullSafe(F.col("dst_comment")), "COMMENT_MISMATCH")
        .otherwise("OK")
    )
    modify_prefix = F.concat(
        F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" MODIFY COLUMN `"),
        F.col("col_name"), F.lit("` "), F.col("src_type"),
    )
    alter = (
        F.when(kind == "MISSING_IN_DST",
               F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" ADD COLUMN `"),
                        F.col("col_name"), F.lit("` "), F.col("src_type"), F.lit(";")))
        .when(kind == "EXTRA_IN_DST",
              F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" DROP COLUMN `"),
                       F.col("col_name"), F.lit("`;")))
        .when(kind == "TYPE_MISMATCH", F.concat(modify_prefix, F.lit(";")))
        .when(kind == "NULLABILITY",
              F.concat(modify_prefix,
                       F.when(F.col("src_nullable"), F.lit(" NULL")).otherwise(F.lit(" NOT NULL")),
                       F.lit(";")))
        .when(kind == "DEFAULT_MISMATCH",
              F.when(F.col("src_default").isNull(),
                     F.concat(F.lit("ALTER TABLE "), F.col("table_name"),
                              F.lit(" ALTER COLUMN `"), F.col("col_name"),
                              F.lit("` DROP DEFAULT;")))
              .otherwise(F.concat(F.lit("ALTER TABLE "), F.col("table_name"),
                                  F.lit(" ALTER COLUMN `"), F.col("col_name"),
                                  F.lit("` SET DEFAULT "), F.col("src_default"), F.lit(";"))))
        .when(kind == "COMMENT_MISMATCH",
              F.concat(modify_prefix, F.lit(" COMMENT '"),
                       F.coalesce("src_comment", F.lit("")), F.lit("';")))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        j.select("table_name", "col_name", "src_type", "dst_type", kind.alias("kind"),
                 alter.alias("alter_sql"))
        .filter(F.col("kind") != "OK")
    )


# ---------------------------------------------------------------------------
# Partition-spec and table-meta compare
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PartitionSpec:
    name: str
    high_value: str         # range bound / list values, rendered as text


def partitions_to_df(spark, table: str, partition_type: str,
                     parts: list[PartitionSpec]) -> DataFrame:
    rows = [(table, partition_type, p.name, p.high_value) for p in parts]
    return literal_df(spark, 
        rows, "table_name string, partition_type string, partition_name string, high_value string"
    )


def partition_compare(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Partition-spec diff (reference struct_compare_table.go:45-77
    type compare + :961-1034 per-partition detail).  A partition-type
    mismatch is one 'Manual Create Partition Table' row; otherwise
    partitions diff by (name, high_value) into ADD/DELETE suggestions."""
    s = src.select(
        "table_name", F.col("partition_type").alias("src_ptype"),
        "partition_name", F.col("high_value").alias("src_high"),
    )
    d = dst.select(
        "table_name", F.col("partition_type").alias("dst_ptype"),
        "partition_name", F.col("high_value").alias("dst_high"),
    )
    types = (
        s.select("table_name", "src_ptype").distinct()
        .join(d.select("table_name", "dst_ptype").distinct(), "table_name", "full_outer")
    )
    type_rows = types.filter(
        ~F.col("src_ptype").eqNullSafe(F.col("dst_ptype"))
    ).select(
        "table_name",
        F.lit(None).cast("string").alias("partition_name"),
        F.col("src_ptype").alias("src_value"),
        F.col("dst_ptype").alias("dst_value"),
        F.lit("PARTITION_TYPE").alias("kind"),
        F.lit("Manual Create Partition Table").alias("suggest"),
    )
    j = s.join(d, ["table_name", "partition_name"], "full_outer")
    part_kind = (
        F.when(F.col("dst_high").isNull() & F.col("dst_ptype").isNull(), "ADD_PARTITION")
        .when(F.col("src_high").isNull() & F.col("src_ptype").isNull(), "DELETE_PARTITION")
        .when(F.col("src_high") != F.col("dst_high"), "HIGH_VALUE_MISMATCH")
        .otherwise("OK")
    )
    suggest = (
        F.when(part_kind == "ADD_PARTITION",
               F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" ADD PARTITION ("),
                        F.col("partition_name"), F.lit(" VALUES LESS THAN ("),
                        F.col("src_high"), F.lit("));")))
        .when(part_kind == "DELETE_PARTITION",
              F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" DROP PARTITION "),
                       F.col("partition_name"), F.lit(";")))
        .when(part_kind == "HIGH_VALUE_MISMATCH", F.lit("Manual Reorganize Partition"))
        .otherwise(F.lit(None).cast("string"))
    )
    part_rows = (
        j.select(
            "table_name", "partition_name",
            F.col("src_high").alias("src_value"), F.col("dst_high").alias("dst_value"),
            part_kind.alias("kind"), suggest.alias("suggest"),
        )
        .filter(F.col("kind") != "OK")
        # type mismatch -> manual re-create; per-partition detail is
        # meaningless then (the reference returns early there too)
        .join(type_rows.select("table_name"), "table_name", "left_anti")
    )
    return type_rows.unionAll(part_rows)


def table_meta_to_df(spark, rows: list[tuple[str, str | None, str, str]]) -> DataFrame:
    """(table_name, table_comment, charset, collation) rows."""
    return literal_df(spark, 
        rows, "table_name string, table_comment string, charset string, collation string"
    )


def table_meta_compare(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Table-level attribute diff: comment (struct_compare_table.go:93-
    133) and charset/collation (:135-186) with ALTER/convert hints."""
    s = src.select(
        "table_name", F.col("table_comment").alias("src_comment"),
        F.col("charset").alias("src_charset"), F.col("collation").alias("src_collation"),
    )
    d = dst.select(
        "table_name", F.col("table_comment").alias("dst_comment"),
        F.col("charset").alias("dst_charset"), F.col("collation").alias("dst_collation"),
    )
    j = s.join(d, "table_name", "full_outer")
    comment_rows = j.filter(~F.col("src_comment").eqNullSafe(F.col("dst_comment"))).select(
        "table_name", F.lit("TABLE_COMMENT").alias("kind"),
        F.col("src_comment").alias("src_value"), F.col("dst_comment").alias("dst_value"),
        F.concat(F.lit("ALTER TABLE "), F.col("table_name"), F.lit(" COMMENT '"),
                 F.coalesce("src_comment", F.lit("")), F.lit("';")).alias("suggest"),
    )
    charset_rows = j.filter(
        ~F.col("src_charset").eqNullSafe(F.col("dst_charset"))
        | ~F.col("src_collation").eqNullSafe(F.col("dst_collation"))
    ).select(
        "table_name", F.lit("CHARSET_COLLATION").alias("kind"),
        F.concat_ws("/", "src_charset", "src_collation").alias("src_value"),
        F.concat_ws("/", "dst_charset", "dst_collation").alias("dst_value"),
        F.concat(F.lit("ALTER TABLE "), F.col("table_name"),
                 F.lit(" CONVERT TO CHARACTER SET "), F.col("src_charset"),
                 F.lit(" COLLATE "), F.col("src_collation"), F.lit(";")).alias("suggest"),
    )
    return comment_rows.unionAll(charset_rows)


# ---------------------------------------------------------------------------
# Schema-evolution compatibility verdicts
# ---------------------------------------------------------------------------

#: widenings that are always read-compatible (old data parses under
#: the new type), as DATA — same rules-as-data posture as the datatype
#: mapping ladder
#: (old_base, new_base, min_new_size): the widening is safe only when
#: the new type's first size parameter is at least min_new_size (0 = no
#: size requirement) — e.g. BIGINT fits any DECIMAL(p>=19,0)
SAFE_WIDENINGS: list[tuple[str, str, int]] = [
    ("TINYINT", "SMALLINT", 0), ("TINYINT", "INT", 0), ("TINYINT", "BIGINT", 0),
    ("SMALLINT", "INT", 0), ("SMALLINT", "BIGINT", 0),
    ("INT", "BIGINT", 0),
    ("TINYINT", "DECIMAL", 3), ("SMALLINT", "DECIMAL", 5),
    ("INT", "DECIMAL", 10), ("BIGINT", "DECIMAL", 19),
    ("FLOAT", "DOUBLE", 0),
    ("CHAR", "VARCHAR", 0), ("VARCHAR", "TEXT", 0), ("CHAR", "TEXT", 0),
    ("DATE", "DATETIME", 0),
]


def schema_compat(old: DataFrame, new: DataFrame) -> DataFrame:
    """Evolution verdict per column for moving a dataset from schema
    ``old`` to schema ``new`` (both as :func:`specs_to_df` frames):

    - ``OK`` — unchanged
    - ``SAFE_WIDEN`` — same base with grown length/precision, or a
      widening listed in :data:`SAFE_WIDENINGS`; old data always reads
    - ``ADDITIVE`` — new nullable column (old rows read as NULL)
    - ``BREAKING`` — dropped column, narrowed/changed type, nullable ->
      NOT NULL, or a new NOT NULL column without default

    One full-outer metadata join plus a broadcast join against the
    widening rule table — the compatibility gate a schema registry
    applies before accepting a producer's new version."""
    base = F.regexp_extract(F.col("data_type"), r"^([A-Z0-9]+)", 1)
    size = F.regexp_extract(F.col("data_type"), r"\((\d+)", 1).try_cast("long")
    scale = F.regexp_extract(F.col("data_type"), r"\(\d+,(\d+)\)", 1).try_cast("long")

    def norm(df: DataFrame, side: str) -> DataFrame:
        cols = [
            F.col("table_name"), F.col("col_name"),
            F.col("data_type").alias(f"{side}_type"),
            base.alias(f"{side}_base"), size.alias(f"{side}_size"),
            scale.alias(f"{side}_scale"),
            F.col("nullable").alias(f"{side}_nullable"),
            (F.col("default") if "default" in df.columns
             else F.lit(None).cast("string")).alias(f"{side}_default"),
        ]
        return df.select(*cols)

    j = norm(old, "old").join(norm(new, "new"), ["table_name", "col_name"], "full_outer")
    spark = old.sparkSession
    widen = literal_df(spark, 
        SAFE_WIDENINGS, "w_old string, w_new string, w_min long")
    j = j.join(
        F.broadcast(widen),
        (F.col("old_base") == F.col("w_old")) & (F.col("new_base") == F.col("w_new"))
        & (F.coalesce(F.col("new_size"), F.lit(0)) >= F.col("w_min")),
        "left",
    )
    same_base = F.col("old_base") == F.col("new_base")
    # widening within a base must grow the first size parameter and
    # keep the second (DECIMAL scale) unchanged — (12,2)->(13,1) would
    # silently drop fraction digits
    grown = same_base & (
        F.coalesce(F.col("new_size"), F.lit(0)) >= F.coalesce(F.col("old_size"), F.lit(0))
    ) & F.col("new_scale").eqNullSafe(F.col("old_scale"))
    verdict = (
        F.when(F.col("new_type").isNull() & F.col("new_nullable").isNull(),
               F.lit("BREAKING"))                                   # dropped
        .when(F.col("old_type").isNull() & F.col("old_nullable").isNull(),
              F.when(F.col("new_nullable") | F.col("new_default").isNotNull(),
                     F.lit("ADDITIVE")).otherwise(F.lit("BREAKING")))  # added
        .when(F.col("old_nullable") & ~F.col("new_nullable"), F.lit("BREAKING"))
        .when(F.col("old_type") == F.col("new_type"), F.lit("OK"))
        .when(grown | F.col("w_old").isNotNull(), F.lit("SAFE_WIDEN"))
        .otherwise(F.lit("BREAKING"))
    )
    return j.select(
        "table_name", "col_name", "old_type", "new_type", verdict.alias("verdict"))


# ---------------------------------------------------------------------------
# Postgres -> MySQL/TiDB datatype rules (the reference's third engine
# family; doc/buildin_rule_reverse_p.md, model/buildin pg rule tables)
# ---------------------------------------------------------------------------

#: scalar name rules — P-independent mappings as data
P2M_DATATYPE_RULES: list[tuple[str, str]] = [
    ("INT", "INT"), ("SMALLINT", "SMALLINT"), ("BIGINT", "BIGINT"),
    ("SERIAL", "INT"), ("SMALLSERIAL", "SMALLINT"), ("BIGSERIAL", "BIGINT"),
    ("BIT", "BIT"), ("BOOLEAN", "TINYINT(1)"),
    ("REAL", "FLOAT"), ("DOUBLE PRECISION", "DOUBLE"),
    ("NUMERIC", "DECIMAL"), ("DECIMAL", "DECIMAL"), ("MONEY", "DECIMAL(19,2)"),
    ("DATE", "DATE"), ("TIME", "TIME"), ("TIMESTAMP", "DATETIME"),
    ("INTERVAL", "TIME"), ("BYTEA", "LONGBLOB"), ("TEXT", "LONGTEXT"),
    ("CIDR", "VARCHAR(43)"), ("INET", "VARCHAR(43)"), ("MACADDR", "VARCHAR(17)"),
    ("UUID", "VARCHAR(36)"), ("XML", "LONGTEXT"), ("JSON", "LONGTEXT"),
    ("TSVECTOR", "LONGTEXT"), ("TSQUERY", "LONGTEXT"), ("ARRAY", "LONGTEXT"),
    ("POINT", "POINT"), ("LINE", "LINESTRING"), ("LSEG", "LINESTRING"),
    ("BOX", "POLYGON"), ("PATH", "LINESTRING"), ("POLYGON", "POLYGON"),
    ("CIRCLE", "POLYGON"), ("TXID_SNAPSHOT", "VARCHAR(256)"),
]

#: character-length ladder thresholds: utf8mb4 row-format limits make
#: the target type depend on P (65535/4 and 16777215/4 characters)
_PG_CHAR_LADDER = 255
_PG_VARCHAR_LADDER = 16382
_PG_MEDIUMTEXT_LADDER = 4194303


def map_pg_char_sql(base_col: str, len_col: str) -> str:
    """The P-dependent half of the Postgres rules as ONE shared SQL
    expression (valid in Spark SQL and DuckDB): CHAR/NCHAR ladder to
    CHAR/VARCHAR/LONGTEXT, VARCHAR/NVARCHAR to
    VARCHAR/MEDIUMTEXT/LONGTEXT, by declared character length."""
    c, p = base_col, len_col
    return f"""CASE
  WHEN {c} IN ('CHAR', 'NATIONAL CHAR') THEN
    CASE WHEN {p} <= {_PG_CHAR_LADDER} THEN 'CHAR(' || CAST({p} AS STRING) || ')'
         WHEN {p} <= {_PG_VARCHAR_LADDER} THEN 'VARCHAR(' || CAST({p} AS STRING) || ')'
         ELSE 'LONGTEXT' END
  WHEN {c} IN ('VARCHAR', 'NATIONAL CHARACTER VARYING') THEN
    CASE WHEN {p} <= {_PG_VARCHAR_LADDER} THEN 'VARCHAR(' || CAST({p} AS STRING) || ')'
         WHEN {p} <= {_PG_MEDIUMTEXT_LADDER} THEN 'MEDIUMTEXT'
         ELSE 'LONGTEXT' END
END"""


def pg_datatype_rule_join(cat: DataFrame, spark) -> DataFrame:
    """Map a Postgres-vocabulary column catalog (table_name, col_name,
    base_type, char_len) to MySQL/TiDB target types: scalar rules via
    one broadcast join, the char ladder via the shared expression;
    unmapped types surface as NULL target (the reference flags those
    for manual review rather than guessing)."""
    rules = literal_df(spark, P2M_DATATYPE_RULES, "pg_type string, my_type string")
    ladder = F.expr(map_pg_char_sql("base_type", "char_len"))
    return (
        cat.join(F.broadcast(rules), cat["base_type"] == rules["pg_type"], "left")
        .select(
            "table_name", "col_name", "base_type",
            F.coalesce(ladder, F.col("my_type")).alias("target_type"),
        )
    )


#: Oracle -> TiDB: identical to O2M except NUMBER maps to DECIMAL
#: uniformly — TiDB's decimal-vs-integer joins are slower, so the
#: reference avoids emitting integer types for NUMBER
#: (buildin_rule_datatype.go:469, buildin_oracle_rule.go:266-269)
O2T_DATATYPE_RULES: list[tuple[str, str]] = [
    (s, "DECIMAL" if s == "NUMBER" else t) for s, t in O2M_DATATYPE_RULES
]

#: TiDB -> Oracle: the reference reuses the MySQL map verbatim
#: (buildin_rule_datatype.go:1105 targets BuildInMySQLM2ODatatypeNameMap)
T2O_DATATYPE_RULES: list[tuple[str, str]] = list(M2O_DATATYPE_RULES)


# ---------------------------------------------------------------------------
# MySQL/TiDB -> Postgres datatype rules.  The reference routes
# MYSQL@POSTGRES / TIDB@POSTGRES task flows (utils/constant/task.go:62,66;
# flow switches database/processor/data_compare_row.go:1529-1577) and
# ships the forward P2M map (buildin_postgres_rule.go:78-117 family);
# the reverse struct-migrate direction is the inverse of that map with
# MySQL's wider type vocabulary folded in (the text/blob size ladder
# collapses — Postgres TEXT/BYTEA are unbounded — and UNSIGNED integer
# declarations widen one rung so the value range always fits).
# ---------------------------------------------------------------------------

M2P_DATATYPE_RULES: list[tuple[str, str]] = [
    # exact integers (signed)
    ("TINYINT", "SMALLINT"), ("SMALLINT", "SMALLINT"),
    ("MEDIUMINT", "INTEGER"), ("INT", "INTEGER"), ("INTEGER", "INTEGER"),
    ("BIGINT", "BIGINT"), ("YEAR", "SMALLINT"),
    # UNSIGNED widens one rung (Postgres has no unsigned types)
    ("TINYINT UNSIGNED", "SMALLINT"), ("SMALLINT UNSIGNED", "INTEGER"),
    ("MEDIUMINT UNSIGNED", "INTEGER"), ("INT UNSIGNED", "BIGINT"),
    ("INTEGER UNSIGNED", "BIGINT"), ("BIGINT UNSIGNED", "NUMERIC(20,0)"),
    # exact / approximate numerics
    ("DECIMAL", "NUMERIC"), ("NUMERIC", "NUMERIC"), ("BIT", "BIT"),
    ("BOOLEAN", "BOOLEAN"), ("FLOAT", "REAL"),
    ("DOUBLE", "DOUBLE PRECISION"), ("DOUBLE PRECISION", "DOUBLE PRECISION"),
    ("REAL", "DOUBLE PRECISION"),  # MySQL REAL is DOUBLE unless REAL_AS_FLOAT
    # datetime
    ("DATE", "DATE"), ("DATETIME", "TIMESTAMP WITHOUT TIME ZONE"),
    ("TIMESTAMP", "TIMESTAMP WITHOUT TIME ZONE"),
    ("TIME", "TIME WITHOUT TIME ZONE"),
    # character: the MySQL size ladder collapses (PG TEXT is unbounded)
    ("CHAR", "CHARACTER"), ("VARCHAR", "CHARACTER VARYING"),
    ("TINYTEXT", "TEXT"), ("TEXT", "TEXT"), ("MEDIUMTEXT", "TEXT"),
    ("LONGTEXT", "TEXT"), ("ENUM", "CHARACTER VARYING"),
    ("SET", "CHARACTER VARYING"),
    # binary: all sizes -> BYTEA
    ("BINARY", "BYTEA"), ("VARBINARY", "BYTEA"), ("TINYBLOB", "BYTEA"),
    ("BLOB", "BYTEA"), ("MEDIUMBLOB", "BYTEA"), ("LONGBLOB", "BYTEA"),
    # structured / spatial (inverse of the P2M geometry folds)
    ("JSON", "JSON"), ("POINT", "POINT"), ("LINESTRING", "PATH"),
    ("POLYGON", "POLYGON"), ("GEOMETRY", "POLYGON"),
]

#: TiDB -> Postgres: TiDB shares MySQL's type vocabulary, so the map is
#: reused verbatim — same pattern as T2O above.
T2P_DATATYPE_RULES: list[tuple[str, str]] = list(M2P_DATATYPE_RULES)

#: Postgres types whose declared length/precision survives migration —
#: everything else in the map is either fixed-width or unbounded.
_PG_PARAM_TYPES = ("CHARACTER", "CHARACTER VARYING", "BIT", "NUMERIC")


def map_m2p_render_sql(pg_col: str, len_col: str) -> str:
    """Length/precision re-attachment as ONE shared SQL expression
    (valid in Spark SQL and DuckDB): parameterizable Postgres types
    keep the source's declared length, the rest render bare."""
    t, p = pg_col, len_col
    params = ", ".join(f"'{x}'" for x in _PG_PARAM_TYPES)
    return (f"CASE WHEN {t} IN ({params}) AND {p} IS NOT NULL "
            f"THEN {t} || '(' || CAST({p} AS STRING) || ')' ELSE {t} END")


def m2p_datatype_rule_join(cat: DataFrame, spark,
                           rules: list[tuple[str, str]] | None = None) -> DataFrame:
    """Map a MySQL/TiDB-vocabulary column catalog (table_name, col_name,
    base_type, char_len) to Postgres target types: scalar names via one
    broadcast join, declared lengths re-attached by the shared render
    expression; unmapped types surface as NULL target (flagged for
    manual review, not guessed — same posture as the P2M join)."""
    r = literal_df(spark, rules or M2P_DATATYPE_RULES,
                              "my_type string, pg_type string")
    render = F.expr(map_m2p_render_sql("pg_type", "char_len"))
    return (
        cat.join(F.broadcast(r), cat["base_type"] == r["my_type"], "left")
        .select("table_name", "col_name", "base_type",
                render.alias("target_type"))
    )


#: MySQL/TiDB -> Postgres default-expression rewrites
M2P_DEFAULTVAL_RULES: dict[str, str] = {
    "CURRENT_TIMESTAMP": "CURRENT_TIMESTAMP",
    "NOW()": "CURRENT_TIMESTAMP",
    "UUID()": "gen_random_uuid()",
    "NULL": "NULL",
}

_M2P_MAP = dict(M2P_DATATYPE_RULES)


def map_pg_type(spec: ColumnSpec) -> str:
    """MySQL/TiDB column declaration -> Postgres DDL type text."""
    name = spec.type_name.upper().strip()
    pg = _M2P_MAP.get(name)
    if pg is None:
        return "TEXT /* unmapped source type: " + name + " */"
    if pg == "NUMERIC" and spec.precision is not None:
        s = spec.scale or 0
        return f"NUMERIC({spec.precision},{s})"
    if pg in _PG_PARAM_TYPES and spec.length:
        return f"{pg}({spec.length})"
    return pg


def pg_render_create_table(table: str, specs: list[ColumnSpec]) -> str:
    """Postgres CREATE TABLE from MySQL/TiDB source declarations:
    double-quoted identifiers, M2P type map, defaults translated via
    :data:`M2P_DEFAULTVAL_RULES` (literals pass through verbatim)."""
    cols = []
    for s in specs:
        ddl = map_pg_type(s)
        null_sql = "" if s.nullable else " NOT NULL"
        dflt = s.default
        if dflt is not None:
            dflt = M2P_DEFAULTVAL_RULES.get(dflt.strip(), dflt)
        default_sql = f" DEFAULT {dflt}" if dflt is not None else ""
        cols.append(f'  "{s.name}" {ddl}{null_sql}{default_sql}')
    return f'CREATE TABLE "{table}" (\n' + ",\n".join(cols) + "\n);"


# ---------------------------------------------------------------------------
# Default-value translation rules (buildin_rule_defaultval.go:22-101,
# buildin_oracle_rule.go:84-104) — applied when rendering target DDL
# ---------------------------------------------------------------------------

#: Oracle -> MySQL/TiDB default-expression rewrites ('' = no default)
O2M_DEFAULTVAL_RULES: dict[str, str] = {
    "SYSDATE": "NOW()",
    "SYS_GUID()": "UUID()",
    "": "NULL",
}

#: MySQL/TiDB -> Oracle default-expression rewrites
M2O_DEFAULTVAL_RULES: dict[str, str] = {
    "CURRENT_TIMESTAMP": "SYSDATE",
    "NULL": "NULL",
}


def map_default_value(default: str | None, direction: str = "o2m") -> str | None:
    """Translate a column default expression for the target dialect;
    unknown expressions pass through verbatim (literals are dialect-
    neutral — only the engine-function spellings need rewriting)."""
    if default is None:
        return None
    rules = O2M_DEFAULTVAL_RULES if direction == "o2m" else M2O_DEFAULTVAL_RULES
    return rules.get(default.strip(), default)


# ---------------------------------------------------------------------------
# Sequence migration (reference: database/processor/
# struct_migrate_task.go:1142-1210, catalog read database/oracle/
# struct_migrate.go:333-370 GetDatabaseSequences/GetDatabaseSequenceName)
#
# The one non-obvious semantic is the START headroom: the source's
# in-flight sequence cache may already have handed out values past
# LAST_NUMBER, so the target must start beyond any value the source
# could have issued — NOCACHE sequences get a flat +5000 pad,
# cached sequences get +2*CACHE_SIZE (struct_migrate_task.go:1157-1162).
# MAX_VALUE >= 2^63-1 (Oracle's default is 10^28-1) exceeds the
# MySQL-compatible BIGINT sequence domain and renders as NOMAXVALUE
# (:1181-1198).
# ---------------------------------------------------------------------------

#: MySQL-compatible sequence ceiling (math.MaxInt64 in the reference)
_SEQ_MAX_BIGINT = 9223372036854775807


@dataclass(frozen=True)
class SequenceSpec:
    name: str
    last_number: int
    increment_by: int = 1
    min_value: int = 1
    max_value: str = "9999999999999999999999999999"  # Oracle default 10^28-1
    cache_size: int = 20
    cycle: bool = False


def sequences_to_df(spark, schema: str, seqs: list[SequenceSpec]) -> DataFrame:
    """Harvested DBA_SEQUENCES rows as a DataFrame (max_value is a
    string column: Oracle's default 10^28-1 overflows BIGINT)."""
    rows = [
        (schema, s.name, s.last_number, s.increment_by, s.min_value,
         s.max_value, s.cache_size, s.cycle)
        for s in seqs
    ]
    return literal_df(spark, 
        rows,
        "schema_name string, sequence_name string, last_number bigint, "
        "increment_by bigint, min_value bigint, max_value string, "
        "cache_size bigint, cycle boolean",
    )


def sequence_migrate(seqs: DataFrame, target_schema: str,
                     if_not_exists: bool = False) -> DataFrame:
    """(sequence_name, start_with, ddl) for every harvested sequence —
    the target-side CREATE SEQUENCE statements of a struct migration.

    All per-row logic is JVM-side column expressions; at scale this is
    a map-only pass over the (tiny) sequence catalog."""
    start = (F.col("last_number")
             + F.when(F.col("cache_size") == 0, F.lit(5000))
             .otherwise(F.col("cache_size") * 2)).cast("bigint")
    max_flag = F.when(
        F.col("max_value").try_cast(T.DecimalType(38, 0))
        >= F.lit(_SEQ_MAX_BIGINT).cast(T.DecimalType(38, 0)),
        F.lit("NOMAXVALUE"),
    ).otherwise(F.concat(F.lit("MAXVALUE "), F.col("max_value")))
    cache_flag = F.when(F.col("cache_size") == 0, F.lit("NOCACHE")) \
        .otherwise(F.concat(F.lit("CACHE "), F.col("cache_size").cast("string")))
    cycle_flag = F.when(F.col("cycle"), F.lit("CYCLE")).otherwise(F.lit("NOCYCLE"))
    create = "CREATE SEQUENCE IF NOT EXISTS" if if_not_exists else "CREATE SEQUENCE"
    ddl = F.concat_ws(
        " ",
        F.lit(create),
        F.concat(F.lit(target_schema), F.lit("."), F.col("sequence_name")),
        F.lit("START"), start.cast("string"),
        F.lit("INCREMENT"), F.col("increment_by").cast("string"),
        F.lit("MINVALUE"), F.col("min_value").cast("string"),
        max_flag, cache_flag, cycle_flag,
    )
    return seqs.select(
        "sequence_name",
        start.alias("start_with"),
        F.concat(ddl, F.lit(";")).alias("ddl"),
    )


def sequence_migrate_sql(seqs_sql: str, target_schema: str,
                         if_not_exists: bool = False) -> str:
    """DuckDB twin of :func:`sequence_migrate` over a relation with the
    :func:`sequences_to_df` column set."""
    create = "CREATE SEQUENCE IF NOT EXISTS" if if_not_exists else "CREATE SEQUENCE"
    return f"""
SELECT sequence_name,
       CAST(last_number + CASE WHEN cache_size = 0 THEN 5000 ELSE cache_size * 2 END
            AS BIGINT) AS start_with,
       '{create} {target_schema}.' || sequence_name
         || ' START ' || CAST(last_number
              + CASE WHEN cache_size = 0 THEN 5000 ELSE cache_size * 2 END AS VARCHAR)
         || ' INCREMENT ' || CAST(increment_by AS VARCHAR)
         || ' MINVALUE ' || CAST(min_value AS VARCHAR)
         || ' ' || CASE WHEN TRY_CAST(max_value AS DECIMAL(38,0))
                        >= CAST({_SEQ_MAX_BIGINT} AS DECIMAL(38,0))
                   THEN 'NOMAXVALUE' ELSE 'MAXVALUE ' || max_value END
         || ' ' || CASE WHEN cache_size = 0 THEN 'NOCACHE'
                   ELSE 'CACHE ' || CAST(cache_size AS VARCHAR) END
         || ' ' || CASE WHEN cycle THEN 'CYCLE' ELSE 'NOCYCLE' END
         || ';' AS ddl
FROM ({seqs_sql})
"""


# ---------------------------------------------------------------------------
# Foreign-key / check-constraint struct compare (reference:
# database/processor/struct_compare_table.go:535-620
# CompareTableForeignConstraint, :622-705 CompareTableCheckConstraint —
# constraints diffed by DEFINITION, target-only entries dropped,
# source-only entries added; each FK rule renders whenever it is set —
# ON DELETE first, then ON UPDATE, both emitted when both are present)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ForeignKeySpec:
    name: str
    columns: tuple[str, ...]
    ref_schema: str
    ref_table: str
    ref_columns: tuple[str, ...]
    delete_rule: str = ""          # e.g. CASCADE / SET NULL; '' = unspecified
    update_rule: str = ""


def fks_to_df(spark, table: str, fks: list[ForeignKeySpec]) -> DataFrame:
    rows = [
        (table, k.name, ",".join(k.columns), k.ref_schema, k.ref_table,
         ",".join(k.ref_columns), k.delete_rule, k.update_rule)
        for k in fks
    ]
    return literal_df(spark, 
        rows,
        "table_name string, fk_name string, columns string, ref_schema string, "
        "ref_table string, ref_columns string, delete_rule string, update_rule string",
    )


_FK_KEY = ["table_name", "columns", "ref_schema", "ref_table", "ref_columns",
           "delete_rule", "update_rule"]


def fk_compare(src: DataFrame, dst: DataFrame, target_schema: str) -> DataFrame:
    """FK diff keyed on the full definition (columns + referenced
    relation + rules — names routinely differ across engines); a
    definition drift therefore emits one ADD and one DROP, exactly the
    reference's add/del pair."""
    s = src.select(*_FK_KEY, F.col("fk_name").alias("src_name"))
    d = dst.select(*_FK_KEY, F.col("fk_name").alias("dst_name"))
    j = s.join(d, _FK_KEY, "full_outer")
    kind = (
        F.when(F.col("dst_name").isNull(), "ADD")
        .when(F.col("src_name").isNull(), "DROP")
        .otherwise("OK")
    )
    # Both rules render when both are set ('ON DELETE X ON UPDATE Y' is a
    # single valid clause pair) — the reference emits each rule whenever it
    # is non-empty (struct_compare_table.go CompareTableForeignConstraint).
    rule = F.concat(
        F.when(F.col("delete_rule") != "",
               F.concat(F.lit(" ON DELETE "), F.col("delete_rule")))
        .otherwise(F.lit("")),
        F.when(F.col("update_rule") != "",
               F.concat(F.lit(" ON UPDATE "), F.col("update_rule")))
        .otherwise(F.lit("")),
    )
    tbl = F.concat(F.lit(target_schema), F.lit("."), F.col("table_name"))
    ddl = (
        F.when(kind == "ADD",
               F.concat(F.lit("ALTER TABLE "), tbl,
                        F.lit(" ADD FOREIGN KEY ("), F.col("columns"),
                        F.lit(") REFERENCES "), F.col("ref_schema"), F.lit("."),
                        F.col("ref_table"), F.lit("("), F.col("ref_columns"),
                        F.lit(")"), rule, F.lit(";")))
        .when(kind == "DROP",
              F.concat(F.lit("ALTER TABLE "), tbl, F.lit(" DROP FOREIGN KEY "),
                       F.col("dst_name"), F.lit(";")))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        j.select("table_name", "columns", kind.alias("kind"), ddl.alias("alter_sql"))
        .filter(F.col("kind") != "OK")
    )


def fk_compare_sql(src_sql: str, dst_sql: str, target_schema: str) -> str:
    """DuckDB twin of :func:`fk_compare` over relations with the
    :func:`fks_to_df` column set."""
    key = ", ".join(_FK_KEY)
    using = " AND ".join(f"s.{c} = d.{c}" for c in _FK_KEY)
    return f"""
WITH s AS (SELECT {key}, fk_name AS src_name FROM ({src_sql})),
d AS (SELECT {key}, fk_name AS dst_name FROM ({dst_sql})),
j AS (
  SELECT COALESCE(s.table_name, d.table_name) AS table_name,
         COALESCE(s.columns, d.columns) AS columns,
         COALESCE(s.ref_schema, d.ref_schema) AS ref_schema,
         COALESCE(s.ref_table, d.ref_table) AS ref_table,
         COALESCE(s.ref_columns, d.ref_columns) AS ref_columns,
         COALESCE(s.delete_rule, d.delete_rule) AS delete_rule,
         COALESCE(s.update_rule, d.update_rule) AS update_rule,
         s.src_name, d.dst_name
  FROM s FULL OUTER JOIN d ON {using}
)
SELECT table_name, columns,
       CASE WHEN dst_name IS NULL THEN 'ADD' ELSE 'DROP' END AS kind,
       CASE WHEN dst_name IS NULL THEN
         'ALTER TABLE {target_schema}.' || table_name || ' ADD FOREIGN KEY ('
         || columns || ') REFERENCES ' || ref_schema || '.' || ref_table
         || '(' || ref_columns || ')'
         || CASE WHEN delete_rule <> '' THEN ' ON DELETE ' || delete_rule
                 ELSE '' END
         || CASE WHEN update_rule <> '' THEN ' ON UPDATE ' || update_rule
                 ELSE '' END || ';'
       ELSE
         'ALTER TABLE {target_schema}.' || table_name || ' DROP FOREIGN KEY '
         || dst_name || ';'
       END AS alter_sql
FROM j WHERE src_name IS NULL OR dst_name IS NULL
"""


def checks_to_df(spark, table: str, checks: list[tuple[str, str]]) -> DataFrame:
    """(name, expression) check constraints as a DataFrame."""
    rows = [(table, n, e) for n, e in checks]
    return literal_df(spark, 
        rows, "table_name string, check_name string, expression string")


def check_compare(src: DataFrame, dst: DataFrame, target_schema: str) -> DataFrame:
    """Check-constraint diff keyed on the expression text (the
    reference compares the ConstraintExpression payloads,
    struct_compare_table.go:638)."""
    key = ["table_name", "expression"]
    s = src.select(*key, F.col("check_name").alias("src_name"))
    d = dst.select(*key, F.col("check_name").alias("dst_name"))
    j = s.join(d, key, "full_outer")
    kind = (
        F.when(F.col("dst_name").isNull(), "ADD")
        .when(F.col("src_name").isNull(), "DROP")
        .otherwise("OK")
    )
    tbl = F.concat(F.lit(target_schema), F.lit("."), F.col("table_name"))
    ddl = (
        F.when(kind == "ADD",
               F.concat(F.lit("ALTER TABLE "), tbl, F.lit(" ADD CONSTRAINT "),
                        F.col("src_name"), F.lit(" CHECK "),
                        F.col("expression"), F.lit(";")))
        .when(kind == "DROP",
              F.concat(F.lit("ALTER TABLE "), tbl, F.lit(" DROP CHECK "),
                       F.col("dst_name"), F.lit(";")))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        j.select("table_name", "expression", kind.alias("kind"), ddl.alias("alter_sql"))
        .filter(F.col("kind") != "OK")
    )


def check_compare_sql(src_sql: str, dst_sql: str, target_schema: str) -> str:
    return f"""
WITH s AS (SELECT table_name, expression, check_name AS src_name FROM ({src_sql})),
d AS (SELECT table_name, expression, check_name AS dst_name FROM ({dst_sql})),
j AS (
  SELECT COALESCE(s.table_name, d.table_name) AS table_name,
         COALESCE(s.expression, d.expression) AS expression,
         s.src_name, d.dst_name
  FROM s FULL OUTER JOIN d ON s.table_name = d.table_name AND s.expression = d.expression
)
SELECT table_name, expression,
       CASE WHEN dst_name IS NULL THEN 'ADD' ELSE 'DROP' END AS kind,
       CASE WHEN dst_name IS NULL THEN
         'ALTER TABLE {target_schema}.' || table_name || ' ADD CONSTRAINT '
         || src_name || ' CHECK ' || expression || ';'
       ELSE
         'ALTER TABLE {target_schema}.' || table_name || ' DROP CHECK '
         || dst_name || ';'
       END AS alter_sql
FROM j WHERE src_name IS NULL OR dst_name IS NULL
"""
