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
from pyspark.sql import types as T

from dbms_spark.sources.catalog import TABLES, load_table, table_path
from dbms_spark.plans.parallelism import literal_df


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
    return literal_df(spark, 
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
    df = literal_df(spark, rows, "table_name string, data_type string")
    return df.groupBy("data_type").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# Dictionary-metadata assessments (reference assess_migrate.go:248-1160):
# the catalog here is parquet footers, normalized to the same type
# vocabulary DuckDB's information_schema reports for the registered
# views, so every metadata assessment is differentially checkable.
# ---------------------------------------------------------------------------

_DUCK_TYPE = {
    "int64": "BIGINT", "int32": "INTEGER", "string": "VARCHAR", "large_string": "VARCHAR",
    "double": "DOUBLE", "float": "FLOAT", "binary": "BLOB", "date32[day]": "DATE",
    "bool": "BOOLEAN",
}


def _duck_type_name(t) -> str:
    """pyarrow type -> DuckDB information_schema data_type spelling."""
    import pyarrow as pa

    s = str(t)
    if s in _DUCK_TYPE:
        return _DUCK_TYPE[s]
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"{_duck_type_name(t.value_type)}[]"
    raise ValueError(f"unmapped arrow type {s}")


def column_catalog(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> DataFrame:
    """(table_name, column_name, ordinal, data_type) for the whole
    catalog — the DBA_TAB_COLUMNS analog, read from parquet footers
    (O(tables) driver work, no data scan)."""
    import pyarrow.parquet as pq

    tables = tables or [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
    rows = []
    for t in tables:
        schema = pq.read_schema(table_path(sf_dir, t))
        for i, f in enumerate(schema):
            rows.append((t, f.name, i + 1, _duck_type_name(f.type)))
    return literal_df(spark, 
        rows, "table_name string, column_name string, ordinal int, data_type string"
    )


def column_counts_over_limit(spark: SparkSession, sf_dir: str, limit: int) -> DataFrame:
    """Tables whose column count exceeds ``limit`` (reference:
    GetDatabaseSchemaTableColumnCountsOverLimit assess_migrate.go:605)."""
    return (
        column_catalog(spark, sf_dir)
        .groupBy("table_name")
        .agg(F.count(F.lit(1)).alias("column_counts"))
        .filter(F.col("column_counts") > limit)
    )


def column_name_length_over_limit(spark: SparkSession, sf_dir: str, limit: int) -> DataFrame:
    """Columns whose name exceeds ``limit`` chars (reference:
    GetDatabaseSchemaTableColumnNameLengthOverLimit assess_migrate.go:728)."""
    cat = column_catalog(spark, sf_dir)
    return (
        cat.select(
            "table_name", "column_name",
            F.length("column_name").cast("bigint").alias("name_length"),
        )
        .filter(F.col("name_length") > limit)
    )


def special_datatype_columns(spark: SparkSession, sf_dir: str, types: list[str]) -> DataFrame:
    """Columns of flagged datatypes (reference:
    GetDatabaseSchemaTableSpecialDatatype assess_migrate.go:655) —
    e.g. the types a migration needs manual rules for."""
    cat = column_catalog(spark, sf_dir)
    return cat.filter(F.col("data_type").isin(types)).select(
        "table_name", "column_name", "data_type"
    )


def column_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datatype distribution across the catalog (reference:
    GetDatabaseSchemaColumnTypeCounts assess_migrate.go:1160), in the
    shared information_schema vocabulary."""
    return (
        column_catalog(spark, sf_dir)
        .groupBy("data_type")
        .agg(F.count(F.lit(1)).alias("counts"))
    )


def object_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog object counts by type (reference:
    GetDatabaseSchemaCodeObject / overview blocks assess_migrate.go:
    415-447 — object inventory for the compatibility report).  A
    parquet catalog has tables and columns."""
    cat = column_catalog(spark, sf_dir)
    tables = cat.select("table_name").distinct().agg(
        F.count(F.lit(1)).alias("counts")
    ).select(F.lit("TABLE").alias("object_type"), "counts")
    columns = cat.agg(F.count(F.lit(1)).alias("counts")).select(
        F.lit("COLUMN").alias("object_type"), "counts"
    )
    return tables.unionAll(columns)


def avg_row_length_top(spark: SparkSession, sf_dir: str, tables: list[str], n: int = 3,
                       sample_pct: float = 100.0) -> DataFrame:
    """TOP-N tables by average row length (reference:
    GetDatabaseSchemaTableAvgRowLengthTOP assess_migrate.go:475).
    Row length is the length of the table's canonical row string —
    data-derived on both engines, scanned with partial aggregation.
    The reference reads dictionary STATS (an estimate); ``sample_pct``
    matches that contract at scale via the deterministic md5-prefix
    sample (identical subset on both engines), so a 100 TB assessment
    reads a bounded fraction instead of canonicalizing every row."""
    from pyspark.sql import Window

    from dbms_spark.functions.canonical import canonical_row
    from dbms_spark.operators.scan import deterministic_sample
    from dbms_spark.plans.parallelism import ensure_parallelism

    u = _avg_row_lengths(spark, sf_dir, tables, sample_pct)
    w = Window.orderBy(F.desc("avg_row_len"), F.asc("table_name"))
    return (
        u.select("table_name", "avg_row_len", F.row_number().over(w).cast("bigint").alias("rank"))
        .filter(F.col("rank") <= n)
    )


def _avg_row_lengths(spark: SparkSession, sf_dir: str, tables: list[str],
                     sample_pct: float) -> DataFrame:
    from pyspark.sql import types as T

    from dbms_spark.functions.canonical import canonical_row_length
    from dbms_spark.operators.scan import deterministic_sample, deterministic_sample_int
    from dbms_spark.plans.parallelism import ensure_parallelism

    per = []
    for t in tables:
        # sample FIRST, spread second: the repartition must shuffle only
        # the sampled fraction, not the full wide table — the sampling
        # filter itself is a cheap narrow scan, while the canonical-row
        # projection after it is the per-row CPU that needs the cores.
        # Integer keys take the multiplicative-hash filter (pure int
        # ops in the scan); others the md5-prefix filter.
        df = load_table(spark, sf_dir, t)
        if sample_pct < 100.0:
            key = df.columns[0]
            if isinstance(df.schema[key].dataType,
                          (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                df = deterministic_sample_int(df, key, sample_pct)
            else:
                df = deterministic_sample(df, key, sample_pct)
        df = ensure_parallelism(df)
        per.append(
            df.select(canonical_row_length(df).alias("len"))
            .agg(F.sum("len").alias("s"), F.count(F.lit(1)).alias("c"))
            .select(
                F.lit(t).alias("table_name"),
                (F.col("s").cast("double") / F.col("c")).alias("avg_row_len"),
            )
        )
    return reduce(DataFrame.unionAll, per)


def avg_row_length_over_limit(spark: SparkSession, sf_dir: str, tables: list[str],
                              limit_bytes: float, sample_pct: float = 100.0) -> DataFrame:
    """Tables whose (sampled) average canonical-row length exceeds a
    byte limit (reference: GetDatabaseSchemaTableAvgRowLengthOverLimitMB
    assess_migrate.go:554 — the MB threshold there divides dictionary
    AVG_ROW_LEN the same way)."""
    return _avg_row_lengths(spark, sf_dir, tables, sample_pct).filter(
        F.col("avg_row_len") > limit_bytes)


def table_name_length_over_limit(spark: SparkSession, sf_dir: str, limit: int) -> DataFrame:
    """Tables whose name length exceeds the target's identifier limit
    (reference: GetDatabaseSchemaTableNameLengthOverLimit
    assess_migrate.go:697)."""
    tables = [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
    df = literal_df(spark, [(t,) for t in tables], "table_name string")
    return (
        df.select("table_name", F.length("table_name").cast("bigint").alias("name_length"))
        .filter(F.col("name_length") > limit)
    )


def constraint_type_counts(idx_df: DataFrame) -> DataFrame:
    """Constraint/index breakdown by kind (reference:
    GetDatabaseSchemaConstraintTypeCounts assess_migrate.go:1094 and
    GetDatabaseSchemaIndexTypeCounts :1115) over an index-spec catalog
    (:func:`dbms_spark.operators.structm.indexes_to_df`)."""
    kind = (
        F.when(F.col("is_primary"), F.lit("PRIMARY"))
        .when(F.col("is_unique"), F.lit("UNIQUE"))
        .otherwise(F.lit("NORMAL"))
    )
    return (
        idx_df.groupBy(kind.alias("constraint_type"))
        .agg(F.count(F.lit(1)).alias("counts"))
    )


def column_default_counts(spec_df: DataFrame) -> DataFrame:
    """Column counts per DATA_DEFAULT expression (reference:
    GetDatabaseSchemaColumnDataDefaultCounts assess_migrate.go:927)
    over a column-spec catalog (:func:`structm.specs_to_df`)."""
    return (
        spec_df.groupBy(F.coalesce(F.col("default"), F.lit("NULL")).alias("data_default"))
        .agg(F.count(F.lit(1)).alias("counts"))
    )


def partition_counts_over_limit(
    spark: SparkSession, sf_dir: str, specs: dict[str, str], limit: int
) -> DataFrame:
    """Tables whose logical RANGE(DAY) partition count exceeds
    ``limit`` (reference: GetDatabaseSchemaPartitionTableCountsOverLimit
    assess_migrate.go:527).  ``specs`` maps table -> its time column;
    a partition is one distinct day of that column — the natural
    partition spec a parquet lake would use for the table."""
    per = []
    for t, col in specs.items():
        df = load_table(spark, sf_dir, t)
        per.append(
            df.select(F.to_date(F.col(col)).alias("d"))
            .agg(F.countDistinct("d").alias("partition_counts"))
            .select(
                F.lit(t).alias("table_name"),
                F.lit("RANGE(DAY)").alias("partition_type"),
                F.col("partition_counts").cast("bigint").alias("partition_counts"),
            )
        )
    u = reduce(DataFrame.unionAll, per)
    return u.filter(F.col("partition_counts") > limit)


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


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column numeric profile (min / max / exact interpolated
    p25/p50/p95) — the data-derived side of the reference's NUMBER
    classification assessments (assess_migrate.go NUMBER blocks,
    GetDatabaseSchemaColumnTypeCounts neighborhood).

    Plan shape: unpivot the profiled columns to (cid, v), RANGE-
    partition the stacked frame on (cid, v) so every shuffle partition
    holds a bounded contiguous slice (a slice of one column, or the
    tail of one and the head of the next), compute global ranks as
    per-partition row_number + a cumulative offset derived from the
    tiny per-(partition, cid) count relation, then take order
    statistics by rank.  Exact interpolated quantiles via
    ``percentile()`` would build a value->count hashmap per aggregate
    buffer and merge+sort it in one reducer — memory O(distinct
    values), serial at the end, an OOM at scale.  A window partitioned
    by cid alone would be worse still: ALL of one column's values sort
    in ONE task, so a single hot column caps at executor memory.  The
    range-partitioned form bounds every task at ~|stacked| / shuffle
    partitions regardless of how values skew across columns — the
    shape that survives a 100x scale-up.  min/max ride the same final
    pass as ranks 0 and n-1.  Interpolation is
    ``lo + (pos - floor(pos)) * (hi - lo)`` with ``pos = p * (n - 1)``
    — bit-identical to both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` (equal values may straddle a partition boundary,
    but rank positions of equal values are interchangeable, so the
    rank->value mapping is unaffected)."""
    from pyspark.sql import Window

    ps = [0.25, 0.5, 0.95]
    # stack on an INT column id, not the name: the id is 4 bytes in the
    # sort shuffle where the name string would be ~15, and the name
    # comes back via a literal map after aggregation
    stacked_expr = ", ".join(f"{i}, CAST({c} AS DOUBLE)" for i, c in enumerate(cols))
    stacked = (
        df.select(*cols)
        .selectExpr(f"stack({len(cols)}, {stacked_expr}) AS (cid, v)")
        .filter(F.col("v").isNotNull())
    )
    # bounded-partition global ranks: range-partition on (cid, v),
    # stamp the partition id, and turn per-(pid, cid) row_numbers into
    # global per-cid ranks by adding the cumulative count of earlier
    # partitions — the offset relation is O(partitions x columns) rows,
    # so its cumsum window and the broadcast join are free
    nparts = stacked.sparkSession.sparkContext.defaultParallelism
    rp = (
        stacked.repartitionByRange(nparts, "cid", "v")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    per_part = rp.groupBy("pid", "cid").agg(F.count(F.lit(1)).alias("pc"))
    w_off = (
        Window.partitionBy("cid").orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_part.select(
        "pid", "cid",
        F.coalesce(F.sum("pc").over(w_off), F.lit(0)).alias("off"),
    )
    # per-column n folds out of the SAME per-(pid, cid) count relation
    # — deriving it from `stacked` directly would re-run the unpivot
    # scan a second time over the full input
    counts = per_part.groupBy("cid").agg(F.sum("pc").alias("n"))
    w = Window.partitionBy("pid", "cid").orderBy("v")
    ranked = (
        rp.join(F.broadcast(offsets), ["pid", "cid"])
        .select(
            "cid", "v",
            (F.row_number().over(w) - 1 + F.col("off")).alias("rn"),
        )
        .join(F.broadcast(counts), "cid")
    )
    pos = {p: F.lit(p) * (F.col("n") - 1).cast("double") for p in ps}
    aggs = [F.min("v").alias("min_v"), F.max("v").alias("max_v")]
    for i, p in enumerate(ps):
        lo, hi = F.floor(pos[p]), F.ceil(pos[p])
        aggs += [
            F.max(F.when(F.col("rn") == lo, F.col("v"))).alias(f"__lo{i}"),
            F.max(F.when(F.col("rn") == hi, F.col("v"))).alias(f"__hi{i}"),
            F.max(pos[p] - lo.cast("double")).alias(f"__fr{i}"),
        ]
    wide = ranked.groupBy("cid").agg(*aggs)
    names = ["p25", "p50", "p95"]
    quantiles = [
        (F.col(f"__lo{i}") + F.col(f"__fr{i}") * (F.col(f"__hi{i}") - F.col(f"__lo{i}")))
        .alias(names[i])
        for i in range(len(ps))
    ]
    name_map = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(cols))]),
        F.array(*[F.lit(c) for c in cols]),
    )
    return wide.select(
        name_map[F.col("cid")].alias("col_name"), "min_v", "max_v", *quantiles)


def tables_without_primary_key(tables_df: DataFrame, idx_df: DataFrame) -> DataFrame:
    """Tables lacking a primary-key constraint (reference:
    GetDatabaseSchemaTableNotPrimaryKey assess_migrate.go neighborhood
    — the no-PK list is a standard migration blocker report).  A
    left-anti join of the table catalog against primary index specs."""
    pks = idx_df.filter(F.col("is_primary")).select("table_name").distinct()
    return tables_df.select("table_name").join(pks, "table_name", "left_anti")


def column_profile(spark: SparkSession, sf_dir: str, table: str,
                   cols: list[str] | None = None) -> DataFrame:
    """Per-column data profile: null count, exact distinct count, and
    canonical min/max strings — one row per column (reference: the
    per-column dictionary profile block of assess_detail.go; here
    data-derived in a single pass).

    Scale shape: one aggregation over the table computes every
    column's stats (Catalyst expands the multi-distinct into one
    logical pass); the stack() unpivot runs over the single result
    row.  At 100 TB swap count_distinct for approx_count_distinct —
    the gate keeps exact so the oracle can match."""
    from functools import reduce as _reduce

    from dbms_spark.functions.canonical import canon_column

    # NO parallelism guard here (round 10): each arm's per-row work is
    # a null check + distinct hash + min/max — far cheaper than the
    # round-robin exchange the guard would fire once PER ARM (the
    # projection pushes below the repartition, so every arm shuffled
    # its column; measured 3.4 → 1.0 s on the 9-column orders gate).
    # On well-laid-out big data the scan is already parallel and the
    # guard was a no-op anyway.
    df = load_table(spark, sf_dir, table)
    cols = cols or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    # one independent single-column aggregate per column, unioned:
    # each arm's scan prunes to ITS column and the lone distinct
    # expands by only 2x — a combined multi-distinct agg would Expand
    # every row x(n_cols+1) and funnel all columns through one
    # aggregation (measured ~2x slower on the 6-column gate)
    arms = []
    for c in cols:
        arms.append(
            df.select(c).agg(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias("__nn"),
                F.count_distinct(F.col(c)).cast("bigint").alias("__nd"),
                F.min(F.col(c)).alias("__mn"),
                F.max(F.col(c)).alias("__mx"),
            ).select(
                F.lit(c).alias("column_name"),
                F.col("__nn").alias("n_nulls"),
                F.col("__nd").alias("n_distinct"),
                canon_column(F.col("__mn"), fields[c]).alias("min_val"),
                canon_column(F.col("__mx"), fields[c]).alias("max_val"),
            )
        )
    return _reduce(DataFrame.unionAll, arms)


def column_profile_sql(sf_dir: str, table: str, cols: list[str] | None = None) -> str:
    """DuckDB twin of :func:`column_profile` (aggregate CTE + one
    UNION ALL arm per column)."""
    from dbms_spark.functions.canonical import canon_sql, parquet_field_types

    fields = parquet_field_types(table_path(sf_dir, table))
    cols = cols or list(fields)
    aggs, arms = [], []
    for i, c in enumerate(cols):
        aggs += [
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS __nn{i}",
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS __nd{i}",
            f"{canon_sql(f'min({c})', fields[c])} AS __mn{i}",
            f"{canon_sql(f'max({c})', fields[c])} AS __mx{i}",
        ]
        arms.append(
            f"SELECT '{c}' AS column_name, __nn{i} AS n_nulls, __nd{i} AS n_distinct, "
            f"__mn{i} AS min_val, __mx{i} AS max_val FROM s"
        )
    return f"WITH s AS (SELECT {', '.join(aggs)} FROM {table})\n" + "\nUNION ALL ".join(arms)


def temporal_profile(spark: SparkSession, sf_dir: str,
                     table_cols: list[tuple[str, str]]) -> DataFrame:
    """Time-range profile per (table, timestamp column): canonical
    min/max, whole-day span, non-null count — the freshness/coverage
    block of an assessment report.  Min/max partial-aggregate map-side;
    only one row per table shuffles."""
    from dbms_spark.functions.canonical import canon_column

    per = []
    for t, c in table_cols:
        df = load_table(spark, sf_dir, t)
        dtype = df.schema[c].dataType
        per.append(
            df.agg(
                F.min(F.col(c)).alias("__mn"),
                F.max(F.col(c)).alias("__mx"),
                F.count(F.col(c)).cast("bigint").alias("n"),
            ).select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                canon_column(F.col("__mn"), dtype).alias("min_ts"),
                canon_column(F.col("__mx"), dtype).alias("max_ts"),
                F.datediff(F.col("__mx").cast("date"), F.col("__mn").cast("date"))
                .cast("bigint").alias("span_days"),
                "n",
            )
        )
    return reduce(DataFrame.unionAll, per)


def temporal_profile_sql(sf_dir: str, table_cols: list[tuple[str, str]]) -> str:
    from dbms_spark.functions.canonical import canon_sql, parquet_field_types

    arms = []
    for t, c in table_cols:
        fields = parquet_field_types(table_path(sf_dir, t))
        arms.append(
            f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
            f"{canon_sql(f'min({c})', fields[c])} AS min_ts, "
            f"{canon_sql(f'max({c})', fields[c])} AS max_ts, "
            f"CAST(date_diff('day', CAST(min({c}) AS DATE), CAST(max({c}) AS DATE)) AS BIGINT)"
            f" AS span_days, CAST(COUNT({c}) AS BIGINT) AS n FROM {t}"
        )
    return "\nUNION ALL ".join(arms)


def parquet_layout_report(spark: SparkSession, sf_dir: str,
                          tables: list[str] | None = None) -> DataFrame:
    """Physical layout report per table file: rows, row groups, and
    rows-per-group — the scan-parallelism diagnostic (a 600k-row file
    with ONE row group scans as one task; this report is how you see
    it before the stage graph does).  Footer reads only — no data
    scan."""
    import pyarrow.parquet as pq

    tables = tables or [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
    rows = []
    for t in tables:
        md = pq.read_metadata(table_path(sf_dir, t))
        rows.append((t, md.num_rows, md.num_row_groups,
                     max(md.row_group(i).num_rows for i in range(md.num_row_groups))))
    return literal_df(spark, 
        rows,
        "table_name string, num_rows long, num_row_groups long, max_group_rows long")


def parquet_layout_report_sql(sf_dir: str, tables: list[str] | None = None) -> str:
    tables = tables or [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
    arms = []
    for t in tables:
        p = table_path(sf_dir, t)
        arms.append(f"""
SELECT '{t}' AS table_name,
       (SELECT CAST(num_rows AS BIGINT) FROM parquet_file_metadata('{p}')) AS num_rows,
       (SELECT CAST(num_row_groups AS BIGINT) FROM parquet_file_metadata('{p}')) AS num_row_groups,
       (SELECT CAST(MAX(row_group_num_rows) AS BIGINT)
        FROM (SELECT DISTINCT row_group_id, row_group_num_rows
              FROM parquet_metadata('{p}'))) AS max_group_rows
""")
    return "\nUNION ALL ".join(arms)


def approx_ndv_profile(df: DataFrame, cols: list[str] | None = None,
                       rsd: float = 0.05) -> DataFrame:
    """The 100 TB form of :func:`column_profile`'s distinct counts:
    HyperLogLog++ sketches (``approx_count_distinct``) for every column
    in ONE aggregation — no Expand, no per-column shuffle, fixed sketch
    state per column regardless of cardinality.  ``rsd`` is the target
    relative standard deviation.  No DuckDB oracle (estimates differ by
    construction); the unit test bounds the error against exact."""
    cols = cols or df.columns
    wide = df.agg(*[
        F.approx_count_distinct(F.col(c), rsd).cast("bigint").alias(f"__nd{i}")
        for i, c in enumerate(cols)
    ])
    stacked = ", ".join(f"'{c}', __nd{i}" for i, c in enumerate(cols))
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (column_name, approx_ndv)")


def approx_percentile_profile(df: DataFrame, cols: list[str],
                              percentiles: list[float] | None = None,
                              accuracy: int = 10000) -> DataFrame:
    """The 100 TB form of :func:`numeric_profile`'s exact quantiles:
    ``percentile_approx`` (Greenwald-Khanna) sketches for every column
    in one aggregation — bounded state instead of a full sort per
    column.  No DuckDB oracle (approximate by construction); the unit
    test bounds rank error against exact."""
    ps = percentiles or [0.25, 0.5, 0.95]
    wide = df.agg(*[
        F.percentile_approx(F.col(c), ps, accuracy).alias(f"__p{i}")
        for i, c in enumerate(cols)
    ])
    stacked = ", ".join(f"'{c}', __p{i}" for i, c in enumerate(cols))
    out = wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (column_name, qs)")
    return out.select(
        "column_name",
        *[F.col("qs")[i].alias(f"p{int(p * 100)}") for i, p in enumerate(ps)])


# ---------------------------------------------------------------------------
# O2M compatibility matrix (reference model/buildin/
# buildin_rule_compatible.go:22-565): can each harvested object kind
# migrate to a MySQL-compatible target as-is (compatible) and/or be
# auto-converted (convertible)?  The assessment report joins the
# object inventory against this matrix.
# ---------------------------------------------------------------------------

#: (category, object_name, is_compatible, is_convertible)
def _o2m_compatible_rules() -> list[tuple[str, str, bool, bool]]:
    """The reference's FULL built-in classification set — verified
    row-by-row parity (round 6): buildin_rule_compatible.go's 1,132
    LoC hold 150 raw appends = 75 per target with two intra-function
    duplicates each (ListHash, Reference), i.e. 73 UNIQUE entries per
    target, and the O2M/O2T verdict pairs are identical for every
    entry — so this one 73-row table covers both flows with zero
    missing classifications (every kind the reference classifies gets
    a non-NULL verdict in compatibility_report).  Expressed compactly:
    every code-type object is no/no except LOB
    (compatible-but-not-convertible), so the 42-name code family is
    generated rather than written out row by row."""
    rules: list[tuple[str, str, bool, bool]] = [
        ("charset", "AL32UTF8", True, True),
        ("charset", "ZHS16GBK", True, True),
        ("table_type", "HEAP", True, True),
        ("table_type", "CLUSTERED", False, True),
        ("table_type", "TEMPORARY", True, True),
        ("table_type", "PARTITIONED", True, True),
        ("constraint_type", "P", True, True),
        ("constraint_type", "U", True, True),
        ("constraint_type", "C", False, True),
        ("constraint_type", "F", False, True),
        ("index_type", "NORMAL", True, True),
        ("index_type", "FUNCTION-BASED NORMAL", False, True),
        ("index_type", "BITMAP", False, False),
        ("index_type", "FUNCTION-BASED BITMAP", False, False),
        ("index_type", "DOMAIN", False, False),
        ("object_type", "VIEW", True, True),
        # LOB segments migrate as column data but have no standalone
        # object to convert (reference CodeTypeLob yes/no)
        ("object_type", "LOB", True, False),
    ]
    code_types = [
        "MATERIALIZED VIEW", "CLUSTER", "CONSUMER GROUP", "CONTEXT",
        "DESTINATION", "DIRECTORY", "EDITION", "EVALUATION CONTEXT",
        "FUNCTION", "INDEX PARTITION", "INDEXTYPE", "JAVA CLASS",
        "JAVA DATA", "JAVA RESOURCE", "JAVA SOURCE", "JOB", "JOB CLASS",
        "LIBRARY", "LOB PARTITION", "LOCKDOWN PROFILE", "OPERATOR",
        "PACKAGE", "PACKAGE BODY", "PROCEDURE", "PROGRAM", "QUEUE",
        "RESOURCE PLAN", "RULE", "RULE SET", "SCHEDULE",
        "SCHEDULER GROUP", "SEQUENCE", "SYNONYM", "TRIGGER", "TYPE",
        "TYPE BODY", "UNDEFINED", "UNIFIED AUDIT POLICY", "WINDOW",
        "XML SCHEMA", "DATABASE LINK",
    ]
    rules += [("object_type", n, False, False) for n in code_types]
    # single-level partitions migrate (not natively compatible past
    # RANGE/LIST/HASH); composite and exotic schemes do not
    for p in ("RANGE", "LIST", "HASH"):
        rules.append(("partition_type", p, True, False))
    for p in ("SYSTEM", "REFERENCE", "COMPOSITE", "INTERVAL",
              "RANGE-HASH", "RANGE-LIST", "RANGE-RANGE",
              "LIST-HASH", "LIST-LIST", "LIST-RANGE"):
        rules.append(("partition_type", p, False, False))
    rules += [
        ("temp_table_type", "SYS$SESSION", False, False),
        ("temp_table_type", "SYS$TRANSACTION", False, False),
    ]
    return rules


#: category, object_name, is_compatible, is_convertible — 73 rows
O2M_COMPATIBLE_RULES: list[tuple[str, str, bool, bool]] = _o2m_compatible_rules()


def compatibility_report(objects: DataFrame) -> DataFrame:
    """Join a harvested object inventory (category, object_name,
    n_objects) against the compatibility matrix: per object kind, the
    count plus the compatible/convertible verdict (NULL verdicts =
    kind unknown to the matrix -> manual review).  Matrix broadcast;
    one join, no shuffle beyond the inventory's own aggregation."""
    spark = objects.sparkSession
    rules = literal_df(spark, 
        O2M_COMPATIBLE_RULES,
        "category string, object_name string, is_compatible boolean, "
        "is_convertible boolean")
    return (
        objects.join(F.broadcast(rules), ["category", "object_name"], "left")
        .select("category", "object_name", "n_objects",
                "is_compatible", "is_convertible")
    )


def object_name_length_over_limit(df: DataFrame, name_col: str,
                                  object_type: str, limit: int) -> DataFrame:
    """Generic identifier-length check — the reference ships six
    near-identical dictionary queries (Username/TableName/ColumnName/
    IndexName/ViewName/SequenceName LengthOverLimit,
    assess_migrate.go:679-841); here they are ONE operator
    parameterized by catalog + name column, instantiated per object
    family by the caller."""
    return (
        df.select(
            F.lit(object_type).alias("object_type"),
            F.col(name_col).alias("object_name"),
            F.length(name_col).cast("bigint").alias("name_length"),
        )
        .filter(F.col("name_length") > limit)
    )


def index_counts_over_limit(idx_df: DataFrame, limit: int) -> DataFrame:
    """Tables carrying more indexes than the target tolerates
    (reference: GetDatabaseSchemaTableIndexCountsOverLimit
    assess_migrate.go:630) over an index-spec catalog
    (:func:`structm.indexes_to_df`)."""
    return (
        idx_df.groupBy("table_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("index_counts"))
        .filter(F.col("index_counts") > limit)
    )


def code_object_summary(code_df: DataFrame) -> DataFrame:
    """Stored-code inventory rollup: objects and line mass per TYPE
    (reference: GetDatabaseSchemaCodeObject assess_migrate.go:415 —
    DBA_SOURCE max-line per object, here pre-harvested to
    (object_name, object_type, lines) rows).  Code objects don't
    migrate mechanically; this sizes the manual-rewrite backlog."""
    return (
        code_df.groupBy("object_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_objects"),
            F.sum("lines").cast("bigint").alias("total_lines"),
            F.max("lines").cast("bigint").alias("max_lines"),
        )
    )


def partition_type_counts(parts_df: DataFrame) -> DataFrame:
    """Partitioned-table counts per partition TYPE (reference:
    GetDatabaseSchemaPartitionTypeCounts assess_migrate.go:1001) over
    a partition-spec catalog (:func:`structm.partitions_to_df`) —
    one row per (partition_type), counting TABLES not partitions."""
    return (
        parts_df.select("table_name", "partition_type").distinct()
        .groupBy("partition_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tables"))
    )


#: byte-width ladder for index-length accounting (MySQL-ish widths;
#: VARCHAR assumes a 255-char utf8mb4 prefix — the worst case InnoDB
#: actually indexes)
INDEX_BYTE_WIDTHS: list[tuple[str, int]] = [
    ("BIGINT", 8), ("INTEGER", 4), ("SMALLINT", 2), ("TINYINT", 1),
    ("DOUBLE", 8), ("FLOAT", 4), ("DECIMAL", 16), ("BOOLEAN", 1),
    ("DATE", 3), ("TIMESTAMP", 7), ("VARCHAR", 1024), ("BLOB", 1024),
]


def index_length_over_limit(idx_df: DataFrame, catalog_df: DataFrame,
                            limit: int) -> DataFrame:
    """Indexes whose summed key byte width exceeds the target's limit
    (reference: GetDatabaseSchemaTableIndexLengthOverLimit
    assess_migrate.go:581; InnoDB caps index keys at 3072 bytes).

    ``idx_df``: index-spec catalog (:func:`structm.indexes_to_df`,
    ``columns`` comma-joined); ``catalog_df``: column catalog with
    ``data_type`` (:func:`column_catalog`).  The width ladder is rule
    DATA broadcast into the join, the explode is O(index columns) —
    catalog-sized, never data-sized."""
    spark = idx_df.sparkSession
    widths = literal_df(spark, INDEX_BYTE_WIDTHS, "base_type string, byte_width int")
    keyed = idx_df.select(
        "table_name", "index_name",
        F.explode(F.split("columns", ",")).alias("column_name"))
    # join on the BASE type name: catalogs spell parameterized types as
    # DECIMAL(15,2) / VARCHAR(80); the width rules are per-family
    cat = catalog_df.withColumn(
        "base_type", F.trim(F.split(F.col("data_type"), r"\(").getItem(0)))
    return (
        keyed.join(cat, ["table_name", "column_name"])
        .join(F.broadcast(widths), "base_type", "left")
        .groupBy("table_name", "index_name")
        .agg(F.sum(F.coalesce("byte_width", F.lit(8))).cast("bigint")
             .alias("index_bytes"))
        .filter(F.col("index_bytes") > limit)
    )


def table_type_counts(types_df: DataFrame) -> DataFrame:
    """Table counts per storage type — HEAP / PARTITIONED / TEMPORARY /
    CLUSTERED / MATERIALIZED VIEW / EXTERNAL (reference:
    GetDatabaseSchemaTableTypeCounts assess_migrate.go:841 plus the
    TemporaryTableTypeCounts :1072 breakdown) over a harvested
    (table_name, table_type) catalog."""
    return (
        types_df.groupBy("table_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("counts"))
    )


def dictionary_overview(synonyms_df: DataFrame, mviews_df: DataFrame,
                        idx_df: DataFrame, subparts_df: DataFrame) -> DataFrame:
    """One dictionary-report rollup closing the reference's remaining
    assessment queries: synonym counts per referenced schema
    (GetDatabaseSchemaSynonymObject assess_migrate.go:509),
    materialized views per refresh method (:518 — these never migrate
    mechanically), per-table index counts
    (GetDatabaseSchemaTableIndexOverview :248), and composite
    PARTITION-SUBPARTITION type counts with 'NONE' subpartitioning
    excluded (:1036).  Uniform (section, item, counts) shape — the
    row form an assessment report renders."""
    syn = (synonyms_df.groupBy("table_owner")
           .agg(F.count(F.lit(1)).alias("counts"))
           .select(F.lit("SYNONYM").alias("section"),
                   F.col("table_owner").alias("item"), "counts"))
    mv = (mviews_df.groupBy("refresh_method")
          .agg(F.count(F.lit(1)).alias("counts"))
          .select(F.lit("MVIEW").alias("section"),
                  F.col("refresh_method").alias("item"), "counts"))
    ix = (idx_df.groupBy("table_name")
          .agg(F.count(F.lit(1)).alias("counts"))
          .select(F.lit("INDEX_OVERVIEW").alias("section"),
                  F.col("table_name").alias("item"), "counts"))
    sp = (subparts_df.filter(F.col("subpartitioning_type") != "NONE")
          .select(F.concat_ws("-", "partitioning_type",
                              "subpartitioning_type").alias("item"))
          .groupBy("item").agg(F.count(F.lit(1)).alias("counts"))
          .select(F.lit("SUBPARTITION").alias("section"), "item", "counts"))
    return (syn.unionAll(mv).unionAll(ix).unionAll(sp)
            .select("section", "item", F.col("counts").cast("bigint").alias("counts")))


def derive_profile_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(lo, hi) per column from ONE min/max aggregation pass — the
    derive-the-knob companion for approx_numeric_profile when declared
    ranges aren't known (hi widened by one part-per-thousand so the
    true max doesn't clamp into the last bin's edge)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("double").alias(f"__lo_{c}"),
                 F.max(c).cast("double").alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        if lo is None:          # all-NULL column: any non-empty range
            lo, hi = 0.0, 1.0
        if hi <= lo:
            hi = lo + 1.0       # constant column: one-bin histogram
        out[c] = (float(lo), float(hi) + (float(hi) - float(lo)) * 1e-3)
    return out


def approx_numeric_profile(df: DataFrame,
                           ranges: dict[str, tuple[float, float]] | list[str],
                           nbins: int = 64,
                           ps: list[float] | None = None) -> DataFrame:
    """Sketch-based multi-column quantile profile: (col_name, p, value)
    for every numeric column in ``ranges`` — the at-scale form of
    :func:`numeric_profile` (exact ranks, one range-partitioned sort
    PER COLUMN) for tables where even one sort pass is too much.  ONE
    pass over the table: each row explodes into (col, bin) pairs
    (map-side arithmetic), a single partial-aggregated groupBy builds
    every per-column histogram at once, and ONE grouped window pass
    interpolates all quantiles, decoding each column's value scale
    from a broadcast (col_name, lo, width) relation (error <= one bin
    width of that column's declared range).  Pass a plain column LIST
    to auto-derive ranges from one min/max pass
    (:func:`derive_profile_ranges`) — two table passes total, still no
    per-column sorts."""
    from pyspark.sql.window import Window

    from dbms_spark.operators.sketch import _hist_bin_expr

    if isinstance(ranges, list):    # column names only: derive ranges
        ranges = derive_profile_ranges(df, ranges)
    ps = ps or [0.25, 0.5, 0.95]
    arms = [
        f"named_struct('col_name', '{c}', 'bin', "
        f"CASE WHEN {c} IS NULL THEN CAST(NULL AS BIGINT) "
        f"ELSE {_hist_bin_expr(c, lo, hi, nbins)} END)"
        for c, (lo, hi) in sorted(ranges.items())]
    pairs = (df.select(F.explode(F.array(*[F.expr(a) for a in arms])).alias("cb"))
             .select(F.col("cb.col_name").alias("col_name"),
                     F.col("cb.bin").alias("bin"))
             .where(F.col("bin").isNotNull()))
    hist = pairs.groupBy("col_name", "bin").agg(
        F.count("*").cast("bigint").alias("cnt"))
    scales = literal_df(df.sparkSession, 
        [(c, float(lo), (float(hi) - float(lo)) / float(nbins))
         for c, (lo, hi) in sorted(ranges.items())],
        "col_name string, lo double, width double")
    wg = Window.partitionBy("col_name")
    cum = hist.select(
        "col_name", "bin", "cnt",
        F.sum("cnt").over(wg.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(wg).alias("total"))
    psdf = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"))
    hit = (cum.crossJoin(psdf)
           .where((F.col("cum") >= F.col("p") * F.col("total"))
                  & (F.col("cnt") > 0)))
    w = Window.partitionBy("col_name", "p").orderBy("bin")
    return (hit.withColumn("rn", F.row_number().over(w)).where("rn = 1")
            .join(F.broadcast(scales), "col_name")
            .select(
                "col_name", "p",
                (F.col("lo") + (F.col("bin")
                 + (F.col("p") * F.col("total")
                    - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
                 * F.col("width")).alias("value")))


def approx_numeric_profile_sql(table: str, ranges: dict[str, tuple[float, float]],
                               nbins: int = 64,
                               ps: list[float] | None = None) -> str:
    ps = ps or [0.25, 0.5, 0.95]

    def _bin(c, lo, hi):
        return (f"LEAST({nbins - 1}, GREATEST(0, CAST(floor("
                f"(CAST({c} AS DOUBLE) - {float(lo)}) * {float(nbins)}"
                f" / {float(hi - lo)}) AS BIGINT)))")

    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, {_bin(c, lo, hi)} AS bin FROM {table} "
        f"WHERE {c} IS NOT NULL"
        for c, (lo, hi) in sorted(ranges.items()))
    scales = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({float(lo)} AS DOUBLE) AS lo, "
        f"CAST({(float(hi) - float(lo)) / float(nbins)} AS DOUBLE) AS width"
        for c, (lo, hi) in sorted(ranges.items()))
    parms = " UNION ALL ".join(
        f"SELECT CAST({float(p)} AS DOUBLE) AS p" for p in ps)
    return f"""
WITH h AS (
  SELECT col_name, bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({arms}) GROUP BY 1, 2
),
cum AS (
  SELECT col_name, bin, cnt,
         SUM(cnt) OVER (PARTITION BY col_name ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY col_name) AS total
  FROM h
),
ps AS ({parms}),
scales AS ({scales}),
hit AS (
  SELECT col_name, p, bin, cnt, cum, total,
         ROW_NUMBER() OVER (PARTITION BY col_name, p ORDER BY bin) AS rn
  FROM cum CROSS JOIN ps
  WHERE cum >= p * total AND cnt > 0
)
SELECT col_name, p,
       lo + (bin + (p * total - (cum - cnt)) / cnt) * width AS value
FROM hit JOIN scales USING (col_name) WHERE rn = 1
"""


def categorical_concentration(df: DataFrame, cols: list[str],
                              group_col: str | None = None) -> DataFrame:
    """Per-column categorical concentration profile in ONE table pass:
    (col_name, n_rows, ndv, top_share_ppm, simpson_ppm).

    ``simpson_ppm`` is the Simpson/Herfindahl index Σ(cnt_i/n)² —
    the probability two random rows share a value — and
    ``top_share_ppm`` the modal share; together with exact ``ndv``
    they grade how skewed each dimension is (the number a mixing or
    partitioning decision reads: a 0.99-Simpson column is a terrible
    shuffle key, a near-uniform one is fine).  Chosen over Shannon
    entropy deliberately: entropy needs ln() whose last-ulp behavior
    differs across libm implementations, while every quantity here is
    pure integer arithmetic until one final double division of
    integer-exact DECIMAL values — bit-identical cross-engine.

    Scale shape: like :func:`approx_numeric_profile`, each row
    explodes map-side into (col, value) pairs, ONE partial-aggregated
    groupBy builds every per-column value-count relation at once, and
    a second ≤(Σ ndv)-row aggregation folds the profile.  NULLs are
    excluded (a NULL is not a category).  cnt² sums accumulate in
    DECIMAL(38,0) — exact past 2^63 — before the final division.
    With ``group_col`` the profile is computed per group (per-source
    skew reports) — both aggregations just gain the group key.
    """
    g = [group_col] if group_col else []
    arms = [
        f"named_struct('col_name', '{c}', 'val', CAST({c} AS STRING))"
        for c in sorted(cols)]
    pairs = (df.select(*g,
                       F.explode(F.array(*[F.expr(a) for a in arms])).alias("cv"))
             .select(*g, F.col("cv.col_name").alias("col_name"),
                     F.col("cv.val").alias("val"))
             .where(F.col("val").isNotNull()))
    vc = pairs.groupBy("col_name", *g, "val").agg(
        F.count("*").cast("bigint").alias("cnt"))
    return (vc.groupBy("col_name", *g)
            .agg(F.sum("cnt").cast("bigint").alias("n_rows"),
                 F.count("*").cast("bigint").alias("ndv"),
                 F.max("cnt").alias("top_cnt"),
                 F.sum(F.col("cnt").cast(T.DecimalType(38, 0))
                       * F.col("cnt")).alias("s2"))
            .select(
                "col_name", *g, "n_rows", "ndv",
                F.floor(F.col("top_cnt").cast("double") * 1000000
                        / F.col("n_rows")).cast("bigint").alias("top_share_ppm"),
                F.floor(F.col("s2").cast("double") * 1000000
                        / (F.col("n_rows").cast("double")
                           * F.col("n_rows").cast("double")))
                .cast("bigint").alias("simpson_ppm")))


def categorical_concentration_sql(table: str, cols: list[str],
                                  group_col: str | None = None) -> str:
    """DuckDB twin of :func:`categorical_concentration` (grouped form
    with ``group_col``)."""
    gsel = f"{group_col}, " if group_col else ""
    gkeys = f", {group_col}" if group_col else ""
    arms = " UNION ALL ".join(
        f"SELECT {gsel}'{c}' AS col_name, CAST({c} AS VARCHAR) AS val "
        f"FROM {table} WHERE {c} IS NOT NULL"
        for c in sorted(cols))
    return f"""
WITH vc AS (
  SELECT col_name{gkeys}, val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({arms}) GROUP BY ALL
)
SELECT col_name{gkeys},
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS ndv,
       CAST(floor(CAST(MAX(cnt) AS DOUBLE) * 1000000 / SUM(cnt)) AS BIGINT)
         AS top_share_ppm,
       CAST(floor(CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * cnt) AS DOUBLE) * 1000000
                  / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)))
            AS BIGINT) AS simpson_ppm
FROM vc GROUP BY col_name{gkeys}
"""


def mad_outlier_profile(df: DataFrame, cols: list[str],
                        k: float = 3.0,
                        group_col: str | None = None,
                        broadcast_medians: bool = True) -> DataFrame:
    """Robust per-column outlier report: (col_name, median_v, mad,
    n_outliers, outlier_ppm) where MAD = median(|x - median|) and a
    row is an outlier iff |x - median| > k * MAD — the
    median/MAD-based fence that, unlike mean/stddev z-scores, is not
    dragged by the very outliers it is hunting (a handful of 10^9
    values shifts a mean fence past everything; the median fence
    doesn't move).  The data-quality screen a migration acceptance
    runs per numeric column.  With ``group_col`` the whole profile is
    computed PER GROUP (per-source / per-day numeric quality screens)
    from the same three passes — every aggregation just gains the
    group key.  The median/MAD relations are group_count x col_count
    rows; they broadcast back by default, or shuffle-join on the
    (col, group) key with ``broadcast_medians=False`` when groups run
    to the millions (the tfidf broadcast_docfreq pattern).

    Shape: rows explode map-side into (col, val) pairs, then three
    grouped aggregations over that relation (median, MAD, fence
    count) — scans are O(3) regardless of column count, aggregation
    state is one percentile buffer per column, and nothing is
    collected.  MAD = 0 (majority-constant column) makes every
    off-median value an outlier — that is the textbook behavior and
    usually the interesting signal.  Exact interpolated percentiles
    (Spark percentile() / DuckDB quantile_cont agree bit-for-bit on
    the same doubles — gate q119 pins the pair).
    """
    from dbms_spark.plans.parallelism import ensure_parallelism

    g = [group_col] if group_col else []
    cs = sorted(cols)
    # WIDE form (optimization round 10, guide §2.3/§2.4): the previous
    # shape exploded every row into C (col, val) pairs, persisted that
    # C-times-larger relation, and ran three groupBy(col_name…)
    # aggregations over it — shuffling the exploded corpus three times
    # and (on single-row-group inputs) building every percentile
    # buffer in one task.  The per-COLUMN percentiles need no
    # row-explosion at all: aggregate all C columns side by side in
    # one pass per stage (median → MAD → fence), broadcast the
    # group_count-row results between passes, and unpivot the final
    # C-wide row(s) at the very end (output rows = C × groups, same as
    # before).  Exchanges now carry partial aggregation state keyed on
    # the group only; the persisted relation is the 1×-size projected
    # base (sf0.1 gate q244: 5.7 → ~2 s; plan diff: Generate+explode
    # gone, 3 exchanges of exploded rows → 3 single/group-key partial
    # aggs).  percentile() buffers are identical per column, so
    # results are bit-for-bit unchanged.
    base = ensure_parallelism(
        df.select(*g, *[F.col(c).cast("double").alias(c) for c in cs]),
        min_bytes=2 << 20,
    ).persist()
    bx = F.broadcast if broadcast_medians else (lambda d: d)

    def _attach(big: DataFrame, small: DataFrame) -> DataFrame:
        # plain-equality join on the group key: NULL-key groups drop,
        # exactly as the previous pair-relation join did
        return big.join(bx(small), g) if g else big.crossJoin(bx(small))

    med = base.groupBy(*g).agg(
        *[F.expr(f"percentile({c}, 0.5D)").alias(f"__med_{c}") for c in cs])
    mad = _attach(base, med).groupBy(*g).agg(
        *[F.first(f"__med_{c}").alias(f"__med_{c}") for c in cs],
        *[F.expr(f"percentile(abs({c} - __med_{c}), 0.5D)")
          .alias(f"__mad_{c}") for c in cs])
    fenced = _attach(base, mad).groupBy(*g).agg(
        *[F.first(f"__med_{c}").alias(f"__med_{c}") for c in cs],
        *[F.first(f"__mad_{c}").alias(f"__mad_{c}") for c in cs],
        *[F.count(c).alias(f"__n_{c}") for c in cs],
        *[F.sum(F.when(F.abs(F.col(c) - F.col(f"__med_{c}"))
                       > F.lit(float(k)) * F.col(f"__mad_{c}"), 1)
                .otherwise(0)).alias(f"__o_{c}") for c in cs])
    arms = ", ".join(
        f"'{c}', __med_{c}, __mad_{c}, __o_{c}, __n_{c}" for c in cs)
    stacked = fenced.select(*g, F.expr(
        f"stack({len(cs)}, {arms}) AS (col_name, median_v, mad, __o, __n)"))
    return (stacked
            # a (col, group) whose values are all NULL produced no pair
            # rows before — drop its empty arm the same way
            .filter(F.col("__n") > 0)
            .select("col_name", *g, "median_v", "mad",
                    F.col("__o").cast("bigint").alias("n_outliers"),
                    F.floor(F.col("__o").cast("double") * 1000000
                            / F.col("__n")).cast("bigint")
                    .alias("outlier_ppm")))


def mad_outlier_profile_sketch(df: DataFrame,
                               ranges: dict[str, tuple[float, float]] | list[str],
                               k: float = 3.0, nbins: int = 256,
                               group_col: str | None = None,
                               broadcast_medians: bool = True) -> DataFrame:
    """Histogram-sketch form of :func:`mad_outlier_profile` for
    million-group corpora: the exact profile's percentile aggregation
    buffers EVERY group's values in memory across three passes — at
    extreme group counts (per-source-per-day screens) that state is
    the corpus itself.  This form bounds state at <= nbins counters
    per (col, group) and never sorts:

    1. one pass bins (col, val) pairs into per-key histograms
       (partial-aggregated groupBy);
    2. median_v = interpolated 0.5-quantile of each key's histogram
       (error <= one bin width of that column's declared range);
    3. second pass histograms |val - median_v| (same width, origin 0)
       — mad = its 0.5-quantile (error <= 2 bin widths: the adev
       distribution itself was shifted by the median estimate);
    4. n_outliers counts the adev-histogram mass in bins whose LOWER
       edge exceeds k * mad — a deterministic undercount of at most
       the fence's covering bin, never a scan of the raw values.

    Two table passes total (the exact form takes three AND holds
    per-group value buffers).  ``ranges`` as in
    :func:`approx_numeric_profile`: a {col: (lo, hi)} dict, or a
    plain column list to auto-derive from one min/max pass.  Output
    schema matches the exact profile (col_name[, group], median_v,
    mad, n_outliers, outlier_ppm) so consumers can swap forms; values
    are approximations with the stated bounds (pinned in
    test_assess).  Fences are data-quality screens — a fence off by a
    bin width flags ~the same rows; columns the sketch flags can be
    re-profiled exactly, one column at a time."""
    from pyspark.sql.window import Window

    if isinstance(ranges, list):
        ranges = derive_profile_ranges(df, ranges)
    g = [group_col] if group_col else []
    keys = ["col_name", *g]
    arms = [
        f"named_struct('col_name', '{c}', 'val', CAST({c} AS DOUBLE))"
        for c in sorted(ranges)]
    scales = literal_df(df.sparkSession, 
        [(c, float(lo), (float(hi) - float(lo)) / float(nbins))
         for c, (lo, hi) in sorted(ranges.items())],
        "col_name string, lo double, width double")
    pairs = (df.select(*g,
                       F.explode(F.array(*[F.expr(a) for a in arms])).alias("cv"))
             .select(*g, F.col("cv.col_name").alias("col_name"),
                     F.col("cv.val").alias("val"))
             .where(F.col("val").isNotNull())
             .join(F.broadcast(scales), "col_name")
             .persist())
    bx = F.broadcast if broadcast_medians else (lambda d: d)

    def _median(h, value_expr):
        """Interpolated 0.5-quantile per key over a sparse keyed
        histogram; ``value_expr`` decodes the covering bin."""
        wg = Window.partitionBy(*keys)
        cum = h.select(
            *keys, "bin", "cnt", "lo", "width",
            F.sum("cnt").over(wg.orderBy("bin")).alias("cum"),
            F.sum("cnt").over(wg).alias("total"))
        w = Window.partitionBy(*keys).orderBy("bin")
        return (cum.where((F.col("cum") >= 0.5 * F.col("total"))
                          & (F.col("cnt") > 0))
                .withColumn("rn", F.row_number().over(w)).where("rn = 1")
                .select(*keys, value_expr))

    vbin = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col("val") - F.col("lo"))
                                     / F.col("width")))).cast("bigint")
    h1 = (pairs.groupBy(*keys, vbin.alias("bin"))
          .agg(F.count("*").cast("bigint").alias("cnt"),
               F.first("lo").alias("lo"), F.first("width").alias("width")))
    interp = (F.col("bin")
              + (0.5 * F.col("total") - (F.col("cum") - F.col("cnt")))
              / F.col("cnt"))
    med = _median(h1, (F.col("lo") + interp * F.col("width"))
                  .alias("median_v"))
    dev = (pairs.join(bx(med), keys)
           .select(*keys, "width", "median_v",
                   F.abs(F.col("val") - F.col("median_v")).alias("adev")))
    abin = F.least(F.lit(nbins - 1),
                   F.floor(F.col("adev") / F.col("width"))).cast("bigint")
    h2 = (dev.groupBy(*keys, abin.alias("bin"))
          .agg(F.count("*").cast("bigint").alias("cnt"),
               F.first("median_v").alias("median_v"),
               F.lit(0.0).alias("lo"), F.first("width").alias("width")))
    mad = _median(h2, (interp * F.col("width")).alias("mad"))
    # fence from the SAME adev histogram: mass in bins whose lower
    # edge clears k*mad (undercount <= the covering bin's mass)
    fenced = (h2.join(bx(mad), keys)
              .groupBy(*keys)
              .agg(F.first("median_v").alias("median_v"),
                   F.first("mad").alias("mad"),
                   F.sum("cnt").alias("n"),
                   F.sum(F.when(F.col("bin") * F.col("width")
                                > F.lit(float(k)) * F.col("mad"),
                                F.col("cnt")).otherwise(0)).alias("n_out")))
    return fenced.select(
        *keys, "median_v", "mad",
        F.col("n_out").cast("bigint").alias("n_outliers"),
        F.floor(F.col("n_out").cast("double") * 1000000 / F.col("n"))
        .cast("bigint").alias("outlier_ppm"))


def mad_outlier_profile_sketch_sql(table: str,
                                   ranges: dict[str, tuple[float, float]],
                                   k: float = 3.0, nbins: int = 256,
                                   group_col: str | None = None) -> str:
    """DuckDB twin of :func:`mad_outlier_profile_sketch` (declared
    ranges only — derive them with one min/max query first)."""
    g = f", {group_col}" if group_col else ""
    gsel = f"{group_col}, " if group_col else ""
    keys = f"col_name{g}"
    arms = " UNION ALL ".join(
        f"SELECT {gsel}'{c}' AS col_name, CAST({c} AS DOUBLE) AS val "
        f"FROM {table} WHERE {c} IS NOT NULL"
        for c in sorted(ranges))
    scales = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({float(lo)} AS DOUBLE) AS lo, "
        f"CAST({(float(hi) - float(lo)) / float(nbins)} AS DOUBLE) AS width"
        for c, (lo, hi) in sorted(ranges.items()))
    vbin = (f"LEAST({nbins - 1}, GREATEST(0, "
            f"CAST(floor((val - lo) / width) AS BIGINT)))")
    abin = f"LEAST({nbins - 1}, CAST(floor(adev / width) AS BIGINT))"
    interp = "(bin + (0.5 * total - (cum - cnt)) / cnt)"
    return f"""
WITH pairs0 AS ({arms}),
scales AS ({scales}),
pairs AS (SELECT pairs0.*, lo, width FROM pairs0 JOIN scales USING (col_name)),
h1 AS (
  SELECT {keys}, {vbin} AS bin, CAST(COUNT(*) AS BIGINT) AS cnt,
         ANY_VALUE(lo) AS lo, ANY_VALUE(width) AS width
  FROM pairs GROUP BY ALL
),
cum1 AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY {keys} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {keys}) AS total
  FROM h1
),
med AS (
  SELECT {keys}, lo + {interp} * width AS median_v
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY bin) AS rn
        FROM cum1 WHERE cum >= 0.5 * total AND cnt > 0)
  WHERE rn = 1
),
dev AS (
  SELECT {keys}, width, median_v, abs(val - median_v) AS adev
  FROM pairs JOIN med USING ({keys})
),
h2 AS (
  SELECT {keys}, {abin} AS bin, CAST(COUNT(*) AS BIGINT) AS cnt,
         ANY_VALUE(median_v) AS median_v, ANY_VALUE(width) AS width
  FROM dev GROUP BY ALL
),
cum2 AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY {keys} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {keys}) AS total
  FROM h2
),
mad AS (
  SELECT {keys}, {interp} * width AS mad
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY bin) AS rn
        FROM cum2 WHERE cum >= 0.5 * total AND cnt > 0)
  WHERE rn = 1
)
SELECT {keys}, ANY_VALUE(h2.median_v) AS median_v, ANY_VALUE(mad.mad) AS mad,
       CAST(SUM(CASE WHEN h2.bin * h2.width > {float(k)} * mad.mad
                     THEN h2.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(floor(SUM(CASE WHEN h2.bin * h2.width > {float(k)} * mad.mad
                           THEN h2.cnt ELSE 0 END) * 1000000.0 / SUM(h2.cnt))
            AS BIGINT) AS outlier_ppm
FROM h2 JOIN mad USING ({keys})
GROUP BY {keys}
"""


def mad_outlier_profile_sql(table: str, cols: list[str],
                            k: float = 3.0,
                            group_col: str | None = None) -> str:
    """DuckDB twin of :func:`mad_outlier_profile` (grouped form with
    ``group_col``)."""
    g = f", {group_col}" if group_col else ""
    gsel = f"{group_col}, " if group_col else ""
    keys = f"col_name{g}"
    arms = " UNION ALL ".join(
        f"SELECT {gsel}'{c}' AS col_name, CAST({c} AS DOUBLE) AS val "
        f"FROM {table} WHERE {c} IS NOT NULL"
        for c in sorted(cols))
    return f"""
WITH pairs AS ({arms}),
med AS (
  SELECT {keys}, quantile_cont(val, 0.5) AS median_v
  FROM pairs GROUP BY {keys}
),
mad AS (
  SELECT {keys}, ANY_VALUE(m.median_v) AS median_v,
         quantile_cont(abs(p.val - m.median_v), 0.5) AS mad
  FROM pairs p JOIN med m USING ({keys}) GROUP BY {keys}
)
SELECT {keys}, ANY_VALUE(m.median_v) AS median_v,
       ANY_VALUE(m.mad) AS mad,
       CAST(SUM(CASE WHEN abs(p.val - m.median_v) > {float(k)} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(floor(SUM(CASE WHEN abs(p.val - m.median_v) > {float(k)} * m.mad
                           THEN 1 ELSE 0 END) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS outlier_ppm
FROM pairs p JOIN mad m USING ({keys})
GROUP BY {keys}
"""


def corr_screen(df, cols: list[str], scale: int = 100):
    """Pairwise Pearson correlation SCREEN over numeric columns:
    (col_x, col_y, n, r2_signed_ppm) — signed r² in ppm, the
    which-columns-move-together profile an assessment pack surfaces
    before anyone fits a model.

    Integer-exact discipline, no libm: values fix-point to
    ``scale``-cents BIGINTs; ONE pass aggregates n, Σx per column and
    Σx², Σxy in DECIMAL(38,0) (cent squares overflow BIGINT at
    realistic row counts); then per pair

        cov = n·Σxy − Σx·Σy,  vx = n·Σx² − (Σx)²,  vy likewise,
        r²  = cov² / (vx·vy)

    cov can reach ~10²⁷ here, so cov² would overflow even
    DECIMAL(38,0)/HUGEINT — both engines therefore downscale before
    squaring by a DERIVED power of ten, one per SIDE: r² is invariant
    under separately rescaling x and y, so vx shrinks by dx² = 10^2kx
    with kx = ⌈(digits(vx) − 16)/2⌉, vy by dy², |cov| by dx·dy.
    After the shrink vx', vy', cov' < 10¹⁶ PROVABLY (cov² ≤ vx·vy by
    Cauchy-Schwarz, division only truncates further), so the worst
    numerator 10⁶·cov'² < 10³⁸ fits DECIMAL(38,0)/HUGEINT at ANY
    input magnitude — a fixed downscale overflowed at its own
    docstring envelope (cov ~10²⁷ → 10⁴²: Spark silently NULLs,
    DuckDB raises).  Digit counts come from string length (exact and
    identical cross-engine; no libm log10), |cov| and its sign split
    out because integral division truncates toward zero in Spark but
    floors in DuckDB — identical only on non-negative operands.
    Per-side derivation keeps mixed-magnitude pairs precise: each
    moment keeps ≥ 14 significant digits against ITS OWN scale, so
    the ppm floor dominates the truncation everywhere.  Zero-variance
    pairs report NULL (0/0 is unreported, not fake-0).

    Shape: one partial-aggregated scan producing a 1-row moment
    relation; the per-pair arithmetic is |pairs| selects over that
    broadcast row — nothing quadratic in rows, nothing per-pair
    rescans the table."""
    from pyspark.sql import functions as F

    cents = {c: F.round(F.col(c) * scale).cast("bigint") for c in cols}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    # per-row cross products stay in BIGINT (fast codegen path) and
    # enter DECIMAL only at the accumulator: the envelope is
    # |x·scale| · |y·scale| < 2^63 per ROW (n-row sums then live in
    # DECIMAL(38,0)), i.e. cent magnitudes to ~3·10^9 — far beyond
    # any profiled money/quantity column; a DECIMAL-side per-row
    # multiply measured 1.9x slower on the q299 gate
    def _xprod(a, b):
        return (f"CAST(CAST(round({a} * {scale}) AS BIGINT)"
                f" * CAST(round({b} * {scale}) AS BIGINT)"
                f" AS DECIMAL(38,0))")

    for c in cols:
        aggs.append(F.sum(cents[c]).cast("bigint").alias(f"s_{c}"))
        aggs.append(F.sum(F.expr(_xprod(c, c)))
                    .cast("decimal(38,0)").alias(f"q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(F.expr(_xprod(a, b)))
                    .cast("decimal(38,0)").alias(f"p_{a}__{b}"))
    m = df.agg(*aggs).localCheckpoint()  # 1 row, read once per pair
    outs = []
    for a, b in pairs:
        cov = (f"(CAST(__n AS DECIMAL(38,0)) * p_{a}__{b}"
               f" - CAST(s_{a} AS DECIMAL(38,0)) * s_{b})")
        vx = (f"(CAST(__n AS DECIMAL(38,0)) * q_{a}"
              f" - CAST(s_{a} AS DECIMAL(38,0)) * s_{a})")
        vy = (f"(CAST(__n AS DECIMAL(38,0)) * q_{b}"
              f" - CAST(s_{b} AS DECIMAL(38,0)) * s_{b})")
        # derived per-side shrink: kx = ceil((digits(vx) - 16) / 2)
        # via (L - 15) DIV 2 (non-negative after greatest); 10^k built
        # from string repeat — integer-exact, no libm
        kx = f"greatest(0, (length(CAST({vx} AS STRING)) - 15) DIV 2)"
        ky = f"greatest(0, (length(CAST({vy} AS STRING)) - 15) DIV 2)"
        dx2 = (f"CAST(concat('1', repeat('0', CAST(2 * ({kx}) AS INT)))"
               f" AS DECIMAL(38,0))")
        dy2 = (f"CAST(concat('1', repeat('0', CAST(2 * ({ky}) AS INT)))"
               f" AS DECIMAL(38,0))")
        dxy = (f"CAST(concat('1', repeat('0',"
               f" CAST(({kx}) + ({ky}) AS INT))) AS DECIMAL(38,0))")
        # DIV returns BIGINT in both engines, so every square re-enters
        # DECIMAL(38,0)/HUGEINT via an explicit cast before multiplying
        expr = f"""
          CASE WHEN CAST({vx} DIV {dx2} AS DECIMAL(38,0))
                    * ({vy} DIV {dy2}) > 0 THEN
            (CASE WHEN {cov} < 0 THEN -1 ELSE 1 END)
            * ((CAST(1000000 AS DECIMAL(38,0))
                * (abs({cov}) DIV {dxy}) * (abs({cov}) DIV {dxy}))
               DIV (CAST({vx} DIV {dx2} AS DECIMAL(38,0))
                    * ({vy} DIV {dy2})))
          END"""
        outs.append(m.select(
            F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
            F.col("__n").alias("n"),
            F.expr(expr).cast("bigint").alias("r2_signed_ppm")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def corr_screen_sql(table: str, cols: list[str], scale: int = 100) -> str:
    """DuckDB twin of :func:`corr_screen` (same derived per-side
    downscale and sign split; HUGEINT plays DECIMAL(38,0), ``//``
    plays DIV — floor vs truncate agree on the non-negative
    operands both engines see)."""
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in cols:
        sums.append(f"CAST(SUM(CAST(round({c} * {scale}) AS BIGINT))"
                    f" AS BIGINT) AS s_{c}")
        sums.append(f"SUM(CAST(CAST(round({c} * {scale}) AS BIGINT)"
                    f" * CAST(round({c} * {scale}) AS BIGINT)"
                    f" AS HUGEINT)) AS q_{c}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        sums.append(f"SUM(CAST(CAST(round({a} * {scale}) AS BIGINT)"
                    f" * CAST(round({b} * {scale}) AS BIGINT)"
                    f" AS HUGEINT)) AS p_{a}__{b}")
    sels = []
    for a, b in pairs:
        cov = (f"(CAST(n AS HUGEINT) * p_{a}__{b}"
               f" - CAST(s_{a} AS HUGEINT) * s_{b})")
        vx = (f"(CAST(n AS HUGEINT) * q_{a}"
              f" - CAST(s_{a} AS HUGEINT) * s_{a})")
        vy = (f"(CAST(n AS HUGEINT) * q_{b}"
              f" - CAST(s_{b} AS HUGEINT) * s_{b})")
        kx = f"greatest(0, (length(CAST({vx} AS VARCHAR)) - 15) // 2)"
        ky = f"greatest(0, (length(CAST({vy} AS VARCHAR)) - 15) // 2)"
        dx2 = (f"CAST('1' || repeat('0', CAST(2 * ({kx}) AS INTEGER))"
               f" AS HUGEINT)")
        dy2 = (f"CAST('1' || repeat('0', CAST(2 * ({ky}) AS INTEGER))"
               f" AS HUGEINT)")
        dxy = (f"CAST('1' || repeat('0',"
               f" CAST(({kx}) + ({ky}) AS INTEGER)) AS HUGEINT)")
        sels.append(f"""
SELECT '{a}' AS col_x, '{b}' AS col_y, n,
       CAST(CASE WHEN CAST({vx} // {dx2} AS HUGEINT)
                      * ({vy} // {dy2}) > 0 THEN
         (CASE WHEN {cov} < 0 THEN -1 ELSE 1 END)
         * ((CAST(1000000 AS HUGEINT)
             * (abs({cov}) // {dxy}) * (abs({cov}) // {dxy}))
            // (CAST({vx} // {dx2} AS HUGEINT) * ({vy} // {dy2})))
       END AS BIGINT) AS r2_signed_ppm
FROM m""")
    return ("WITH m AS (SELECT " + ", ".join(sums) + f" FROM {table})"
            + "\nUNION ALL\n".join(sels))
