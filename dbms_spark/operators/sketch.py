"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
(skew) detection.

A 100 TB groupBy on a skewed key needs the heavy keys known BEFORE the
shuffle to salt them (:mod:`dbms_spark.plans.skew`).  An exact
frequency table is itself a full shuffle of the key column; a count-min
sketch is one partial aggregation into O(d*w) cells — constant state
per executor, mergeable, and always an over-estimate (min over d
independent row hashes), so no heavy key is ever missed (one-sided
error: cms_est >= exact count, with overestimate probability bounded by
the classic (epsilon, delta) argument, epsilon = e/w, delta = e^-d).

All cell hashing is md5-based integer math, so the sketch has a
bit-identical DuckDB twin for the differential gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell_expr(key: Column, j: int, width: int) -> Column:
    """Row-``j`` cell index of a key: md5-derived 32-bit hash mod width."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), key.cast("string"))), 1, 8), 16, 10)
    return (h.cast("bigint") % width).alias(f"c{j}")


def _cell_sql(key: str, j: int, width: int) -> str:
    return (f"(('0x' || substr(md5('{j}' || ':' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
            f" % {width})")


def cms_cells(df: DataFrame, key_col: str, depth: int = 3, width: int = 512) -> DataFrame:
    """The sketch itself: (j, cell, cnt) for j in [0, depth).  One
    explode (depth× row growth on a narrow projection) and one groupBy
    whose result is at most depth*width rows — the shuffle moves cell
    counts, never keys."""
    key = F.col(key_col)
    cells = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), _cell_expr(key, j, width).alias("cell"))
            for j in range(depth)
        ])).alias("jc")
    )
    return (
        cells.select(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_cells_sql(table_sql: str, key_col: str, depth: int = 3, width: int = 512) -> str:
    arms = "\nUNION ALL ".join(
        f"SELECT {j} AS j, {_cell_sql(key_col, j, width)} AS cell FROM src"
        for j in range(depth)
    )
    return f"WITH src AS ({table_sql}), jc AS ({arms})\n" \
           f"SELECT j, cell, COUNT(*) AS cnt FROM jc GROUP BY j, cell"


def heavy_hitters_with_cms(df: DataFrame, key_col: str, n: int = 5,
                           depth: int = 3, width: int = 512) -> DataFrame:
    """Exact top-``n`` keys by frequency, each with its count-min
    estimate alongside the exact count (``cms_est >= exact_cnt`` always
    — the one-sided guarantee the salting planner relies on).

    The exact side here is the verification harness; at scale the
    sketch alone (broadcast, O(d*w)) screens candidate keys so only
    suspected-heavy keys pay an exact count."""
    from pyspark.sql import Window

    key = F.col(key_col)
    sketch = cms_cells(df, key_col, depth, width)
    w_top = Window.orderBy(F.desc("exact_cnt"), F.asc(key_col))
    top = (
        df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_cnt"))
        .withColumn("rnk", F.row_number().over(w_top))
        .filter(F.col("rnk") <= n)
        .drop("rnk")
    )
    probes = top.select(
        key_col, "exact_cnt",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), _cell_expr(key, j, width).alias("cell"))
            for j in range(depth)
        ])).alias("jc"),
    ).select(key_col, "exact_cnt", F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy(key_col)
        .agg(
            F.max("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.min("cnt").cast("bigint").alias("cms_est"),
        )
    )


def heavy_hitters_with_cms_sql(table_sql: str, key_col: str, n: int = 5,
                               depth: int = 3, width: int = 512) -> str:
    cells = cms_cells_sql(table_sql, key_col, depth, width)
    probe_arms = "\nUNION ALL ".join(
        f"SELECT {key_col}, exact_cnt, {j} AS j, {_cell_sql(key_col, j, width)} AS cell FROM top"
        for j in range(depth)
    )
    return f"""
WITH cells AS ({cells}),
src AS ({table_sql}),
top AS (
  SELECT {key_col}, exact_cnt FROM (
    SELECT {key_col}, COUNT(*) AS exact_cnt,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, {key_col}) AS rnk
    FROM src GROUP BY {key_col}
  ) WHERE rnk <= {n}
),
probes AS ({probe_arms})
SELECT {key_col}, CAST(MAX(exact_cnt) AS BIGINT) AS exact_cnt,
       CAST(MIN(cnt) AS BIGINT) AS cms_est
FROM probes JOIN cells USING (j, cell)
GROUP BY {key_col}
"""
