"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-to-fact join is the
shuffle.  Writing both sides bucketed by the join key
(``bucketBy(n, key).sortBy(key)``) pins co-partitioning in the table
layout, so later joins read bucket-aligned splits and skip the
Exchange entirely — the Spark-native equivalent of the reference
pre-chunking both sides of a compare on the same key ranges.

Requires a session catalog with a warehouse dir (any SparkSession has
one; ``saveAsTable`` is the only write path that records bucket spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange on either side (verify with
    ``plan_has_exchange``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle (hash/range
    repartition) Exchange.  BroadcastExchange doesn't count — a
    broadcast is the cheap path bucketing exists to approximate; when
    both sides are broadcast-sized Catalyst rightly prefers it and
    marks bucketed reads 'disabled by query planner'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
