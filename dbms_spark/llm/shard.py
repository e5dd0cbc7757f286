"""Training-data sharding + sequence packing.

The last mile of a 100 TB corpus pipeline: deterministically spread
documents across N output shards (so a training job's data loaders
read balanced, reproducible slices) and pack token counts into
fixed-capacity context-window bins per shard.

Scale shape: shard assignment is a map-side md5 bucket — no shuffle;
packing is a running-total window PARTITIONED BY SHARD (each shard
packs independently, exactly like per-worker packing in a real data
loader), so no global sort ever happens.  Both ops are dual-emitted
for the DuckDB differential gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_assign(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard id in [0, n_shards): md5 bucket of the doc
    id — stable across runs/engines, uniform, and independent of input
    order (an engine-native ``hash()`` or round-robin would be
    neither)."""
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_shards
    )
    return df.withColumn("shard_id", shard)


def shard_assign_sql(id_col: str = "doc_id", n_shards: int = 8) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_shards} AS BIGINT)"
    )


def shard_stats(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                tokens_col: str = "n_tokens") -> DataFrame:
    """Per-shard document and token totals — the balance report a
    sharded export is validated with."""
    return (
        shard_assign(df, n_shards, id_col)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(tokens_col).cast("bigint").alias("total_tokens"),
        )
    )


def pack_sequences(df: DataFrame, capacity: int, n_shards: int,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens") -> DataFrame:
    """Greedy token-budget packing into fixed-capacity bins, per shard:
    documents stream in deterministic ``id_col`` order and fill
    running-total bins of ``capacity`` tokens (documents may straddle
    a bin boundary — the standard concat-then-chunk packing used for
    LLM pretraining batches).

    Emits (shard_id, doc, n_tokens, bin_id, bin_offset): ``bin_id`` =
    which context window this document STARTS in, ``bin_offset`` = its
    token offset inside that window.  The window runs per shard —
    bounded state, no global sort."""
    w = (
        Window.partitionBy("shard_id").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(tokens_col).over(w).cast("bigint")
    start = cum - F.col(tokens_col)
    return (
        shard_assign(df, n_shards, id_col)
        .select(
            "shard_id", F.col(id_col),
            F.col(tokens_col).cast("bigint").alias(tokens_col),
            F.floor(start / capacity).cast("bigint").alias("bin_id"),
            (start % capacity).cast("bigint").alias("bin_offset"),
        )
    )


def pack_sequences_sql(inner_sql: str, capacity: int, n_shards: int,
                       id_col: str = "doc_id", tokens_col: str = "n_tokens") -> str:
    """DuckDB twin of :func:`pack_sequences` (``inner_sql`` must emit
    ``id_col`` and ``tokens_col``)."""
    shard = shard_assign_sql(id_col, n_shards)
    return f"""
WITH src AS ({inner_sql}),
sh AS (SELECT *, {shard} AS shard_id FROM src),
c AS (SELECT shard_id, {id_col}, CAST({tokens_col} AS BIGINT) AS {tokens_col},
             CAST(SUM({tokens_col}) OVER (PARTITION BY shard_id ORDER BY {id_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - CAST({tokens_col} AS BIGINT) AS start
      FROM sh)
SELECT shard_id, {id_col}, {tokens_col},
       CAST(floor(CAST(start AS DOUBLE) / {capacity}) AS BIGINT) AS bin_id,
       CAST(start % {capacity} AS BIGINT) AS bin_offset
FROM c
"""
