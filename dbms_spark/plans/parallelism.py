"""Scan-parallelism guard for compute-heavy map stages.

A parquet file is splittable only at row-group boundaries; a file
written as one row group scans as ONE task no matter how many cores
exist.  For operators whose per-row cost dominates (canonical-row MD5,
minhash signatures, simhash votes, Pandas decode), a serial scan
starves the cluster: the fix is one explicit round-robin shuffle
before the heavy projection.

On well-laid-out data (row groups ≈ 128 MB, many files) the input
partition count already exceeds the target and this is a no-op — the
guard only fires on pathological layouts, which is exactly when the
reference's chunk planner would have re-chunked a table too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None,
                       keys: list[str] | None = None) -> DataFrame:
    """Repartition iff the plan's current partitioning is below the
    session's parallelism — cheap insurance before expensive per-row
    expressions; no-op on already-parallel inputs.

    ``keys``: when the guarded stage feeds a join/aggregate on known
    keys, hash-partition on them instead of round-robin — the guard's
    exchange then *satisfies* the downstream distribution requirement,
    so the wide rows move once instead of (round-robin shuffle +
    key shuffle)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        from pyspark.sql import functions as F

        if keys:
            return df.repartition(target, *[F.col(k) for k in keys])
        return df.repartition(target)
    return df
