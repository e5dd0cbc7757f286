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

# (applicationId, semanticHash) -> partition count.
# df.rdd.getNumPartitions() runs the full physical planning each call;
# operators guard the SAME scan over and over (every query reads the
# same parquet dirs), so memoizing on the analyzed plan's semantic
# hash skips the replan.  The applicationId in the key stops a stale
# count outliving its SparkSession.  Staleness within one session is
# possible only when files are added/removed under an already-guarded
# path: growth makes the cached (low) count keep firing the
# repartition the guard would fire anyway, shrinkage makes a cached
# high count skip a repartition that fresh planning would also skip at
# the next session — a perf wobble, never a correctness issue (the
# guard only picks a partition count).
_NPART_CACHE: dict[tuple[str, int], int] = {}


def _num_partitions(df: DataFrame) -> int:
    try:
        key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    except Exception:       # connect / legacy fallback: just plan it
        return df.rdd.getNumPartitions()
    n = _NPART_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_NPART_CACHE) > 4096:
            _NPART_CACHE.clear()
        _NPART_CACHE[key] = n
    return n


def literal_df(spark, rows, schema):
    """Small literal relation (rule tables, spec catalogs, index
    frames) as an Arrow-backed DataFrame.

    ``spark.createDataFrame(list, schema)`` parallelizes PICKLED rows
    over ``defaultParallelism`` slices, and every downstream execution
    deserializes each slice through a Python worker — measured ~0.3 s
    of worker round-trips PER LITERAL FRAME at local[32] (a 3-frame
    union groupBy: 0.94 s), and the rounds serialize at low core
    counts.  Routing the same rows through pandas + Arrow yields a
    JVM-side Arrow relation with one partition per record batch
    (same union groupBy: 0.17 s) and no Python workers at execution.

    Values are staged in dtype=object columns so ints stay exact and
    None stays NULL; the declared ``schema`` drives the Arrow types.
    Any conversion failure falls back to the plain path — this helper
    may only change HOW a literal relation is shipped, never what it
    contains."""
    try:
        import pandas as pd
        from pyspark.sql import types as T

        st = (T._parse_datatype_string(schema)
              if isinstance(schema, str) else schema)
        data = [tuple(r) for r in rows]
        pdf = pd.DataFrame(data, columns=[f.name for f in st.fields],
                           dtype=object)
        out = spark.createDataFrame(pdf, st)
        # paranoia: the Arrow path must not change arity
        assert len(pdf) == len(data)
        return out
    except Exception:
        return spark.createDataFrame(rows, schema)


def estimate_bytes(df: DataFrame) -> int:
    """Cheap (no job) size estimate from Catalyst plan statistics
    (``sizeInBytes`` — for parquet scans this tracks the compressed,
    column-pruned file bytes).  Returns 0 when stats are unreachable
    (e.g. Spark Connect) or carry the unknown-size sentinel."""
    try:
        size = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        if size >= 1 << 60:     # spark.sql.defaultSizeInBytes sentinel
            return 0
        return size
    except Exception:
        return 0


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None,
                       keys: list[str] | None = None,
                       min_bytes: int | None = None) -> DataFrame:
    """Repartition iff the plan's current partitioning is below the
    session's parallelism — cheap insurance before expensive per-row
    expressions; no-op on already-parallel inputs.

    ``keys``: when the guarded stage feeds a join/aggregate on known
    keys, hash-partition on them instead of round-robin — the guard's
    exchange then *satisfies* the downstream distribution requirement,
    so the wide rows move once instead of (round-robin shuffle +
    key shuffle).

    ``min_bytes``: skip the guard when the Catalyst size estimate is
    BELOW this — for stages whose per-row cost is moderate, a small
    input finishes faster serially than it can pay for the extra
    exchange (round-10 measurement: the MAD profile's percentile pass
    over 150 k rows lost ~0.3 s to an unconditional repartition).  An
    unknown estimate (0) keeps the guard, preserving the prior
    behavior."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if min_bytes is not None and 0 < estimate_bytes(df) < min_bytes:
        return df
    if _num_partitions(df) < target:
        from pyspark.sql import functions as F

        if keys:
            return df.repartition(target, *[F.col(k) for k in keys])
        return df.repartition(target)
    return df
