"""Join operators beyond plain equi-joins: as-of joins and range joins.

The reference performs no SQL joins of its own (SURVEY §2.3) — these
are headroom operators a Spark-native engine should still provide,
built strictly from Catalyst primitives:

- :func:`asof_join` — "latest right row at or before each left row"
  per key.  Implemented as union + window carry-forward
  (``last_value IGNORE NULLS``): one sort-shuffle on (key, time),
  no range explosion, no Python.  This beats the naive
  range-join-then-rank formulation (which materializes O(n·m) pairs
  per key before pruning) and stays whole-stage-codegen.
- :func:`range_join` — inequality-band join via coarse bucketing +
  equi-join on bucket + exact filter, the standard trick to give
  Catalyst an equi-key so it doesn't fall back to a broadcast
  nested-loop over the raw inequality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' attaches
    the earliest right row at-or-after) matching on ``by``.

    Plan shape: union both sides tagged, single window sorted by
    (by, ts, side-order), carry right values with last_value IGNORE
    NULLS, keep left rows.  One shuffle, linear state.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    tagged_l = left.select(
        F.col(by).alias("__k"), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict((f.name, f.dataType) for f in right.schema.fields)[c]).alias(f"__r_{c}")
          for c in value_cols],
    )
    tagged_r = right.select(
        F.col(by).alias("__k"), F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict((f.name, f.dataType) for f in left.schema.fields)[c]).alias(c)
          for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    if direction == "backward":
        # right rows sort before left rows at equal ts => "at or before"
        w = (
            Window.partitionBy("__k")
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ]
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.desc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ]
    return (
        unioned.select("*", *carried)
        .filter(F.col("__is_left") == 1)
        .select(*lcols, *[F.col(f"asof_{c}") for c in value_cols])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Join left rows to right intervals containing them
    (right_lo <= left_val < right_hi) without a nested-loop: both sides
    bucketize at ``bucket_width``, right intervals explode across their
    touched buckets (bounded by interval/bucket ratio), equi-join on
    bucket, exact filter after.  Choose bucket_width near the median
    interval width so the explosion factor stays O(1)."""
    lb = left.withColumn("__b", (F.col(left_val) / bucket_width).cast("long"))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("long"),
                ((F.col(right_hi) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "__b")
        .filter((F.col(right_lo) <= F.col(left_val)) & (F.col(left_val) < F.col(right_hi)))
        .drop("__b")
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the same key exceeds the gap.  Window
    lag + running sum — the batch form of streaming session_window.
    ``tiebreak`` columns make ordering total under duplicate
    timestamps (determinism for differential testing).

    Requires a fixed-offset session timezone (``get_spark`` pins
    ``spark.sql.session.timeZone=UTC``): TIMESTAMP_NTZ inputs are
    routed to epoch seconds via cast-to-TIMESTAMP, which is only
    lossless when the session zone has no DST transitions — under a
    DST zone, gaps spanning a transition would be skewed by the
    per-timestamp offset."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if not (tz == "UTC" or tz.startswith(("+", "-", "GMT+", "GMT-", "UTC+", "UTC-"))):
        raise ValueError(
            f"sessionize requires a fixed-offset session timezone, got {tz!r}; "
            "set spark.sql.session.timeZone=UTC (get_spark does this)")
    order = [F.asc(ts_col)] + [F.asc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    # cast through TIMESTAMP: a no-op for tz-aware inputs, and the only
    # legal epoch route for TIMESTAMP_NTZ (session tz is pinned to UTC,
    # so NTZ values convert losslessly)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        events.withColumn("__new", new_session)
        .withColumn("session_id", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"))
        .drop("__new")
    )


def sessionize_sql(table: str, key: str, ts_col: str,
                   gap_minutes: int = 30,
                   tiebreak: list[str] | None = None) -> str:
    """DuckDB twin of :func:`sessionize`: same lag + running-sum
    windows, same truncated whole-second epochs on BOTH lag operands
    (Spark's cast-to-long truncates before differencing, so a
    fractional epoch() here would flip boundary-second gaps — the
    q268 floor lesson).  Preserves every input column and appends
    ``session_id``."""
    ob = ", ".join([f"CAST({ts_col} AS TIMESTAMP)"] + list(tiebreak or []))
    ep = f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)"
    return f"""
SELECT * EXCLUDE (__prev, __new),
       CAST(SUM(__new) OVER (PARTITION BY {key} ORDER BY {ob}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
FROM (
  SELECT * EXCLUDE (__prev),
         CASE WHEN __prev IS NULL OR {ep} - __prev > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS __new, __prev
  FROM (
    SELECT *, lag({ep}) OVER
              (PARTITION BY {key} ORDER BY {ob}) AS __prev
    FROM {table}
  )
)
"""
