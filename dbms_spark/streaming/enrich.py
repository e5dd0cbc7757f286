"""Streaming joins: dimension enrichment and stream-stream interval
attribution.

Two shapes the CDC/ingest pipelines need beyond per-key state:

- :func:`enrich_stream` — stream ⨝ static dimension.  Spark re-resolves
  the static side per micro-batch, so a dimension refreshed in place
  (overwritten parquet dir) is picked up without restarting the query;
  the broadcast hint keeps it a map-side hash join in every batch
  (reference analog: CDC apply enriching rows against target-side
  metadata before writing).
- :func:`stream_interval_join` — stream ⨝ stream within an event-time
  window (the impression→click attribution shape).  Both sides carry
  watermarks, so Spark bounds the join state buffer: a side's state for
  event time t is dropped once its watermark passes t + interval —
  without the watermark the state grows forever, which is the #1
  stream-join operational failure at scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, keys: list[str],
                  how: str = "left") -> DataFrame:
    """Per-micro-batch dimension join; dim is broadcast (must be the
    small side — at scale, a dimension that outgrows broadcast belongs
    in a stream-stream join or a state store instead)."""
    return stream.join(F.broadcast(dim), keys, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    upper_seconds: int,
    watermark: str = "10 minutes",
    prefix: str = "r_",
) -> DataFrame:
    """Inner join of two streams on ``keys`` where the right event lands
    in ``[left_ts, left_ts + upper_seconds]``.  Right columns come back
    ``prefix``-renamed (stream-stream joins forbid ambiguous names).
    The watermark bounds both the lateness tolerated and the state
    retention window."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rr = rw.select([F.col(c).alias(prefix + c) for c in rw.columns])
    cond = reduce(
        lambda a, b: a & b,
        [lw[k] == rr[prefix + k] for k in keys],
    )
    cond = cond & (rr[prefix + right_ts] >= lw[left_ts]) & (
        rr[prefix + right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper_seconds} SECONDS")
    )
    joined = lw.join(rr, cond, "inner")
    return joined.drop(*[prefix + k for k in keys])


def dedup_within_watermark(stream: DataFrame, keys: list[str], ts_col: str,
                           watermark: str = "10 minutes") -> DataFrame:
    """At-least-once -> effectively-once: drop re-deliveries of the
    same key seen within the watermark window
    (``dropDuplicatesWithinWatermark``).  Unlike plain
    ``dropDuplicates`` on a stream, state for a key is RELEASED once
    the watermark passes it — bounded memory at any runtime, the only
    viable stream dedup at scale (reference analog: the CDC consumer's
    obsolete/duplicate event skip, message/tidb/consumer.go)."""
    return stream.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)


def sessionized_counts(stream: DataFrame, key: str, ts_col: str,
                       gap: str = "30 minutes",
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization via native ``session_window``: dynamic
    event-time windows that extend while events keep arriving within
    ``gap`` and close (emit + state release) once the watermark passes
    the last event + gap.  The streaming twin of the batch
    ``operators/joins.sessionize`` lag/sum form — state per OPEN
    session only, so memory tracks concurrency, not history."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
