"""Streaming observability: capture per-micro-batch progress
(rows/sec, batch duration, state size) to a JSONL log via
StreamingQueryListener — the metrics feed the reference surfaces as
task progress rows, for streams.

The listener writes driver-side (progress events are tiny control
records, not data).  One file per listener; each line is the raw
progress JSON Spark already assembles, so downstream tooling —
including this engine's own JSONL source — can aggregate lag and
throughput without touching the query."""

from __future__ import annotations

import os

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Append every query-progress event to ``path`` as JSON lines."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        with open(self.path, "a") as f:
            f.write(event.progress.json + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_progress_log(spark, path: str) -> ProgressLogListener:
    """Register a progress logger on the session; returns the listener
    (pass to ``spark.streams.removeListener`` when done)."""
    listener = ProgressLogListener(path)
    spark.streams.addListener(listener)
    return listener


def summarize_progress_log(spark, path: str):
    """Aggregate a progress log: per query id, batches, total input
    rows, and mean processing rate — the status rollup a task monitor
    polls."""
    from pyspark.sql import functions as F

    raw = spark.read.json(path)
    return (
        raw.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("numInputRows").cast("bigint").alias("input_rows"),
            F.avg("processedRowsPerSecond").alias("mean_rows_per_sec"),
        )
    )
