"""Progress counters (A8).

The reference keeps atomic read/write/delay counters per task
(reference: database/processor/processor_migrate_stats.go,
utils/progress/).  In Spark the execution engine already tracks this;
the engine-level surface is a thin wrapper over the status tracker for
batch jobs and `StreamingQuery.lastProgress` for streams — counters
come from the engine, not hand-maintained atomics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class JobProgress:
    active_jobs: int
    active_stages: int
    num_tasks: int
    num_active_tasks: int
    num_completed_tasks: int


def batch_progress(spark: SparkSession) -> JobProgress:
    """Snapshot of running work from the status tracker."""
    tracker = spark.sparkContext.statusTracker()
    job_ids = tracker.getActiveJobsIds()
    stage_ids = tracker.getActiveStageIds()
    total = active = completed = 0
    for sid in stage_ids:
        info = tracker.getStageInfo(sid)
        if info:
            total += info.numTasks
            active += info.numActiveTasks
            completed += info.numCompletedTasks
    return JobProgress(len(job_ids), len(stage_ids), total, active, completed)


def stream_progress(query) -> dict:
    """Normalized snapshot of a StreamingQuery's last progress: rows/s
    and batch duration — the counters the reference exposed per CDC
    consumer."""
    p = query.lastProgress
    if not p:
        return {"input_rows_per_second": 0.0, "processed_rows_per_second": 0.0,
                "batch_duration_ms": 0, "num_input_rows": 0}
    return {
        "input_rows_per_second": p.get("inputRowsPerSecond", 0.0) or 0.0,
        "processed_rows_per_second": p.get("processedRowsPerSecond", 0.0) or 0.0,
        "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution", 0),
        "num_input_rows": p.get("numInputRows", 0),
    }
