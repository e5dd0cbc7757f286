"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-table in-memory event state between Kafka
polls (reference: message/tidb/event.go:710-734 EventGroup buffers;
per-key apply state consumer.go:670-807).  Structured Streaming's
GroupState is the durable version of that pattern: state survives
micro-batches through the checkpoint, and a crash resumes with state
intact — the property the reference approximates with its checkpoint
tables.

``running_key_stats`` is the canonical shape: cumulative per-key
counters updated per micro-batch.  Swap the update function body for
dedup sets, session accumulation, or CDC conflation as needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key bigint, total_events bigint, total_value double, last_commit_ts bigint"
STATE_SCHEMA = "total_events bigint, total_value double, last_commit_ts bigint"


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState):
    total, value, last_ts = (state.get if state.exists else (0, 0.0, -1))
    for pdf in batches:
        total += len(pdf)
        value += float(pdf["value"].sum())
        if len(pdf):
            last_ts = max(last_ts, int(pdf["commit_ts"].max()))
    state.update((total, value, last_ts))
    yield pd.DataFrame(
        [{"key": key[0], "total_events": total, "total_value": value,
          "last_commit_ts": last_ts}]
    )


def running_key_stats(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Cumulative per-key statistics over an event stream: total event
    count, summed value, last commit_ts — state carried across
    micro-batches via the checkpoint.  Input needs columns
    (key_col, value, commit_ts)."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_sink(stateful: DataFrame, checkpoint_dir: str, out_dir: str):
    """Drive a stateful stream into an append-only parquet log of state
    updates via foreachBatch (memory sink cannot recover from a
    checkpoint; foreachBatch can).  Latest row per key = current state."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            batch.write.mode("append").parquet(out_dir)

    return (
        stateful.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_state(spark, out_dir: str) -> DataFrame:
    """Current state per key from the update log (max total_events per
    key is the newest update — counters are monotone)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("key").orderBy(F.desc("total_events"))
    return df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas form: the arbitrary-state API that
# succeeds applyInPandasWithState — typed state handles (value/list/map)
# with optional TTL, timers, and checkpoint-recovered state.  Same
# semantics as running_key_stats, expressed on the new API so both
# stateful surfaces of the engine are covered.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


class _RunningStatsProcessor(StatefulProcessor):
    """StatefulProcessor maintaining (total_events, total_value,
    last_commit_ts) per key in a ValueState."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        total, value, last_ts = (
            tuple(self._state.get()) if self._state.exists() else (0, 0.0, -1)
        )
        for pdf in rows:
            total += len(pdf)
            value += float(pdf["value"].sum())
            if len(pdf):
                last_ts = max(last_ts, int(pdf["commit_ts"].max()))
        self._state.update((total, value, last_ts))
        yield pd.DataFrame(
            [{"key": key[0], "total_events": total, "total_value": value,
              "last_commit_ts": last_ts}]
        )

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        pass

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter([])

    def close(self) -> None:
        pass


def running_key_stats_tws(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """:func:`running_key_stats` on transformWithStateInPandas — the
    Spark 4 arbitrary-state API (typed ValueState handle; state is
    checkpoint-durable exactly like the GroupState form)."""
    return (
        events.groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
