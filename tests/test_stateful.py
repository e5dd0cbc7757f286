"""applyInPandasWithState: cumulative per-key state across micro-batches
AND across restarts (checkpoint-recovered state)."""

import json

from dbms_spark.streaming import stateful as ST


def _write(src_dir, name, rows):
    with open(src_dir / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EVENT_SCHEMA = "user_id bigint, value double, commit_ts bigint"


def test_running_key_stats_accumulates_across_restarts(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "state_log")

    _write(src, "b1.json", [
        {"user_id": 1, "value": 10.0, "commit_ts": 100},
        {"user_id": 1, "value": 5.0, "commit_ts": 101},
        {"user_id": 2, "value": 7.0, "commit_ts": 90},
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = ST.run_to_sink(ST.running_key_stats(stream), ckpt, out)
    q.awaitTermination(120)
    got = {r["key"]: r for r in ST.latest_state(spark, out).collect()}
    assert got[1]["total_events"] == 2 and got[1]["total_value"] == 15.0
    assert got[1]["last_commit_ts"] == 101
    assert got[2]["total_events"] == 1

    # restart with a new batch: state must resume from the checkpoint
    _write(src, "b2.json", [
        {"user_id": 1, "value": 1.0, "commit_ts": 200},
        {"user_id": 3, "value": 2.0, "commit_ts": 201},
    ])
    stream2 = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q2 = ST.run_to_sink(ST.running_key_stats(stream2), ckpt, out)
    q2.awaitTermination(120)
    got2 = {r["key"]: r for r in ST.latest_state(spark, out).collect()}
    # user 1 accumulated ACROSS restarts (old state + new batch)
    assert got2[1]["total_events"] == 3 and got2[1]["total_value"] == 16.0
    assert got2[1]["last_commit_ts"] == 200
    assert got2[3]["total_events"] == 1
    assert got2[2]["total_events"] == 1  # untouched key keeps old state


def _protobuf_ok() -> bool:
    # transformWithStateInPandas runs a protobuf-based state server;
    # this container ships a broken google.protobuf (no descriptor)
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(not _protobuf_ok(), reason="google.protobuf unavailable: "
                    "transformWithStateInPandas state server cannot start")
def test_running_key_stats_tws_matches_groupstate_form(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API) computes the
    same cumulative per-key stats and resumes from its checkpoint."""
    src = tmp_path / "ev2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "state_log2")

    _write(src, "b1.json", [
        {"user_id": 1, "value": 10.0, "commit_ts": 100},
        {"user_id": 1, "value": 5.0, "commit_ts": 101},
        {"user_id": 2, "value": 7.0, "commit_ts": 90},
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = ST.run_to_sink(ST.running_key_stats_tws(stream), ckpt, out)
    q.awaitTermination(120)
    got = {r["key"]: r for r in ST.latest_state(spark, out).collect()}
    assert got[1]["total_events"] == 2 and got[1]["total_value"] == 15.0
    assert got[2]["total_events"] == 1

    _write(src, "b2.json", [{"user_id": 1, "value": 1.0, "commit_ts": 200}])
    stream2 = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q2 = ST.run_to_sink(ST.running_key_stats_tws(stream2), ckpt, out)
    q2.awaitTermination(120)
    got2 = {r["key"]: r for r in ST.latest_state(spark, out).collect()}
    assert got2[1]["total_events"] == 3 and got2[1]["total_value"] == 16.0
    assert got2[1]["last_commit_ts"] == 200
