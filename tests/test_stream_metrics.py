"""Streaming progress listener (streaming/metrics.py): every
micro-batch lands one JSON line; the summary rollup accounts for all
input rows."""

import json
import time

from dbms_spark.streaming import metrics as M


def test_progress_listener_captures_batches(spark, tmp_path):
    src = tmp_path / "in"; src.mkdir()
    log = str(tmp_path / "progress.jsonl")
    out = str(tmp_path / "out")

    with open(src / "b1.json", "w") as f:
        for i in range(25):
            f.write(json.dumps({"id": i}) + "\n")

    listener = M.attach_progress_log(spark, log)
    try:
        q = (spark.readStream.schema("id long").json(str(src))
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        # listener events are delivered asynchronously after termination
        for _ in range(40):
            try:
                with open(log) as f:
                    if any("numInputRows" in line for line in f):
                        break
            except FileNotFoundError:
                pass
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    summary = M.summarize_progress_log(spark, log).collect()
    assert len(summary) == 1
    assert summary[0]["input_rows"] == 25
    assert summary[0]["n_batches"] >= 1
