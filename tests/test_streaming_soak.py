"""Streaming soak: the CDC consume loop and the maintained aggregate
are killed and resumed repeatedly mid-stream, and the final stores
must equal the ground truth a from-scratch recompute gives — C5
exactly-once across restarts (reference:
model/consume/cdc_consume_entity.go:20 checkpoint resume semantics).

Three distinct interruption modes, >=3 interruptions total:

1. crash INSIDE foreachBatch AFTER the stores applied but BEFORE the
   checkpoint commit — the redelivery window: Structured Streaming
   re-delivers the same epoch, the table store must re-apply
   idempotently (key replacement) and the agg store must no-op (its
   pointer-file marker commits state+batch-id atomically);
2. a second such crash in a later run;
3. a hard ``q.stop()`` while the query is mid-drain.
"""

import json
import random
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from dbms_spark.streaming import cdc
from dbms_spark.streaming import incremental_agg as IA

SCHEMA = {"acct": "id bigint, region string, amount bigint"}
KEYS = {"acct": ["id"]}
TYPES = {"region": "string", "amount": "bigint"}


def _gen_batches(n_batches=11, ops_per_batch=6, n_keys=25, seed=7):
    """Random I/U/D event batches + the surviving-row ground truth."""
    rnd = random.Random(seed)
    live: dict[int, dict] = {}
    ts = 0
    batches = []
    for _ in range(n_batches):
        evs = []
        for _ in range(ops_per_batch):
            ts += 1
            k = rnd.randrange(n_keys)
            old = live.get(k)
            if old is not None and rnd.random() < 0.3:
                del live[k]
                evs.append(("DELETE", ts, k, None, old))
            else:
                new = {"id": k, "region": rnd.choice("abc"),
                       "amount": rnd.randrange(100)}
                live[k] = new
                evs.append(("UPDATE" if old is not None else "INSERT",
                            ts, k, new, old))
        batches.append(evs)
    return batches, live


def _write_batch(src_dir, name, evs, seq):
    """One batch file with a PINNED, strictly-increasing mtime: the
    file source orders micro-batches by modification time, and files
    written in a tight loop can collide at fs-timestamp granularity —
    which would deliver batches out of commit order.  A real transport
    (Kafka partitions) guarantees per-key order; the file twin must
    uphold the same contract (cdc.py's documented flush contract)."""
    import os
    p = src_dir / name
    with open(p, "w") as f:
        for qt, ts, k, new, old in evs:
            f.write(json.dumps({
                "schema_name": "db", "table_name": "acct", "query_type": qt,
                "commit_ts": ts, "key_json": json.dumps({"id": k}),
                "new_json": json.dumps(new) if new else None,
                "old_json": json.dumps(old) if old else None,
                "is_ddl": False, "ddl_query": None}) + "\n")
    t = 1_700_000_000 + seq * 10
    os.utime(p, (t, t))


def test_cdc_stream_to_live_jdbc_target_with_restart(spark, tmp_path):
    """The reference's actual consumer loop executed end-to-end: a CDC
    stream applied to a LIVE JDBC database (embedded Derby) through
    set-based MERGE delete+upsert, stopped and resumed mid-history,
    final table state equal to the surviving-row ground truth."""
    src = tmp_path / "jin"; src.mkdir()
    ckpt = str(tmp_path / "jck")
    url = f"jdbc:derby:{tmp_path / 'jdb'};create=true"
    from dbms_spark.sources import jdbc_exec as X
    X.execute(spark, url, [
        "CREATE TABLE APP.ACCT ("
        "ID BIGINT NOT NULL PRIMARY KEY, REGION VARCHAR(8), AMOUNT BIGINT)",
    ])
    row_types = {"ID": "bigint", "REGION": "string", "AMOUNT": "bigint"}

    batches, live = _gen_batches(n_batches=8)
    # CDC images carry lowercase field names; target columns uppercase —
    # rewrite images to the target's column case (the reference's column
    # routing concern, P2)
    def upper_evs(evs):
        out = []
        for qt, ts, k, new, old in evs:
            up = lambda d: {"ID": d["id"], "REGION": d["region"],
                            "AMOUNT": d["amount"]} if d else None
            out.append((qt, ts, k, up(new), up(old)))
        return out

    def _write(i):
        evs = upper_evs(batches[i])
        p = src / f"b{i:02d}.json"
        import os as _os
        with open(p, "w") as f:
            for qt, ts, k, new, old in evs:
                f.write(json.dumps({
                    "schema_name": "db", "table_name": "ACCT",
                    "query_type": qt, "commit_ts": ts,
                    "key_json": json.dumps({"ID": k}),
                    "new_json": json.dumps(new) if new else None,
                    "old_json": json.dumps(old) if old else None,
                    "is_ddl": False, "ddl_query": None}) + "\n")
        t = 1_700_000_000 + i * 10
        _os.utime(p, (t, t))

    vtypes = {"createTableColumnTypes": "REGION VARCHAR(8)"}

    def run():
        stream = (spark.readStream.schema(cdc.CDC_EVENT_SCHEMA)
                  .option("maxFilesPerTrigger", 2).json(str(src)))
        q = cdc.consume_cdc_stream_jdbc(
            stream, url, "APP.ACCT", ["ID"], row_types, ckpt,
            properties=vtypes)
        q.awaitTermination(240)

    for i in range(4):
        _write(i)
    run()                              # first half applied
    for i in range(4, 8):
        _write(i)
    run()                              # resume from checkpoint, drain rest

    got = {r[0]: (r[1], r[2]) for r in X.query(
        spark, url, "SELECT ID, REGION, AMOUNT FROM APP.ACCT")}
    want = {k: (v["region"], v["amount"]) for k, v in live.items()}
    assert got == want


def test_soak_crash_and_resume_three_times(spark, tmp_path):
    src = tmp_path / "in"; src.mkdir()
    ckpt = str(tmp_path / "ck")
    store = cdc.ParquetTableStore(spark, str(tmp_path / "store"),
                                  schemas=SCHEMA, key_cols=KEYS)
    agg = IA.AggStore(spark, str(tmp_path / "agg"), ["region"], ["amount"], TYPES)

    batches, live = _gen_batches()
    for i, evs in enumerate(batches[:8]):
        _write_batch(src, f"b{i:02d}.json", evs, seq=i)

    calls = {"n": 0}
    crash_at = {2, 5}   # global apply-call indices that die post-apply

    def apply_all(batch, epoch_id):
        cdc.apply_cdc_batch(store, batch)
        agg.apply_batch(batch, batch_id=epoch_id)
        calls["n"] += 1
        if calls["n"] in crash_at:
            raise RuntimeError("injected crash AFTER apply, BEFORE commit")

    def run(stop_after: float | None = None):
        stream = (spark.readStream.schema(cdc.CDC_EVENT_SCHEMA)
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (stream.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(apply_all)
             .trigger(availableNow=True).start())
        if stop_after is not None:
            time.sleep(stop_after)
            q.stop()           # interruption 3: hard stop mid-drain
            q.awaitTermination(120)
            return "stopped"
        try:
            q.awaitTermination(240)
            return "done"
        except StreamingQueryException:
            return "crashed"

    assert run() == "crashed"          # interruption 1 (call #2 dies)
    assert run() == "crashed"          # interruption 2 (call #5 dies)
    assert run() == "done"             # drains the first 8 files

    # more traffic arrives, then a hard stop mid-drain, then final drain
    for i, evs in enumerate(batches[8:], start=8):
        _write_batch(src, f"b{i:02d}.json", evs, seq=i)
    run(stop_after=2.0)                # interruption 3
    assert run() == "done"

    # -- exactly-once: stores equal the ground truth ----------------
    got = {r["id"]: (r["region"], r["amount"])
           for r in store.read("acct").collect()}
    want = {k: (v["region"], v["amount"]) for k, v in live.items()}
    assert got == want

    # maintained rollup equals a from-scratch recompute of the table
    direct = {
        r["region"]: (r["n"], r["s"])
        for r in store.read("acct").groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s")).collect()
    }
    rolled = {r["region"]: (r["n_rows"], r["sum_amount"])
              for r in agg.read().collect()}
    assert rolled == direct
    # and the injected crashes really exercised redelivery: more apply
    # calls than distinct epochs committed
    assert calls["n"] > agg.last_batch_id() + 1
