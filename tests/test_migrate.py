"""Migrate operators: CSV sink option mapping, safe-mode upsert,
chunk-ledger resume (the reference's checkpoint re-entrancy,
example/stmt_migrate_task.toml:69 enable-checkpoint)."""

from pyspark.sql import functions as F

from dbms_spark.operators import migrate as M
from dbms_spark.plans import chunker
from dbms_spark.sources.catalog import load_table


def test_csv_roundtrip_with_options(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    opts = M.CsvSinkOptions(header=True, separator="|", null_value="\\N")
    out = str(tmp_path / "nation_csv")
    M.write_csv(src, out, opts, num_files=1)
    back = spark.read.options(header="true", sep="|", nullValue="\\N", inferSchema="true").csv(out)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    src_names = {r["n_name"] for r in src.collect()}
    back_names = {r["n_name"] for r in back.collect()}
    assert src_names == back_names


def test_upsert_replace_semantics(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    incoming = spark.createDataFrame([(2, "B"), (4, "D")], "id int, v string")
    out = {r["id"]: r["v"] for r in M.upsert(existing, incoming, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_ledger_resume(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    plan = chunker.plan_chunks(src, ["o_orderkey"], 4)
    preds = chunker.predicates(plan)
    ledger_path = str(tmp_path / "ledger")
    sink = str(tmp_path / "sink")

    ledger = M.ChunkLedger(spark, ledger_path, task="t1")
    n1 = M.migrate_chunked(spark, src, preds, sink, ledger)
    assert n1 == src.count()
    # all chunks done -> re-run migrates nothing
    ledger2 = M.ChunkLedger(spark, ledger_path, task="t1")
    assert ledger2.pending(list(range(len(preds)))) == []
    n2 = M.migrate_chunked(spark, src, preds, sink, ledger2)
    assert n2 == 0
    # migrated data is complete and correct
    back = spark.read.parquet(sink)
    assert back.count() == src.count()
    assert back.select(F.sum("o_orderkey")).collect()[0][0] == \
           src.select(F.sum("o_orderkey")).collect()[0][0]


def test_ledger_partial_resume(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    plan = chunker.plan_chunks(src, ["o_orderkey"], 4)
    preds = chunker.predicates(plan)
    ledger = M.ChunkLedger(spark, str(tmp_path / "ledger"), task="t2")
    # simulate a crash: chunks 0,1 done, chunk 2 stuck 'running'
    ledger.log(0, preds[0], "done", 1)
    ledger.log(1, preds[1], "done", 1)
    ledger.log(2, preds[2], "running")
    assert ledger.pending(list(range(4))) == [2, 3]
