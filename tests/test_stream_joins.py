"""Streaming joins (streaming/enrich.py): dimension enrichment picks up
in-place dim refreshes across micro-batches; stream-stream interval
join attributes within the window and drops out-of-window matches."""

import json

from dbms_spark.streaming import enrich as EN


def _write(src_dir, name, rows):
    with open(src_dir / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(df, ckpt, out):
    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("append").parquet(out)

    return (
        df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_enrich_stream_sees_dim_refresh(spark, tmp_path):
    src = tmp_path / "ev"; src.mkdir()
    dimdir = str(tmp_path / "dim"); ckpt = str(tmp_path / "c"); out = str(tmp_path / "o")

    spark.createDataFrame([(1, "gold"), (2, "basic")], "user_id long, tier string") \
        .write.mode("overwrite").parquet(dimdir)
    dim = spark.read.parquet(dimdir)

    _write(src, "b1.json", [{"user_id": 1, "v": 10}, {"user_id": 2, "v": 20}])
    stream = spark.readStream.schema("user_id long, v long").json(str(src))
    q = _run(EN.enrich_stream(stream, dim, ["user_id"]), ckpt, out)
    q.awaitTermination(120)
    got = {(r["user_id"], r["tier"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "gold"), (2, "basic")}

    # refresh the dimension IN PLACE, then stream a new batch: the
    # static side re-resolves per micro-batch
    spark.createDataFrame([(1, "platinum"), (2, "basic")], "user_id long, tier string") \
        .write.mode("overwrite").parquet(dimdir)
    _write(src, "b2.json", [{"user_id": 1, "v": 11}])
    stream2 = spark.readStream.schema("user_id long, v long").json(str(src))
    q2 = _run(EN.enrich_stream(stream2, spark.read.parquet(dimdir), ["user_id"]), ckpt, out)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).filter("v = 11").collect()
    assert [(r["user_id"], r["tier"]) for r in rows] == [(1, "platinum")]


def test_stream_interval_join_attribution(spark, tmp_path):
    imp = tmp_path / "imp"; imp.mkdir()
    clk = tmp_path / "clk"; clk.mkdir()
    ckpt = str(tmp_path / "c"); out = str(tmp_path / "o")

    _write(imp, "b1.json", [
        {"user_id": 1, "imp_id": 100, "ts": "2024-01-01 10:00:00"},
        {"user_id": 2, "imp_id": 200, "ts": "2024-01-01 10:00:00"},
    ])
    _write(clk, "b1.json", [
        {"user_id": 1, "click_id": 900, "cts": "2024-01-01 10:05:00"},  # in window
        {"user_id": 2, "click_id": 901, "cts": "2024-01-01 10:20:00"},  # outside 10 min
    ])
    left = spark.readStream.schema("user_id long, imp_id long, ts timestamp").json(str(imp))
    right = spark.readStream.schema("user_id long, click_id long, cts timestamp").json(str(clk))
    j = EN.stream_interval_join(left, right, ["user_id"], "ts", "cts",
                                upper_seconds=600, watermark="30 minutes")
    q = _run(j, ckpt, out)
    q.awaitTermination(180)
    got = [(r["imp_id"], r["r_click_id"]) for r in spark.read.parquet(out).collect()]
    assert got == [(100, 900)]  # user 2's click fell outside the window


def test_dedup_within_watermark_drops_redeliveries(spark, tmp_path):
    src = tmp_path / "ev2"; src.mkdir()
    ckpt = str(tmp_path / "c2"); out = str(tmp_path / "o2")

    _write(src, "b1.json", [
        {"msg_id": 1, "ts": "2024-01-01 10:00:00", "v": 10},
        {"msg_id": 1, "ts": "2024-01-01 10:00:05", "v": 10},  # redelivery
        {"msg_id": 2, "ts": "2024-01-01 10:01:00", "v": 20},
    ])
    stream = spark.readStream.schema("msg_id long, ts timestamp, v long").json(str(src))
    d = EN.dedup_within_watermark(stream, ["msg_id"], "ts", watermark="10 minutes")
    q = _run(d, ckpt, out)
    q.awaitTermination(120)
    got = sorted(r["msg_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2]

    # a redelivery in a LATER batch, still inside the watermark window,
    # is also dropped (state persisted via checkpoint)
    _write(src, "b2.json", [
        {"msg_id": 1, "ts": "2024-01-01 10:02:00", "v": 10},
        {"msg_id": 3, "ts": "2024-01-01 10:03:00", "v": 30},
    ])
    stream2 = spark.readStream.schema("msg_id long, ts timestamp, v long").json(str(src))
    q2 = _run(EN.dedup_within_watermark(stream2, ["msg_id"], "ts"), ckpt, out)
    q2.awaitTermination(120)
    got2 = sorted(r["msg_id"] for r in spark.read.parquet(out).collect())
    assert got2 == [1, 2, 3]


def test_sessionized_counts_groups_by_gap(spark, tmp_path):
    src = tmp_path / "ev3"; src.mkdir()
    ckpt = str(tmp_path / "c3"); out = str(tmp_path / "o3")

    # user 1: two bursts separated by > 30 min -> two sessions
    _write(src, "b1.json", [
        {"user_id": 1, "ts": "2024-01-01 10:00:00"},
        {"user_id": 1, "ts": "2024-01-01 10:10:00"},
        {"user_id": 1, "ts": "2024-01-01 12:00:00"},
        {"user_id": 2, "ts": "2024-01-01 10:05:00"},
        # watermark driver: far-future event closes everything above
        {"user_id": 99, "ts": "2024-01-02 00:00:00"},
    ])
    stream = spark.readStream.schema("user_id long, ts timestamp").json(str(src))
    s = EN.sessionized_counts(stream, "user_id", "ts", gap="30 minutes")

    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("append").parquet(out)

    q = (s.writeStream.outputMode("append").foreachBatch(sink)
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["user_id"], r["n_events"])
                 for r in spark.read.parquet(out).collect())
    # sessions closed by the watermark: u1 burst(2) + u1 single + u2 single
    assert got == [(1, 1), (1, 2), (2, 1)]
