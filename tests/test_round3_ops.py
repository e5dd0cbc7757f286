"""Unit/property coverage for round-3 operators: masking invariants,
shard uniformity, contamination-overlap bounds, constraint-rule
counting."""

from pyspark.sql import functions as F

from dbms_spark.sources.catalog import load_table


def test_mask_pseudonyms_preserve_joins(spark):
    """Equal inputs -> equal pseudonyms ACROSS tables, so FK joins
    still line up after masking; nulls stay null; non-masked columns
    pass through."""
    from dbms_spark.operators.mask import mask_columns

    a = spark.createDataFrame([(1, "alice"), (2, "bob"), (3, None)], "id int, name string")
    b = spark.createDataFrame([(10, "alice"), (11, "carol")], "ref int, name string")
    ma = mask_columns(a, pseudonyms=["name"])
    mb = mask_columns(b, pseudonyms=["name"])
    assert ma.filter("id = 3").first()["name"] is None
    # alice's pseudonym agrees across both masked tables
    pa = ma.filter("id = 1").first()["name"]
    pb = mb.filter("ref = 10").first()["name"]
    assert pa == pb and pa.startswith("ID_") and pa != "alice"
    # join through the masked key matches exactly the original join
    assert ma.join(mb, "name").count() == a.join(b, "name").count() == 1


def test_mask_bucket_and_month(spark):
    from dbms_spark.operators.mask import mask_columns

    df = spark.createDataFrame(
        [(1, 12345.67, "2024-03-17 10:11:12")], "id int, amt double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = mask_columns(df, buckets={"amt": 1000.0}, month_dates=["ts"]).first()
    assert out["amt"] == 12000.0
    assert str(out["ts"]).startswith("2024-03-01 00:00:00")


def test_shard_assign_uniform_and_stable(spark, sf_dir):
    from dbms_spark.llm.shard import shard_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    counts = {r["shard_id"]: r["n"] for r in
              shard_assign(docs, 8).groupBy("shard_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(8))          # every shard populated
    assert max(counts.values()) < 3 * min(counts.values())  # loose uniformity
    # stability: same input -> same assignment
    again = {r["shard_id"]: r["n"] for r in
             shard_assign(docs, 8).groupBy("shard_id")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_contamination_overlap_bounds(spark, sf_dir):
    from dbms_spark.llm.text import contamination_overlap

    docs = load_table(spark, sf_dir, "documents")
    out = contamination_overlap(
        docs.filter("doc_id % 13 <> 0").select("doc_id", "text"),
        docs.filter("doc_id % 13 = 0").select("text"), n=3)
    bad = out.filter(
        (F.col("n_hits") > F.col("n_shingles"))
        | (F.col("overlap_ratio") < 0) | (F.col("overlap_ratio") > 1)).count()
    assert bad == 0
    # zero-hit docs ARE present (the check form drops them; overlap keeps them)
    assert out.filter("n_hits = 0").count() > 0


def test_check_constraints_counts_exactly(spark):
    from dbms_spark.operators.validate import check_constraints

    df = spark.createDataFrame(
        [(None, 5.0, "A"), ("x", -2.0, "B"), ("y", 3.0, "Z"), ("z", 99.0, "A")],
        "name string, v double, cat string")
    rules = [
        ("name_nn", "name", "not_null", None),
        ("v_min", "v", "min", 0.0),
        ("v_max", "v", "max", 10.0),
        ("cat_dom", "cat", "in_set", ("A", "B")),
    ]
    got = {r["rule_name"]: r["violations"] for r in check_constraints(df, rules).collect()}
    assert got == {"name_nn": 1, "v_min": 1, "v_max": 1, "cat_dom": 1}


def test_windowed_constraint_counts_streaming(spark, tmp_path):
    """The streaming contract monitor counts violations per event-time
    window through a real micro-batch execution."""
    import json

    src = tmp_path / "cstream"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01 00:01:00", "v": 5.0, "name": "a"},
        {"ts": "2024-01-01 00:02:00", "v": -1.0, "name": None},   # 2 violations
        {"ts": "2024-01-01 00:20:00", "v": 99.0, "name": "b"},    # max violation
    ]
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema("ts timestamp, v double, name string").json(str(src))

    from dbms_spark.operators.validate import windowed_constraint_counts

    out = windowed_constraint_counts(
        stream,
        [("name_nn", "name", "not_null", None),
         ("v_min", "v", "min", 0.0),
         ("v_max", "v", "max", 10.0)],
        window="15 minutes")
    # update mode: every window's running counts surface each batch
    # (append would hold windows open until the watermark passes them)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("contract_mon").option(
             "checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): (r["name_nn"], r["v_min"], r["v_max"])
           for r in spark.sql("SELECT * FROM contract_mon").collect()}
    assert got["2024-01-01 00:00:00"] == (1, 1, 0)
    assert got["2024-01-01 00:15:00"] == (0, 0, 1)


def test_approx_ndv_within_tolerance(spark, sf_dir):
    """HLL estimates land within ~3 rsd of exact for every orders
    column (the documented swap-in for column_profile at scale)."""
    from dbms_spark.operators.assess import approx_ndv_profile, column_profile

    exact = {r["column_name"]: r["n_distinct"]
             for r in column_profile(spark, sf_dir, "orders").collect()}
    approx = {r["column_name"]: r["approx_ndv"]
              for r in approx_ndv_profile(
                  spark.read.parquet(f"{sf_dir}/orders.parquet"), rsd=0.05).collect()}
    for c, nd in exact.items():
        rel = abs(approx[c] - nd) / max(nd, 1)
        assert rel <= 0.15, f"{c}: exact={nd} approx={approx[c]} rel={rel:.3f}"


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """GK approx percentiles land near the exact sort-based values for
    lineitem's numeric columns (the at-scale swap-in for
    numeric_profile)."""
    from dbms_spark.operators.assess import approx_percentile_profile

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice"]
    approx = {r["column_name"]: (r["p25"], r["p50"], r["p95"])
              for r in approx_percentile_profile(li, cols).collect()}
    for c in cols:
        exact = li.selectExpr(
            f"percentile({c}, array(0.25, 0.5, 0.95)) AS q").first()["q"]
        for a, e in zip(approx[c], exact):
            span = exact[2] - exact[0] or 1.0
            assert abs(a - e) <= 0.05 * span + 1e-9, (c, a, e)
