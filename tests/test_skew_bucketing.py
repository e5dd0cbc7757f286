"""Skew mitigation + bucketed co-located joins."""

from pyspark.sql import functions as F

from dbms_spark.plans import skew as SK
from dbms_spark.sources import bucketed as B
from dbms_spark.sources.catalog import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["cnt"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s")).collect()
    }
    li2 = li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(18,2)"))
    salted = {
        r["l_returnflag"]: (r["count_l_orderkey"], r["sum_l_quantity"])
        for r in SK.salted_agg(
            li2, ["l_returnflag"], {"l_orderkey": "count", "l_quantity": "sum"}
        ).collect()
    }
    for k, (cnt, s) in plain.items():
        assert salted[k][0] == cnt
        assert salted[k][1] == s


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    salted = SK.salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust, on="c_custkey"
    ).count()
    assert salted == plain


def test_top_keys_diagnosis(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    top = SK.top_keys(li, "l_returnflag", 3).collect()
    assert len(top) == 3
    assert abs(sum(r["share"] for r in top) - 1.0) < 1e-9  # 3 flags cover all
    assert top[0]["cnt"] >= top[-1]["cnt"]


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # warehouse dir is a static conf — uses the session default; clean
    # any leftovers from prior crashed runs (drop doesn't always reap
    # the location)
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    B.write_bucketed(orders, "b_orders", "o_orderkey", 8)
    B.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8
    )
    # force the big-table join path: at real scale neither side fits a
    # broadcast, which is exactly when bucketing pays off
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert not B.plan_has_shuffle(joined), "bucketed join must not shuffle"
        # and the same join on non-bucketed reads DOES shuffle
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert B.plan_has_shuffle(plain)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cms_estimate_dominates_exact(spark):
    from dbms_spark.operators.sketch import cms_cells, heavy_hitters_with_cms

    rows = [(k,) for k in [1] * 50 + [2] * 30 + list(range(100, 400))]
    df = spark.createDataFrame(rows, "k bigint")
    out = {r["k"]: r for r in heavy_hitters_with_cms(df, "k", n=2, width=64).collect()}
    assert set(out) == {1, 2}
    assert out[1]["exact_cnt"] == 50 and out[2]["exact_cnt"] == 30
    # one-sided error: the sketch never undercounts
    assert out[1]["cms_est"] >= 50 and out[2]["cms_est"] >= 30
    # sketch size is bounded by depth*width regardless of input size
    assert cms_cells(df, "k", depth=3, width=64).count() <= 3 * 64


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE config really does split a skewed join
    partition at runtime: the FINAL adaptive plan must carry
    SortMergeJoin(skew=true).  (Thresholds are lowered so a test-size
    skew triggers; production keeps the session defaults — the point
    is that the mechanism the 100 TB design leans on is live.)"""
    from pyspark.sql import functions as F

    keys = ["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold"]
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "16KB")
        spark.conf.set(keys[1], "8KB")
        spark.conf.set(keys[2], "2")
        spark.conf.set(keys[3], "-1")
        left = spark.range(300000).select(
            F.when(F.col("id") % 7 == 0, F.col("id") % 1000).otherwise(0).alias("k"),
            F.col("id").alias("lv"))
        right = spark.range(1000).select(F.col("id").alias("k"), F.col("id").alias("rv"))
        j = left.join(right, "k").select(F.sum("lv").alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_hll_registers_merge_and_accuracy(spark, sf_dir):
    """The HLL sketch property that makes it the at-scale NDV shape:
    registers of a union are the elementwise MAX of the parts'
    registers; and the raw estimate lands near exact NDV (m=64 ->
    theoretical rsd ~13%)."""
    from dbms_spark.operators.sketch import hll_estimate, hll_registers
    from dbms_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    half_a = orders.filter("o_custkey % 2 = 0")
    half_b = orders.filter("o_custkey % 2 = 1")

    whole = {r["bucket"]: r["register"] for r in hll_registers(orders, "o_custkey").collect()}
    ra = {r["bucket"]: r["register"] for r in hll_registers(half_a, "o_custkey").collect()}
    rb = {r["bucket"]: r["register"] for r in hll_registers(half_b, "o_custkey").collect()}
    assert set(whole) == set(range(64))
    for b in range(64):
        assert whole[b] == max(ra[b], rb[b]), b   # merge = elementwise MAX

    est = hll_estimate(orders, "o_custkey").first()
    exact = orders.distinct().count()
    assert est["n_empty_buckets"] == sum(1 for v in whole.values() if v == 0)
    # raw estimator (no bias corrections): allow 3 sigma at rsd ~ 1.04/8
    assert abs(est["hll_est"] - exact) <= 0.4 * exact, (est["hll_est"], exact)


def test_hll_empty_bucket_and_tiny_input(spark):
    """Empty buckets contribute 2^37 to the denominator (register 0),
    so the estimator never divides by zero, even on a 1-row input."""
    from dbms_spark.operators.sketch import hll_estimate, hll_registers

    one = spark.createDataFrame([(42,)], "k long")
    regs = {r["bucket"]: r["register"] for r in hll_registers(one, "k").collect()}
    assert len(regs) == 64 and sum(1 for v in regs.values() if v > 0) == 1
    est = hll_estimate(one, "k").first()
    assert est["n_empty_buckets"] == 63 and est["hll_est"] >= 1
