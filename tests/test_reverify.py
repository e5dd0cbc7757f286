"""Incremental re-verify: only chunks whose source checksum moved are
recompared; untouched chunk ranges are not re-read on the target."""

import pytest
from pyspark.sql import functions as F

from dbms_spark.operators import reverify as R
from dbms_spark.plans import chunker
from dbms_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").cache()


@pytest.fixture(scope="module")
def plan(orders):
    return chunker.plan_chunks(orders, ["o_orderkey"], 10)


def test_first_run_checks_everything(orders, plan):
    sums, rep = R.reverify(orders, orders, plan, ledger=None)
    assert rep.checked_chunks and rep.mismatched_chunks == []
    assert len(rep.checked_chunks) <= rep.total_chunks


def test_unchanged_source_skips_target_entirely(orders, plan, tmp_path, spark):
    sums, _ = R.reverify(orders, orders, plan, ledger=None)
    R.save_ledger(sums, str(tmp_path / "ledger"))
    ledger = R.load_ledger(spark, str(tmp_path / "ledger"))
    # dst is silently BROKEN — but src is unchanged, so the incremental
    # contract trusts the prior verified run and never reads dst
    broken_dst = orders.filter("o_orderkey % 2 = 0")
    sums2, rep = R.reverify(orders, broken_dst, plan, ledger=ledger)
    assert rep.checked_chunks == [] and rep.mismatched_chunks == []


def test_changed_chunks_recompared_and_pruned(orders, plan, spark, tmp_path):
    sums, _ = R.reverify(orders, orders, plan, ledger=None)
    ledger_path = str(tmp_path / "ledger")
    R.save_ledger(sums, ledger_path)
    ledger = R.load_ledger(spark, ledger_path)
    # mutate src rows in a few chunks
    src2 = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 501 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    )
    expected = {
        r["cid"] for r in
        orders.filter("o_orderkey % 501 = 0")
        .withColumn("cid", chunker.assign_chunk_id(plan, orders))
        .select("cid").distinct().collect()
    }
    _, rep = R.reverify(src2, orders, plan, ledger=ledger)
    assert set(rep.checked_chunks) == expected     # only moved chunks recompared
    assert set(rep.mismatched_chunks) == expected  # and they do differ from dst
    # the target read is range-restricted: the predicate keeps only
    # checked-chunk keys (behavioral proxy for scan pruning)
    pred = " OR ".join(f"({chunker.chunk_predicate(plan, i)})" for i in rep.checked_chunks)
    outside = orders.filter(~F.expr(pred)).withColumn(
        "cid", chunker.assign_chunk_id(plan, orders)
    )
    assert outside.filter(F.col("cid").isin(rep.checked_chunks)).count() == 0


def test_matching_change_on_both_sides_is_clean(orders, plan, spark, tmp_path):
    sums, _ = R.reverify(orders, orders, plan, ledger=None)
    ledger = spark.createDataFrame(sums.collect(), sums.schema)
    both = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 733 == 0, F.col("o_totalprice") + 2.0)
        .otherwise(F.col("o_totalprice")),
    )
    _, rep = R.reverify(both, both, plan, ledger=ledger)
    assert rep.checked_chunks != [] and rep.mismatched_chunks == []
