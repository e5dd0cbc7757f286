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


def test_runs_and_cap():
    """Run coalescing + gap-merge cap: smallest gaps swallowed first,
    output always sorted, disjoint, covering the input ids."""
    assert R._runs([1, 2, 3, 7, 9, 10]) == [(1, 3), (7, 7), (9, 10)]
    runs = [(0, 0), (2, 2), (10, 10), (11, 12), (40, 41)]
    # cap 2 keeps the single largest gap (12->40); the 0-2 and 2-10
    # gaps are swallowed into one covering run
    assert R._cap_runs(runs, 2) == [(0, 12), (40, 41)]
    assert R._cap_runs(runs, 99) == runs


def test_target_predicate_bounded_at_high_churn():
    """~10^4 chunks with 50% churn in the worst (alternating) pattern:
    the rendered pushdown text is O(max_ranges), not O(churn)."""
    n = 10_000
    plan = chunker.ChunkPlan(("k",), tuple((i,) for i in range(1, n)))
    changed = list(range(0, n, 2))               # 5,000 isolated runs
    pred = R.target_predicate(plan, changed, max_ranges=64)
    assert pred.count(" OR ") <= 63 + 2 * 64     # runs + per-range parts
    assert len(pred) < 64 * 200                  # bounded text, ~? per range
    # un-capped per-chunk form would be ~5,000 OR-terms; sanity that the
    # cap actually engaged
    assert len(R._cap_runs(R._runs(changed), 64)) == 64
    # full-churn degenerates to the whole-table read, constant text
    assert R.target_predicate(plan, list(range(n))) == "1 = 1"
    assert R.target_predicate(plan, []) == "FALSE"


def test_reverify_never_collects_sums(orders, plan, spark, tmp_path, monkeypatch):
    """Driver-memory contract: only chunk-ID relations cross to the
    driver — no collected DataFrame carries the checksum sum columns."""
    try:  # Spark 4: the concrete class overrides the abstract base
        from pyspark.sql.classic.dataframe import DataFrame as SparkDF
    except ImportError:
        from pyspark.sql import DataFrame as SparkDF
    collected_schemas = []
    orig = SparkDF.collect

    def spy(self):
        collected_schemas.append(set(self.columns))
        return orig(self)

    monkeypatch.setattr(SparkDF, "collect", spy)
    sums, _ = R.reverify(orders, orders, plan, ledger=None)
    R.save_ledger(sums, str(tmp_path / "ledger"))
    ledger = R.load_ledger(spark, str(tmp_path / "ledger"))
    src2 = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 501 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    )
    R.reverify(src2, orders, plan, ledger=ledger)
    assert collected_schemas, "spy did not engage"
    for cols in collected_schemas:
        assert not (cols & {"cnt", "h0", "h1", "h2", "h3"}), \
            f"sums collected to driver: {cols}"


def test_capped_read_still_exact(orders, spark, tmp_path):
    """With max_ranges=1 the target read widens to a covering range
    (superset I/O) but the compared chunk set — and the verdict — are
    identical to the uncapped run: the semi-join is the correctness
    boundary, the predicate only prunes I/O."""
    plan50 = chunker.plan_chunks(orders, ["o_orderkey"], 50)
    sums, _ = R.reverify(orders, orders, plan50, ledger=None)
    ledger = spark.createDataFrame(sums.collect(), sums.schema)
    src2 = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 211 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    )
    _, uncapped = R.reverify(src2, orders, plan50, ledger=ledger)
    _, capped = R.reverify(src2, orders, plan50, ledger=ledger, max_ranges=1)
    assert capped.checked_chunks == uncapped.checked_chunks
    assert capped.mismatched_chunks == uncapped.mismatched_chunks
    assert len(uncapped.checked_chunks) > 1      # the cap actually bit


def test_changed_ranges_distributed_matches_driver_cap(spark):
    """_changed_ranges (anti-join islands + gap-rank cap) returns
    EXACTLY what the driver-side _cap_runs(_runs(ids)) would — on an
    adversarial mix of isolated ids, long runs, and uneven gaps, at
    several cap levels including cap=1 and cap >= n_runs (no-op)."""
    ids = sorted(set(
        list(range(0, 40, 2)) + list(range(100, 140)) +
        [200, 205, 206, 207, 300] + list(range(1000, 1003))))
    df = spark.createDataFrame([(i,) for i in ids], "chunk_id BIGINT")
    for cap in (1, 2, 5, 16, 99):
        want = R._cap_runs(R._runs(ids), cap)
        got = R._changed_ranges(df, cap)
        assert got == want, f"cap={cap}: {got} != {want}"


def test_reverify_driver_transfer_bounded_at_50pct_churn(spark, monkeypatch):
    """The round-5 watch item, closed: at 10^5 chunks with 50% churn in
    the WORST (alternating) pattern — 50,000 isolated runs — the only
    per-chunk rows that cross to the driver are the <= max_ranges
    coalesced ranges.  A collect spy sums every collected row count;
    no call returns more than max_ranges rows and none carries ids or
    sums."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame as SparkDF
    except ImportError:
        from pyspark.sql import DataFrame as SparkDF
    collected = []
    orig = SparkDF.collect

    def spy(self):
        rows = orig(self)
        collected.append((set(self.columns), len(rows)))
        return rows

    monkeypatch.setattr(SparkDF, "collect", spy)
    max_ranges = 64
    changed = spark.range(0, 100_000, 2).select(
        F.col("id").alias("chunk_id"))           # 50,000 isolated runs
    ranges = R._changed_ranges(changed, max_ranges)
    assert len(ranges) <= max_ranges
    assert ranges[0][0] == 0 and ranges[-1][1] == 99_998
    assert sum(hi - lo + 1 for lo, hi in ranges) >= 50_000  # covers all
    assert collected, "spy did not engage"
    for cols, n in collected:
        assert n <= max_ranges, f"{n} rows collected to driver ({cols})"
        assert not (cols & {"chunk_id", "cnt", "h0", "h1", "h2", "h3"})


def test_save_ledger_unpersists(orders, plan, tmp_path):
    """save_ledger ends the persisted-sums lifecycle: after the write
    the returned relation is no longer cached (nightly loops must not
    accumulate cached chunk-sum relations)."""
    sums, _ = R.reverify(orders, orders, plan, ledger=None)
    assert sums.storageLevel.useMemory or sums.storageLevel.useDisk
    R.save_ledger(sums, str(tmp_path / "ledger"))
    lvl = sums.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
