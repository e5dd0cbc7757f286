"""Incremental re-verification: compare only chunks whose source
checksum changed since the last verified run.

The reference persists per-chunk verify results in its metadata DB
(task/chunk ledger, model/task tables) and re-runs only failed or
stale chunks on resume (database/processor/data_compare_task.go resume
path).  Re-expressed Spark-first:

- the LEDGER is a parquet table of per-chunk checksum sums from the
  last verified run (``chunk_id, cnt, h0..h3``)
- a re-verify recomputes SOURCE sums (one scan), anti-joins the ledger
  to find changed/new/vanished chunks — O(chunks) rows, kept as a
  DISTRIBUTED relation end to end (the sums are never collected; only
  chunk *ids* ever reach the driver, for the report and the pushdown
  text)
- only the changed chunks' key ranges are read on the TARGET side:
  contiguous changed chunks coalesce into range predicates
  (``chunker.chunk_range_predicate``), and the predicate text is
  CAPPED at ``max_ranges`` ranges — beyond that the smallest gaps
  between runs are swallowed (a slightly-superset read) and exactness
  is restored by a semi-join of the target sums against the changed
  set.  So the pushdown reaches the parquet/JDBC scan
  (PushedFilters), its text is O(max_ranges) regardless of churn, and
  the result is identical to the per-chunk form.

At 100 TB this turns a nightly full compare into an incremental one
proportional to churn, with driver memory O(changed chunk ids) and
plan size O(max_ranges) even at reference-style 500-row chunks
(millions of chunks, high churn).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_spark.operators.compare import chunked_checksum
from dbms_spark.plans.chunker import (
    ChunkPlan,
    _cap_runs,
    _runs,
    assign_chunk_id,
    ranges_predicate,
)

_SUM_COLS = ["cnt", "h0", "h1", "h2", "h3"]


def save_ledger(sums: DataFrame, path: str) -> None:
    sums.write.mode("overwrite").parquet(path)


def load_ledger(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def changed_chunks(src_sums: DataFrame, ledger: DataFrame | None) -> DataFrame:
    """Chunk ids whose source checksum differs from the ledger (or all
    of them when there is no ledger yet)."""
    if ledger is None:
        return src_sums.select("chunk_id")
    a = src_sums.select("chunk_id", *[F.col(c).alias(f"a_{c}") for c in _SUM_COLS])
    b = ledger.select("chunk_id", *[F.col(c).alias(f"b_{c}") for c in _SUM_COLS])
    j = a.join(b, "chunk_id", "full_outer")
    same = None
    for c in _SUM_COLS:
        eq = F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
        same = eq if same is None else (same & eq)
    return j.filter(~same).select("chunk_id")


def target_predicate(plan: ChunkPlan, ids: list[int],
                     max_ranges: int = 256, dialect: str = "spark") -> str:
    """Bounded pushdown text for the target-side read of the changed
    chunks — delegated to :func:`chunker.ranges_predicate` (shared
    with compare.drilldown_chunks).  Callers MUST still restrict the
    compared chunk ids exactly (the semi-join in :func:`reverify`) —
    the predicate is an I/O-pruning optimization, not the correctness
    boundary."""
    return ranges_predicate(plan, ids, max_ranges, dialect)


@dataclass(frozen=True)
class ReverifyReport:
    checked_chunks: list[int]      # chunks recompared this run
    mismatched_chunks: list[int]   # of those, chunks differing from dst
    total_chunks: int


def reverify(
    src: DataFrame,
    dst: DataFrame,
    plan: ChunkPlan,
    ledger: DataFrame | None,
    cols: list[str] | None = None,
    oracle_empty_is_null: bool = False,
    max_ranges: int = 256,
) -> tuple[DataFrame, ReverifyReport]:
    """One incremental verify round.  Returns ``(new_ledger_sums,
    report)`` — persist the sums with :func:`save_ledger` after acting
    on the report.

    Contract: a chunk is recompared iff its SOURCE checksum moved
    (new, vanished, or changed).  Chunks whose source is untouched are
    trusted from the prior verified run and the target is NOT re-read
    for them — that skip is the point.

    Scale shape: the chunk sums stay a distributed relation (persisted,
    never collected — only ids reach the driver); the target pushdown
    is O(``max_ranges``) text with a semi-join guaranteeing exactness
    when the cap forces a superset read."""
    cols = cols or src.columns
    n_chunks = len(plan.bounds) + 1
    # chunk sums are O(chunks) ROWS but stay distributed: persist for
    # reuse (changed-set, compare join, returned ledger) — never
    # collected to the driver
    src_sums = chunked_checksum(
        src, assign_chunk_id(plan, src), cols, oracle_empty_is_null
    ).persist()
    to_check_df = changed_chunks(src_sums, ledger)
    # ids only (no sum columns) cross to the driver — for the report
    # and the bounded pushdown text
    to_check = sorted(r["chunk_id"] for r in to_check_df.collect())
    if not to_check:
        return src_sums, ReverifyReport([], [], n_chunks)
    # target side reads ONLY the changed chunks' key ranges: the capped
    # range predicate reaches the scan (PushedFilters); the semi-joins
    # below pin the compared chunk set exactly even if the cap widened
    # the read
    pred = target_predicate(plan, to_check, max_ranges)
    dst_sub = dst.filter(F.expr(pred))
    dst_sums = chunked_checksum(
        dst_sub, assign_chunk_id(plan, dst_sub), cols, oracle_empty_is_null
    ).join(to_check_df, "chunk_id", "left_semi")
    a = src_sums.join(to_check_df, "chunk_id", "left_semi").select(
        "chunk_id", *[F.col(c).alias(f"a_{c}") for c in _SUM_COLS]
    )
    b = dst_sums.select("chunk_id", *[F.col(c).alias(f"b_{c}") for c in _SUM_COLS])
    j = a.join(b, "chunk_id", "full_outer")
    same = None
    for c in _SUM_COLS:
        eq = F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
        same = eq if same is None else (same & eq)
    bad = sorted(r["chunk_id"] for r in j.filter(~same).select("chunk_id").collect())
    return src_sums, ReverifyReport(to_check, bad, n_chunks)
