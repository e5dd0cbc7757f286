"""Incremental re-verification: compare only chunks whose source
checksum changed since the last verified run.

The reference persists per-chunk verify results in its metadata DB
(task/chunk ledger, model/task tables) and re-runs only failed or
stale chunks on resume (database/processor/data_compare_task.go resume
path).  Re-expressed Spark-first:

- the LEDGER is a parquet table of per-chunk checksum sums from the
  last verified run (``chunk_id, cnt, h0..h3``)
- a re-verify recomputes SOURCE sums (one scan), anti-joins the ledger
  to find changed/new/vanished chunks — O(chunks) rows
- only the changed chunks' key ranges are read on the TARGET side: the
  chunk predicates (``chunker.chunk_predicate``) go into ``filter``,
  so parquet/JDBC scans prune untouched ranges instead of rescanning
  the table

At 100 TB this turns a nightly full compare into an incremental one
proportional to churn.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_spark.operators.compare import chunked_checksum
from dbms_spark.plans.chunker import ChunkPlan, assign_chunk_id, chunk_predicate

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
) -> tuple[DataFrame, ReverifyReport]:
    """One incremental verify round.  Returns ``(new_ledger_sums,
    report)`` — persist the sums with :func:`save_ledger` after acting
    on the report.

    Contract: a chunk is recompared iff its SOURCE checksum moved
    (new, vanished, or changed).  Chunks whose source is untouched are
    trusted from the prior verified run and the target is NOT re-read
    for them — that skip is the point."""
    cols = cols or src.columns
    spark = src.sparkSession
    n_chunks = len(plan.bounds) + 1
    # chunk sums are O(chunks): materialize once, reuse driver-side
    live = chunked_checksum(src, assign_chunk_id(plan, src), cols, oracle_empty_is_null)
    src_sums = spark.createDataFrame(live.collect(), live.schema)
    to_check = sorted(r["chunk_id"] for r in changed_chunks(src_sums, ledger).collect())
    if not to_check:
        return src_sums, ReverifyReport([], [], n_chunks)
    # target side reads ONLY the changed chunks' key ranges: the
    # predicate reaches the scan (PushedFilters) instead of a
    # post-scan chunk_id filter over the whole table
    pred = " OR ".join(f"({chunk_predicate(plan, i)})" for i in to_check)
    dst_sub = dst.filter(F.expr(pred))
    dst_sums = chunked_checksum(
        dst_sub, assign_chunk_id(plan, dst_sub), cols, oracle_empty_is_null
    )
    a = src_sums.filter(F.col("chunk_id").isin(to_check)).select(
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
