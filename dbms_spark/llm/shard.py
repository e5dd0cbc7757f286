"""Training-data sharding + sequence packing.

The last mile of a 100 TB corpus pipeline: deterministically spread
documents across N output shards (so a training job's data loaders
read balanced, reproducible slices) and pack token counts into
fixed-capacity context-window bins per shard.

Scale shape: shard assignment is a map-side md5 bucket — no shuffle;
packing is a running-total window PARTITIONED BY SHARD (each shard
packs independently, exactly like per-worker packing in a real data
loader), so no global sort ever happens.  Both ops are dual-emitted
for the DuckDB differential gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_assign(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard id in [0, n_shards): md5 bucket of the doc
    id — stable across runs/engines, uniform, and independent of input
    order (an engine-native ``hash()`` or round-robin would be
    neither)."""
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_shards
    )
    return df.withColumn("shard_id", shard)


def shard_assign_sql(id_col: str = "doc_id", n_shards: int = 8) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_shards} AS BIGINT)"
    )


def shard_stats(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                tokens_col: str = "n_tokens") -> DataFrame:
    """Per-shard document and token totals — the balance report a
    sharded export is validated with."""
    return (
        shard_assign(df, n_shards, id_col)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(tokens_col).cast("bigint").alias("total_tokens"),
        )
    )


def pack_sequences(df: DataFrame, capacity: int, n_shards: int,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens") -> DataFrame:
    """Greedy token-budget packing into fixed-capacity bins, per shard:
    documents stream in deterministic ``id_col`` order and fill
    running-total bins of ``capacity`` tokens (documents may straddle
    a bin boundary — the standard concat-then-chunk packing used for
    LLM pretraining batches).

    Emits (shard_id, doc, n_tokens, bin_id, bin_offset): ``bin_id`` =
    which context window this document STARTS in, ``bin_offset`` = its
    token offset inside that window.  The window runs per shard —
    bounded state, no global sort."""
    w = (
        Window.partitionBy("shard_id").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(tokens_col).over(w).cast("bigint")
    start = cum - F.col(tokens_col)
    return (
        shard_assign(df, n_shards, id_col)
        .select(
            "shard_id", F.col(id_col),
            F.col(tokens_col).cast("bigint").alias(tokens_col),
            F.floor(start / capacity).cast("bigint").alias("bin_id"),
            (start % capacity).cast("bigint").alias("bin_offset"),
        )
    )


def pack_sequences_sql(inner_sql: str, capacity: int, n_shards: int,
                       id_col: str = "doc_id", tokens_col: str = "n_tokens") -> str:
    """DuckDB twin of :func:`pack_sequences` (``inner_sql`` must emit
    ``id_col`` and ``tokens_col``)."""
    shard = shard_assign_sql(id_col, n_shards)
    return f"""
WITH src AS ({inner_sql}),
sh AS (SELECT *, {shard} AS shard_id FROM src),
c AS (SELECT shard_id, {id_col}, CAST({tokens_col} AS BIGINT) AS {tokens_col},
             CAST(SUM({tokens_col}) OVER (PARTITION BY shard_id ORDER BY {id_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - CAST({tokens_col} AS BIGINT) AS start
      FROM sh)
SELECT shard_id, {id_col}, {tokens_col},
       CAST(floor(CAST(start AS DOUBLE) / {capacity}) AS BIGINT) AS bin_id,
       CAST(start % {capacity} AS BIGINT) AS bin_offset
FROM c
"""


# ---------------------------------------------------------------------------
# WebDataset-style tar shards — the export format streaming data
# loaders consume (one tar per shard, one file per sample).
# ---------------------------------------------------------------------------

def tar_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Serialize each md5-assigned shard into ONE deterministic tar
    payload: (shard_id, n_docs, payload_bytes, tar_bytes) with a
    ``<id>.txt`` member per document.  Members are sorted by id and
    headers pinned (mtime 0, uid/gid 0) so the tar bytes are a pure
    function of the shard's content — re-exports are byte-identical
    and diffable by hash.  Built with applyInPandas grouped on the
    shard id: each shard's docs stream through ONE executor task as
    Arrow batches and the only shuffle is the groupBy(shard_id); no
    tar ever exists driver-side.  Shard tars must fit an executor
    task's memory — size n_shards so payload/shard is O(100 MB-1 GB),
    exactly how WebDataset shards are sized in practice.  The
    countable fields are oracle-gated (q237); the tar bytes carry
    determinism + read-back unit tests (a tarball is not expressible
    in SQL).  ``id_col`` must be non-NULL and unique — member names
    derive from it, and NULL/duplicate ids would collide inside a
    shard (NULL-id rows are dropped with the same
    a-NULL-is-not-a-key rule as the sketches)."""
    import io
    import tarfile

    import pandas as pd

    assigned = (shard_assign(df.where(F.col(id_col).isNotNull()), n_shards, id_col)
                .select("shard_id", F.col(id_col).cast("string").alias("__id"),
                        F.col(text_col).alias("__text")))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        buf = io.BytesIO()
        total = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.sort_values("__id").iterrows():
                payload = (row["__text"] or "").encode("utf-8")
                info = tarfile.TarInfo(name=f"{row['__id']}.txt")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(payload))
                total += len(payload)
        return pd.DataFrame({
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "n_docs": [len(pdf)],
            "payload_bytes": [total],
            "tar_bytes": [buf.getvalue()],
        })

    return assigned.groupBy("shard_id").applyInPandas(
        _pack,
        "shard_id bigint, n_docs bigint, payload_bytes bigint, tar_bytes binary")


def write_tar_shards(df: DataFrame, out_dir: str, n_shards: int,
                     id_col: str = "doc_id", text_col: str = "text") -> int:
    """Land each shard as ``shard-NNNNN.tar`` under ``out_dir``.
    Files are written from executor tasks via foreachPartition —
    assumes a shared filesystem (the compact_small_files assumption;
    on a real cluster point out_dir at the mounted lake path).
    Returns the shard count."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    shards = tar_shards(df, n_shards, id_col, text_col)

    def _land(rows) -> None:
        for r in rows:
            path = os.path.join(out_dir, f"shard-{r['shard_id']:05d}.tar")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(r["tar_bytes"]))
            os.replace(tmp, path)

    shards.foreachPartition(_land)
    return len(os.listdir(out_dir))
