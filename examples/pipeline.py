#!/usr/bin/env python3
"""End-to-end training-data pipeline: the composed form of the
engine's verbs a corpus actually flows through —

    quality filter -> exact+near dedup -> decontaminate ->
    source mixing -> embedding clustering + cluster-balanced sampling ->
    token-window chunking -> packed, sharded write -> JSONL shards

Run (any scale dir):

    python examples/pipeline.py [sf_dir] [out_dir]

Prints one JSON line per stage with surviving row counts, then writes
the final chunks partitioned by shard.  Every stage is a bounded,
shuffle-lean plan (see docs/PLANS.md / docs/SCALE.md); nothing here
collects a corpus to the driver.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.engine import DbmsEngine  # noqa: E402
from dbms_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str | None = None, out_dir: str | None = None,
         spark=None) -> list[dict]:
    """Runs the pipeline; returns the stage dicts it prints.  Pass an
    existing ``spark`` to reuse a session — the function only stops
    sessions it created."""
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    out_dir = out_dir or "/tmp/dbms_spark_pipeline"
    owned = spark is None
    if owned:
        spark = get_spark("pipeline_example")
    stages: list[dict] = []

    def emit(d: dict) -> None:
        stages.append(d)
        print(json.dumps(d), flush=True)

    eng = DbmsEngine(spark)

    # Stage survivor counts ride the FINAL action as Observation
    # metrics — no mid-pipeline count() jobs, so the corpus is scanned
    # once end-to-end (at 100 TB a per-stage count() would re-run every
    # upstream stage per checkpoint; observe() is free).
    from pyspark.sql import Observation

    observations: list[tuple[str, Observation]] = []

    def stage(name, df):
        obs = Observation(name)
        observations.append((name, obs))
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    docs = stage("ingest", load_table(spark, sf_dir, "documents"))

    # 1. quality gate (length/diversity/stopword bands)
    kept = stage("quality_filter", eng.filter_quality(docs))

    # 2. near-dup removal (LSH propose -> Jaccard verify -> group ->
    #    keep one representative per group)
    deduped = stage("dedup", eng.dedup_pipeline(kept))

    # 2b. containment canonicalization: near-SUBSET copies (a doc
    #     embedded in a larger aggregator page) survive the symmetric
    #     Jaccard stage — drop them, keep the host
    uncontained = stage("drop_contained", eng.drop_contained(deduped))

    # 3. benchmark decontamination (a held-out split stands in for the
    #    eval set; production passes the real benchmark corpus)
    bench = docs.filter("doc_id % 97 = 0").select("text")
    clean = stage("decontaminate", eng.decontaminate(uncontained, bench))

    # 4. deterministic source mixing (per-source sampling rates)
    rates = {r["source"]: 80.0 for r in clean.select("source").distinct().collect()}
    mixed = stage("mix", eng.mix(clean, rates))

    # 4b. diversity pass: cluster the companion embeddings (bounded
    #     integer-exact k-means), then keep a balanced per-cluster
    #     sample so no embedding-space region dominates the mix
    from dbms_spark.llm.cluster import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_assign(emb, k=4, iters=2)
    from pyspark.sql import Window

    w = Window.partitionBy("cid").orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    balanced_ids = (clusters.withColumn("rk", F.row_number().over(w))
                    .filter("rk <= 1000").select(F.col("vec_id").alias("doc_id")))
    # embeddings ids parallel doc ids in the synthetic corpus; in
    # production this is the doc->embedding mapping table
    mixed = stage("cluster_balance", mixed.join(balanced_ids, "doc_id", "left_semi"))

    # 5. token-window chunking into model-sized pieces (chunks carry
    #    (doc_id, chunk_idx) identity; flatten it for packing)
    chunks = stage("chunk", eng.chunk(mixed, window=256, stride=192)).withColumn(
        "chunk_id", F.col("doc_id") * 10000 + F.col("chunk_idx"))

    # 6. pack chunk token counts into context bins, shard, and write
    from dbms_spark.llm.shard import pack_sequences

    sized = chunks.select(
        F.col("chunk_id").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )
    packed = stage("pack", pack_sequences(sized, capacity=512, n_shards=8))

    final = chunks.join(
        packed.select(F.col("doc_id").alias("chunk_id"), "shard_id", "bin_id", "bin_offset"),
        "chunk_id")
    final.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    for name, obs in observations:
        emit({"stage": name, "rows": int(obs.get["rows"])})
    emit({"stage": "write", "rows": spark.read.parquet(out_dir).count(),
          "out": out_dir})

    # 7. interchange export: JSONL shards with a size cap
    from dbms_spark.operators.migrate import write_jsonl

    write_jsonl(final.select("chunk_id", "shard_id", "chunk_text"),
                out_dir + "_jsonl", max_records_per_file=10000)
    emit({"stage": "jsonl", "out": out_dir + "_jsonl"})

    # 8. loader-ready export: one deterministic tar per shard
    # (WebDataset layout — the bytes are a pure function of content)
    from dbms_spark.llm.shard import write_tar_shards

    n_tars = write_tar_shards(
        final.select(F.col("chunk_id").alias("doc_id"), F.col("chunk_text").alias("text")),
        out_dir + "_tars", n_shards=8, id_col="doc_id", text_col="text")
    emit({"stage": "tar", "shards": n_tars, "out": out_dir + "_tars"})
    if owned:
        spark.stop()
    return stages


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         sys.argv[2] if len(sys.argv) > 2 else None)
