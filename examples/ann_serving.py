#!/usr/bin/env python3
"""ANN index serving lifecycle: the at-scale shape where a vector
corpus is indexed ONCE and then maintained, never re-encoded —

    day 0: train quantizers on a bounded sample
           -> build the IVF+PQ index RELATION (id, cluster, q, norm,
              codes) and persist it partitionBy(cluster)
           -> record the drift baseline (ivf_index_stats)
    day N: append the nightly batch against the FROZEN quantizers
           (O(batch): the stored rows are never touched)
           -> compare drift stats to the baseline; retrain + rebuild
              only when the trigger fires
    serve: collect the query batch's probe cells (bounded by the
           cell count) -> literal cluster IN (...) read = statically
           partition-pruned scan -> in-cell ranking (exact cosine or
           compressed ADC), both answered by the SAME relation

Run:

    python examples/ann_serving.py [sf_dir] [work_dir]

Prints one JSON line per stage."""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.llm import similarity as S  # noqa: E402
from dbms_spark.sources.catalog import load_table, table_path  # noqa: E402


def main(sf_dir: str | None = None, work: str | None = None,
         spark=None) -> list[dict]:
    sf = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.001")
    work = work or tempfile.mkdtemp(prefix="ann_serving_")
    own = spark is None
    if own:
        spark = get_spark("ann_serving")
    stages: list[dict] = []

    def stage(**kw):
        stages.append(kw)
        print(json.dumps(kw), flush=True)

    emb = load_table(spark, sf, "embeddings")
    # day 0: train on a bounded sample; build + persist the index
    cents = S.train_ivf_centroids(table_path(sf, "embeddings"), k=8,
                                  spark=spark)
    books = S.train_pq_codebooks(table_path(sf, "embeddings"), m=8,
                                 ksub=16, spark=spark)
    corpus = emb.filter("vec_id % 4 != 0")        # day-0 corpus
    ipath = os.path.join(work, "index")
    S.ivf_index_build(corpus, cents, books).write.partitionBy(
        "cluster").parquet(ipath)
    baseline = S.ivf_index_stats(spark.read.parquet(ipath), cents)
    base_mean = baseline.agg(F.avg("mean_own_cos_ppm")).collect()[0][0]
    stage(stage="build", rows=corpus.count(),
          cells=baseline.count(), base_mean_own_cos_ppm=int(base_mean))

    # day N: O(batch) append against the frozen quantizers
    batch = emb.filter("vec_id % 4 = 0")
    appended = S.ivf_index_append(spark.read.parquet(ipath), batch,
                                  cents, books)
    ipath2 = os.path.join(work, "index_v2")
    appended.write.partitionBy("cluster").parquet(ipath2)
    index = spark.read.parquet(ipath2)
    mean_now = (S.ivf_index_stats(index, cents)
                .agg(F.avg("mean_own_cos_ppm")).collect()[0][0])
    retrain = mean_now < base_mean - 50_000       # the documented trigger
    stage(stage="append", batch_rows=batch.count(),
          index_rows=index.count(), mean_own_cos_ppm=int(mean_now),
          retrain_trigger_fired=bool(retrain))

    # serve: statically pruned read + both ranking modes off one index
    qs = emb.filter("vec_id % 50 = 0")
    cells = S.ivf_probe_cells(qs, cents, nprobe=2)
    pruned = index.filter(F.col("cluster").isin(cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pruned_ok = any("PartitionFilters" in ln and " IN " in ln.upper()
                    for ln in plan.splitlines())
    exact = S.ivf_topk_from_index(pruned, qs, cents, k=5)
    adc = S.ivf_pq_topk_from_index(pruned, qs, cents, books, k=5)
    stage(stage="serve", probe_cells=cells, pruning_static=pruned_ok,
          exact_pairs=exact.count(), adc_pairs=adc.count())

    # the same lifecycle as ONE persisted store (round-10 form):
    # manifest-pointer commits, watermark-guarded O(batch) appends
    # (a redelivered batch id no-ops before any job), maintain() as
    # the single nightly verb (drift verdict -> retrain-and-swap when
    # tripped, else fold segments), serving reads statically pruned
    from dbms_spark.llm.ann_store import AnnIndexStore

    store = AnnIndexStore(spark, os.path.join(work, "store"))
    store.build(corpus, quantizers=(cents, books))
    store.append(batch, batch_id=1)
    store.append(batch, batch_id=1)            # redelivery: no-op
    nightly = store.maintain()
    stage(stage="store",
          watermark=store.last_batch_id(),
          segments=len(store._read_manifest()["segments"]),
          maintain_action=nightly["action"],
          store_pairs=store.search(qs, k=5).count())

    if own:
        spark.stop()
    return stages


if __name__ == "__main__":
    main(*sys.argv[1:3])
