#!/usr/bin/env python3
"""Incremental corpus intake: the at-scale shape where a nightly batch
joins a 100 TB corpus WITHOUT re-reading the corpus —

    day 0: corpus -> persisted Bloom filter of content keys
                  -> persisted winnowed fingerprint set
    day N: batch  -> Bloom probe        (exact-dup candidates only;
                                         False = definitely new)
           batch  -> exact verify       (only the maybe_present rows
                                         join the corpus keys)
           batch  -> winnowed cross-check (near/passage dups vs the
                                         corpus's fingerprint set at
                                         2/(w+1) shuffle density)
           survivors append; summaries merge (bit_or / fingerprint
           union) so day N+1 probes the UPDATED corpus

Every corpus-sized artifact here is a SUMMARY (a Bloom word relation
SIZED FROM THE CORPUS NDV at ~10 bits/key, fingerprint set keyed on
64-bit hashes) — the raw corpus is read once, on day 0.  Run:

    python examples/incremental_intake.py [sf_dir] [work_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.engine import DbmsEngine  # noqa: E402
from dbms_spark.llm.dedup import (containment_pairs_between,  # noqa: E402
                                  hamming_pairs_between, simhash,
                                  winnowed_duplicates_between,
                                  winnowed_fingerprints)
from dbms_spark.operators.sketch import bloom_build, bloom_merge  # noqa: E402
from dbms_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str | None = None, work: str | None = None,
         spark=None) -> list[dict]:
    """Runs the intake flow; returns the stage dicts it prints.  Pass
    an existing ``spark`` (e.g. from the test suite) to reuse a
    session — the function only stops sessions it created."""
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    work = work or tempfile.mkdtemp(prefix="intake_")
    owned = spark is None
    if owned:
        spark = get_spark("incremental_intake")
    stages: list[dict] = []

    def emit(d: dict) -> None:
        stages.append(d)
        print(json.dumps(d))

    eng = DbmsEngine(spark)

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 <> 7").select("doc_id", "text")
    batch = docs.filter("doc_id % 10 = 7").select("doc_id", "text")

    # ---- day 0: one corpus read -> two persisted summaries ----------
    # the filter SIZE derives from the corpus NDV (HLL pass) at
    # ~10 bits/key, and the parameters persist in a meta sidecar —
    # at 100 TB this is the difference between ~1% FPR and a
    # saturated fixed-size filter whose "pruning" prunes nothing
    keyed = corpus.select("doc_id", F.md5("text").alias("key"))
    bloom_path = os.path.join(work, "bloom")
    bloom = eng.build_membership_filter(keyed, "key", path=bloom_path)
    # (doc_id, fp) ledger first; the distinct fp SET derives from it
    # (one winnowing pass feeds both consumers)
    fpid_path = os.path.join(work, "fingerprint_ids")
    winnowed_fingerprints(corpus).write.mode("overwrite").parquet(fpid_path)
    fp_path = os.path.join(work, "fingerprints")
    spark.read.parquet(fpid_path).select("fp").distinct() \
        .write.mode("overwrite").parquet(fp_path)
    # 3-integer SimHash signatures: the near-dup ledger the nightly
    # Hamming cross-check equi-joins against (round-7 between form)
    sig_path = os.path.join(work, "simhash_sigs")
    simhash(corpus).write.mode("overwrite").parquet(sig_path)
    emit({"stage": "day0_summaries",
          "bloom_words": bloom.words.count(),
          "bloom_m_bits": bloom.m_bits, "bloom_k": bloom.k,
          "corpus_fps": spark.read.parquet(fp_path).count(),
          "corpus_sigs": spark.read.parquet(sig_path).count()})

    # ---- day N: probe, verify, cross-check — corpus never re-read ---
    bkeys = batch.select("doc_id", F.md5("text").alias("key"))
    probed = eng.probe_membership_filter(bkeys, "key", bloom, "doc_id")
    maybe = probed.filter("maybe_present")
    # exact verify ONLY the maybe side (the Bloom contract: the False
    # side is definitely new — no join for it)
    exact_dups = (bkeys.join(maybe.select("doc_id"), "doc_id", "left_semi")
                  .join(keyed.select("key").distinct(), "key", "left_semi"))
    n_exact = exact_dups.count()
    emit({"stage": "bloom_probe",
          "batch": batch.count(),
          "maybe_present": maybe.count(),
          "exact_dups": n_exact})

    # near/passage dups vs the PERSISTED fingerprint set — the raw
    # corpus is not touched (corpus_df=None)
    stats = winnowed_duplicates_between(
        batch, None, corpus_fps=spark.read.parquet(fp_path))
    flagged = stats.filter("dup_fp_ppm > 500000")  # >50% shared passages
    emit({"stage": "winnowed_crosscheck",
          "flagged_passage_dups": flagged.count()})

    # near-dup + containment cross-checks against the persisted
    # ledgers (round-7 between forms): the Hamming check joins batch
    # bands against the 3-integer signature relation — O(batch) work,
    # no corpus re-mine; the containment check proposes from the
    # persisted (doc_id, fp) ledger and re-shingles ONLY candidate
    # docs (the semi-joined verify)
    near = hamming_pairs_between(simhash(batch),
                                 spark.read.parquet(sig_path))
    contained = containment_pairs_between(
        batch, corpus, min_containment=0.9,
        corpus_fps=spark.read.parquet(fpid_path))
    emit({"stage": "signature_crosscheck",
          "hamming_near_dups": near.select("new_id").distinct().count(),
          "containment_hits": contained.select("new_id").distinct().count()})

    # ---- append survivors + roll the summaries forward --------------
    drop = (exact_dups.select("doc_id")
            .unionByName(flagged.select("doc_id"))
            .unionByName(near.select(F.col("new_id").alias("doc_id")))
            .unionByName(contained.select(F.col("new_id").alias("doc_id")))
            .distinct())
    survivors = batch.join(drop, "doc_id", "left_anti")
    # the day-N delta filter is built at the CORPUS's (m, k) — read
    # from the loaded filter, not re-derived from the small batch —
    # so the bit_or merge is shape-exact
    new_bloom = bloom_merge(
        bloom.words,
        bloom_build(survivors.select(F.md5("text").alias("key")), "key",
                    bloom.m_bits, bloom.k))
    new_bloom.write.mode("overwrite").parquet(bloom_path + "_next")
    (spark.read.parquet(fp_path)
     .unionByName(winnowed_fingerprints(survivors).select("fp"))
     .distinct().write.mode("overwrite").parquet(fp_path + "_next"))
    # the signature ledger rolls forward by plain append — signatures
    # are per-doc rows, so union IS the merged ledger
    (spark.read.parquet(sig_path)
     .unionByName(simhash(survivors))
     .write.mode("overwrite").parquet(sig_path + "_next"))
    emit({"stage": "rollforward",
          "survivors_appended": survivors.count(),
          "next_bloom_words": spark.read.parquet(bloom_path + "_next").count(),
          "next_sigs": spark.read.parquet(sig_path + "_next").count()})
    if owned:
        spark.stop()
    return stages


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         sys.argv[2] if len(sys.argv) > 2 else None)
