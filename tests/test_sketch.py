"""Mergeable-summary sketches: the deterministic Bloom filter
membership contract (CMS/HLL are covered by parity gates q79/q212
and test_llm/test_skew_bucketing)."""

from pyspark.sql import functions as F
def test_bloom_no_false_negatives_and_merge(spark):
    """Membership contract: every built key probes maybe_present=True
    (false negatives impossible); a disjoint probe set is mostly False
    (FPR sanity at m=65536,k=4,n=500: well under 1%); and the filter
    of a union equals the bit_or merge of per-shard filters — the
    lossless rollup that lets per-day filters combine without touching
    raw keys (same shape as hll_merge)."""
    from dbms_spark.operators import sketch as SK

    keys = spark.range(500).select(F.concat(F.lit("k"), "id").alias("key"))
    other = spark.range(500, 5500).select(F.concat(F.lit("k"), "id").alias("key"),
                                          F.col("id").alias("doc_id"))
    bloom = SK.bloom_build(keys, "key")
    assert bloom.count() == 65536 // 32                 # stable shape

    members = keys.withColumn("doc_id", F.monotonically_increasing_id())
    got = SK.bloom_probe(members, "key", bloom, "doc_id")
    assert got.filter("NOT maybe_present").count() == 0  # no false negatives

    fp = SK.bloom_probe(other, "key", bloom, "doc_id") \
        .filter("maybe_present").count()
    assert fp < 50, f"false-positive rate implausibly high: {fp}/5000"

    a = keys.filter("key < 'k25'")
    b = keys.filter("key >= 'k25'")
    merged = SK.bloom_merge(SK.bloom_build(a, "key"), SK.bloom_build(b, "key"))
    whole = {r["word"]: r["bits"] for r in bloom.collect()}
    assert {r["word"]: r["bits"] for r in merged.collect()} == whole


def test_engine_membership_filter_roundtrip(spark, tmp_path):
    """Facade lifecycle: build -> persist -> reload -> probe; the
    persisted filter answers identically to the in-memory one."""
    from dbms_spark.engine import DbmsEngine

    eng = DbmsEngine(spark)
    corpus = spark.range(300).select(F.concat(F.lit("c"), "id").alias("key"))
    path = str(tmp_path / "bloom")
    bloom = eng.build_membership_filter(corpus, "key", path=path)
    batch = spark.range(250, 600).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("c"), "id").alias("key"))
    got = {r["doc_id"]: r["maybe_present"] for r in
           eng.probe_membership_filter(batch, "key", bloom, "doc_id").collect()}
    assert all(got[i] for i in range(250, 300))          # members always hit
    new = [i for i in range(300, 600) if not got[i]]
    assert len(new) > 280                                 # most new keys pruned
