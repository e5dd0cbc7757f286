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
