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
    """Facade lifecycle: build (auto-sized from corpus NDV) -> persist
    (words + meta sidecar) -> reload -> probe; the reloaded filter
    answers identically to the in-memory one and carries its
    parameters (never guessed at probe time)."""
    from dbms_spark.engine import DbmsEngine

    eng = DbmsEngine(spark)
    corpus = spark.range(300).select(F.concat(F.lit("c"), "id").alias("key"))
    path = str(tmp_path / "bloom")
    bloom = eng.build_membership_filter(corpus, "key", path=path)
    assert bloom.m_bits >= 65536 and bloom.k >= 1        # derived, floored
    batch = spark.range(250, 600).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("c"), "id").alias("key"))
    got = {r["doc_id"]: r["maybe_present"] for r in
           eng.probe_membership_filter(batch, "key", bloom, "doc_id").collect()}
    assert all(got[i] for i in range(250, 300))          # members always hit
    new = [i for i in range(300, 600) if not got[i]]
    assert len(new) > 280                                 # most new keys pruned

    reloaded = eng.load_membership_filter(path)
    assert (reloaded.m_bits, reloaded.k) == (bloom.m_bits, bloom.k)
    got2 = {r["doc_id"]: r["maybe_present"] for r in
            eng.probe_membership_filter(batch, "key", reloaded, "doc_id")
            .collect()}
    assert got2 == got


def test_bloom_derived_size_not_saturated_at_1e6_keys(spark):
    """The round-5 weak item, pinned: at 10^6 corpus keys the DERIVED
    filter (bits_per_key=10 -> m=2^24, matched k) keeps the
    false-positive rate in the ~1% design band, where the old fixed
    64 Kbit default saturates (FPR -> 1) and the 'pruning' degenerates
    to the full exact join.  Probe set is disjoint from the corpus so
    every maybe_present=True is a false positive."""
    from dbms_spark.operators import sketch as SK

    n = 1_000_000
    m = SK.derive_bloom_size(n)
    k = SK.derive_bloom_k(m, n)
    assert m == 1 << 24 and 1 <= k <= 8

    corpus = spark.range(n).select(F.concat(F.lit("k"), "id").alias("key"))
    bloom = SK.bloom_build(corpus, "key", m, k)
    probe = spark.range(n, n + 20_000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("k"), "id").alias("key"))
    fp = (SK.bloom_probe(probe, "key", bloom, "doc_id", m, k)
          .filter("maybe_present").count())
    assert fp < 20_000 * 0.03, f"derived-size FPR out of band: {fp}/20000"


def test_bloom_probe_shape_validation_and_shuffle_path(spark):
    """(a) Probing a filter with mismatched m_bits raises (the meta
    contract, ADVICE round 5) instead of silently returning false
    negatives; (b) forcing the probe past the broadcast threshold
    (broadcast_max_words=0 -> shuffle join on word) returns verdicts
    identical to the broadcast path."""
    import pytest

    from dbms_spark.operators import sketch as SK

    keys = spark.range(200).select(F.concat(F.lit("k"), "id").alias("key"))
    bloom = SK.bloom_build(keys, "key")                  # default m=65536
    batch = spark.range(100, 400).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("k"), "id").alias("key"))

    with pytest.raises(ValueError, match="shape mismatch"):
        SK.bloom_probe(batch, "key", bloom, "doc_id",
                       m_bits=1 << 20, validate=True).collect()

    via_bcast = {r["doc_id"]: r["maybe_present"] for r in
                 SK.bloom_probe(batch, "key", bloom, "doc_id").collect()}
    via_shuffle = {r["doc_id"]: r["maybe_present"] for r in
                   SK.bloom_probe(batch, "key", bloom, "doc_id",
                                  broadcast_max_words=0).collect()}
    assert via_shuffle == via_bcast
    assert all(via_bcast[i] for i in range(100, 200))


def test_hll_ndv_by_accuracy_and_single_group_identity(spark):
    """Per-group HLL NDV: (a) estimates land within the raw-estimator
    error band of the exact per-group distinct counts (m=64 -> ~13%
    theoretical RSE; allow 3 sigma); (b) on a single-group frame the
    estimate equals hll_estimate's global answer — same math, grouped."""
    from dbms_spark.operators import sketch as SK

    df = (spark.range(60_000)
          .selectExpr("CAST(id % 3 AS STRING) AS g",
                      "CAST(id % (1000 * (id % 3 + 1)) AS STRING) || '-' "
                      "|| CAST(id % 3 AS STRING) AS key"))
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(F.countDistinct("key").alias("n")).collect()}
    est = {r["g"]: r["ndv_est"] for r in SK.hll_ndv_by(df, "g", "key").collect()}
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) <= 0.4 * n, f"group {g}: est {est[g]} vs exact {n}"

    one = df.filter("g = '1'")
    global_est = SK.hll_estimate(one, "key").first()["hll_est"]
    assert est["1"] == global_est


def test_kmv_build_merge_identity_and_null_keys(spark):
    """Bottom-k of a union == re-top-k of per-part bottom-k's (lossless
    rollup), and NULL keys never enter the sketch."""
    from dbms_spark.operators.sketch import kmv_build, kmv_merge

    df = spark.range(5000).selectExpr(
        "CASE WHEN id % 50 = 0 THEN NULL ELSE CAST(id % 700 AS STRING) END AS k")
    whole = [(r.hkey, r.key) for r in kmv_build(df, "k", k=64).collect()]
    h1 = kmv_build(df.filter("id % 2 = 0"), "k", k=64)
    h2 = kmv_build(df.filter("id % 2 = 1"), "k", k=64)
    merged = [(r.hkey, r.key) for r in kmv_merge(h1, h2, k=64).collect()]
    assert merged == whole
    assert len(whole) == 64
    assert all(k is not None for _, k in whole)


def test_kmv_ndv_error_band_and_exact_small_domain(spark):
    from dbms_spark.operators.sketch import kmv_build, kmv_ndv

    # small domain (< k): estimator returns the EXACT distinct count
    small = spark.range(1000).selectExpr("CAST(id % 37 AS STRING) AS k")
    est = kmv_ndv(kmv_build(small, "k", k=256), k=256).first().ndv_estimate
    assert est == 37

    # large domain: (k-1)/U(h_k) within the ~1/sqrt(k) relative band
    big = spark.range(200_000).selectExpr("CAST(id % 50000 AS STRING) AS k")
    est = kmv_ndv(kmv_build(big, "k", k=256), k=256).first().ndv_estimate
    assert abs(est - 50_000) / 50_000 < 0.20


def test_kmv_prefilter_identity(spark):
    """The NDV-derived hash-prefix pre-filter (the 10^9-NDV scale path:
    dedup shuffle bounded at ~oversample*k rows) returns the identical
    sketch, including when the NDV guess is off by 2x either way."""
    from dbms_spark.operators.sketch import kmv_build

    df = spark.range(30_000).selectExpr("CAST(id % 9000 AS STRING) AS k")
    base = [(r.hkey, r.key) for r in kmv_build(df, "k", k=128).collect()]
    for guess in (4_500, 9_000, 18_000):
        pf = [(r.hkey, r.key) for r in
              kmv_build(df, "k", k=128, expected_ndv=guess).collect()]
        assert pf == base, f"prefilter diverged at expected_ndv={guess}"


def test_histogram_merge_clamp_and_quantile_error(spark):
    """Merge of split halves == build on the whole; out-of-range
    values clamp to edge bins (total count preserved); quantile
    estimates land within one bin width of exact percentile()."""
    from dbms_spark.operators.sketch import hist_build, hist_merge, hist_quantiles

    df = spark.range(10_000).selectExpr("CAST(id % 1000 AS DOUBLE) AS v")
    whole = sorted((r.bin, r.cnt) for r in hist_build(df, "v", 0.0, 1000.0, 50).collect())
    h1 = hist_build(df.filter("id % 2 = 0"), "v", 0.0, 1000.0, 50)
    h2 = hist_build(df.filter("id % 2 = 1"), "v", 0.0, 1000.0, 50)
    assert sorted((r.bin, r.cnt) for r in hist_merge(h1, h2).collect()) == whole
    assert sum(c for _, c in whole) == 10_000

    # clamp: declared range covers only [200, 800) -> totals preserved,
    # edge bins absorb the overflow
    clamped = hist_build(df, "v", 200.0, 800.0, 10).collect()
    assert sum(r.cnt for r in clamped) == 10_000
    by_bin = {r.bin: r.cnt for r in clamped}
    assert by_bin[0] > by_bin[1] and by_bin[9] > by_bin[8]

    # accuracy: within one bin width (1000/50 = 20) of the exact quantile
    est = {r.p: r.value for r in
           hist_quantiles(hist_build(df, "v", 0.0, 1000.0, 50),
                          [0.25, 0.5, 0.9], 0.0, 1000.0, 50).collect()}
    exact = df.selectExpr(
        "percentile(v, array(0.25D, 0.5D, 0.9D)) AS q").first().q
    for p, e in zip((0.25, 0.5, 0.9), exact):
        assert abs(est[p] - e) <= 20.0, (p, est[p], e)


def test_hist_by_weighted_and_grouped_quantiles(spark):
    """Grouped histogram: per-group slices equal per-group hist_build
    counts on observed bins; integer weights behave exactly like row
    replication; grouped quantiles land within one bin width of the
    per-group exact percentile."""
    from dbms_spark.operators.sketch import (hist_build, hist_by,
                                             hist_quantiles_by)

    df = spark.range(6000).selectExpr(
        "CAST(id % 3 AS STRING) AS g",
        "CAST((id * 37) % 1000 AS DOUBLE) AS v",
        "CAST(1 + id % 4 AS BIGINT) AS wt")
    grouped = {(r.g, r.bin): r.cnt
               for r in hist_by(df, "g", "v", 0.0, 1000.0, 40).collect()}
    for g in ("0", "1", "2"):
        solo = {r.bin: r.cnt
                for r in hist_build(df.filter(f"g = '{g}'"),
                                    "v", 0.0, 1000.0, 40).collect()}
        assert {b: c for (gg, b), c in grouped.items() if gg == g} == \
               {b: c for b, c in solo.items() if c > 0}

    # weighted == replicated
    from pyspark.sql import functions as F
    w = hist_by(df, "g", "v", 0.0, 1000.0, 40, weight_col="wt")
    rep = hist_by(df.withColumn("i", F.expr("explode(sequence(1, CAST(wt AS INT)))")),
                  "g", "v", 0.0, 1000.0, 40)
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, rep.collect()))

    # per-group quantile accuracy: one bin width = 25
    h = hist_by(df, "g", "v", 0.0, 1000.0, 40)
    est = {(r.g, r.p): r.value
           for r in hist_quantiles_by(h, "g", [0.5], 0.0, 1000.0, 40).collect()}
    for r in df.groupBy("g").agg(F.expr("percentile(v, 0.5D)").alias("m")).collect():
        assert abs(est[(r.g, 0.5)] - r.m) <= 25.0


def test_kmv_by_matches_per_group_builds_and_merges(spark):
    """Per-group slices of kmv_by equal kmv_build run on each group
    alone, and re-running kmv_by over unioned sketch rows is a
    lossless per-group merge."""
    from dbms_spark.operators.sketch import kmv_build, kmv_by

    df = spark.range(4000).selectExpr(
        "CAST(id % 4 AS STRING) AS g", "CAST(id % 500 AS STRING) AS k")
    grouped = kmv_by(df, "g", "k", k=32)
    rows = sorted(map(tuple, grouped.collect()))
    per_group = []
    for g in ("0", "1", "2", "3"):
        per_group += [(g, r.hkey, r.key) for r in
                      kmv_build(df.filter(f"g = '{g}'"), "k", k=32).collect()]
    assert rows == sorted(per_group)

    h1 = kmv_by(df.filter("id % 2 = 0"), "g", "k", k=32)
    h2 = kmv_by(df.filter("id % 2 = 1"), "g", "k", k=32)
    merged = kmv_by(h1.unionByName(h2), "g", "key", k=32)
    assert sorted(map(tuple, merged.collect())) == rows


def test_hist_degenerate_range_raises(spark):
    """A degenerate range must raise, not silently drop every row to
    NULL bins (division by a zero width)."""
    import pytest

    from dbms_spark.operators.sketch import hist_build

    df = spark.range(10).selectExpr("CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError):
        hist_build(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        hist_build(df, "v", 0.0, 10.0, 0)


def test_kmv_overlap_matrix_estimates(spark):
    """Overlap matrix: disjoint groups -> 0; identical key sets ->
    1.0; half-shared sets land near 0.5; and the estimate is a pure
    function of the sketches (rebuilding from a reshuffled frame is
    identical)."""
    from dbms_spark.operators.sketch import kmv_by, kmv_overlap_matrix

    df = spark.range(3000).selectExpr(
        "CASE WHEN id < 1000 THEN 'a' WHEN id < 2000 THEN 'b' ELSE 'c' END AS g",
        # a: keys 0..499; b: keys 250..749 (half-shared with a);
        # c: keys 10000+ (disjoint from both)
        "CAST(CASE WHEN id < 1000 THEN id % 500 "
        "     WHEN id < 2000 THEN 250 + id % 500 "
        "     ELSE 10000 + id END AS STRING) AS k")
    sk = kmv_by(df, "g", "k", k=64)
    m = {(r.g_a, r.g_b): r for r in kmv_overlap_matrix(sk, "g", k=64).collect()}
    assert set(m) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert m[("a", "c")].n_common == 0 and m[("a", "c")].jaccard_ppm == 0
    assert m[("b", "c")].n_common == 0
    # true Jaccard(a, b) = 250 / 750 = 1/3; k=64 estimate is within a
    # wide but non-vacuous band
    jab = m[("a", "b")].jaccard_ppm / 1e6
    assert 0.15 < jab < 0.55
    assert m[("a", "b")].k_used == 64

    ident = kmv_by(df.filter("g = 'a'").unionByName(
        df.filter("g = 'a'").selectExpr("'z' AS g", "k")), "g", "k", k=64)
    mi = kmv_overlap_matrix(ident, "g", k=64).collect()
    assert len(mi) == 1 and mi[0].jaccard_ppm == 1000000

    resh = kmv_by(df.repartition(13), "g", "k", k=64)
    m2 = {(r.g_a, r.g_b): tuple(r)
          for r in kmv_overlap_matrix(resh, "g", k=64).collect()}
    assert m2 == {(r.g_a, r.g_b): tuple(r)
                  for r in kmv_overlap_matrix(sk, "g", k=64).collect()}


def test_kmv_overlap_matrix_k_mismatch_raises(spark):
    """k larger than the sketch's build k silently deflates n_common
    (hashes past a truncated side's coverage read as absent) — both
    the built_k assertion and the runtime widest-sketch check raise
    instead."""
    import pytest

    from dbms_spark.operators.sketch import kmv_by, kmv_overlap_matrix

    df = spark.range(400).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "CAST(id AS STRING) AS k")
    sk = kmv_by(df, "g", "k", k=8)
    with pytest.raises(ValueError, match="build"):
        kmv_overlap_matrix(sk, "g", k=64, built_k=8)
    with pytest.raises(ValueError, match="widest"):
        kmv_overlap_matrix(sk, "g", k=64)          # runtime check
    # matched parameters work both ways
    assert kmv_overlap_matrix(sk, "g", k=8, built_k=8).count() == 1
    assert kmv_overlap_matrix(sk, "g", k=8).count() == 1


def test_kmv_overlap_pairs_identity_and_sparsity(spark):
    """Sparse form contract: every dense row with n_common > 0 appears
    with identical values; every sparse row equals its dense
    counterpart; pairs sharing no hash are ABSENT (dense keeps them as
    zero rows); a fully disjoint corpus yields an empty relation."""
    from dbms_spark.operators.sketch import (kmv_by, kmv_overlap_matrix,
                                             kmv_overlap_pairs)

    rows = (
        [("a", f"shared-{i}") for i in range(40)]
        + [("a", f"a-only-{i}") for i in range(60)]
        + [("b", f"shared-{i}") for i in range(40)]
        + [("b", f"b-only-{i}") for i in range(60)]
        + [("c", f"c-only-{i}") for i in range(100)]   # disjoint from all
    )
    df = spark.createDataFrame(rows, "g string, key string")
    sk = kmv_by(df, "g", "key", k=32)
    dense = {(r.g_a, r.g_b): (r.k_used, r.n_common, r.jaccard_ppm)
             for r in kmv_overlap_matrix(sk, "g", k=32, built_k=32).collect()}
    sparse = {(r.g_a, r.g_b): (r.k_used, r.n_common, r.jaccard_ppm)
              for r in kmv_overlap_pairs(sk, "g", k=32, built_k=32).collect()}
    assert ("a", "b") in sparse and sparse[("a", "b")][1] > 0
    for pair, vals in sparse.items():
        assert dense[pair] == vals
    for pair, vals in dense.items():
        if vals[1] > 0:
            assert sparse[pair] == vals
    # c shares nothing: its pairs exist ONLY in the dense form
    assert ("a", "c") in dense and ("a", "c") not in sparse
    assert ("b", "c") in dense and ("b", "c") not in sparse
    # fully disjoint corpus -> empty sparse relation
    dis = spark.createDataFrame(
        [(g, f"{g}-{i}") for g in "xyz" for i in range(50)],
        "g string, key string")
    assert kmv_overlap_pairs(kmv_by(dis, "g", "key", k=16),
                             "g", k=16, built_k=16).count() == 0


def test_kmv_overlap_pairs_k_mismatch_raises(spark):
    import pytest

    from dbms_spark.operators.sketch import kmv_by, kmv_overlap_pairs

    df = spark.createDataFrame(
        [("a", f"s-{i}") for i in range(50)] +
        [("b", f"s-{i}") for i in range(50)], "g string, key string")
    sk = kmv_by(df, "g", "key", k=8)
    with pytest.raises(ValueError, match="exceeds"):
        kmv_overlap_pairs(sk, "g", k=64, built_k=8)
    with pytest.raises(ValueError, match="widest"):
        kmv_overlap_pairs(sk, "g", k=64)
