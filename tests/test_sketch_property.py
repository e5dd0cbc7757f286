"""Property-based invariants for the fixed-size sketch operators
(hypothesis): the one-sided guarantees must hold for ANY input — they
are what the scale paths (skew salting, bloom decontamination) rely on
when the exact twin is too big to compute.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

key_lists = st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=200)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=key_lists, width=st.sampled_from([4, 16, 64]))
def test_cms_never_undercounts_any_key(spark, ks, width):
    """For EVERY key (not just heavy ones): min over the d cells that
    key hashes to is >= its exact count — the count-min guarantee.
    Checked at aggressively small widths where collisions are dense."""
    from dbms_spark.operators.sketch import _cell_expr, cms_cells

    df = spark.createDataFrame([(k,) for k in ks], "k bigint")
    cells = {(r["j"], r["cell"]): r["cnt"]
             for r in cms_cells(df, "k", depth=3, width=width).collect()}
    # total mass per row j equals the input size (sketch loses nothing)
    for j in range(3):
        assert sum(v for (jj, _), v in cells.items() if jj == j) == len(ks)
    probes = df.distinct().select(
        "k", *[_cell_expr(F.col("k"), j, width) for j in range(3)]).collect()
    exact = {}
    for k in ks:
        exact[k] = exact.get(k, 0) + 1
    for r in probes:
        est = min(cells[(j, r[f"c{j}"])] for j in range(3))
        assert est >= exact[r["k"]], f"undercount for key {r['k']}"


doc_texts = st.lists(
    st.text(alphabet="abcdef ", min_size=1, max_size=60),
    min_size=1, max_size=30,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=doc_texts, m=st.sampled_from([32, 256]))
def test_bloom_flags_superset_of_exact(spark, texts, m):
    """For ANY corpus/benchmark split: every doc with exact hits is
    bloom-flagged, and per doc n_bloom_hits >= n_exact_hits — no false
    negatives at any filter width (checked at tiny m where the filter
    saturates and false positives are the norm)."""
    from dbms_spark.llm.text import bloom_contamination_check, contamination_check

    rows = [(i, t) for i, t in enumerate(texts)]
    train = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = spark.createDataFrame([(texts[0],)], "text string")
    bloom = {r["doc_id"]: r for r in
             bloom_contamination_check(train, bench, n=2, m=m).collect()}
    exact = {r["doc_id"]: r["n_hits"] for r in
             contamination_check(train, bench, n=2).collect()}
    for d, n_hits in exact.items():
        assert d in bloom, f"doc {d} with exact hits not bloom-flagged"
        assert bloom[d]["n_bloom_hits"] >= bloom[d]["n_exact_hits"] == n_hits


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.sampled_from(
    ["line one\nshared", "shared\nline two", "solo\ncontent", "shared"]),
    min_size=2, max_size=20))
def test_duplicate_line_ratio_bounds(spark, texts):
    """dup_line_ratio is always in [0, 1], n_dup_lines <= n_lines, and
    a line appearing in two docs is counted duplicated in both."""
    from dbms_spark.llm.dedup import duplicate_line_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    out = duplicate_line_stats(df).collect()
    assert len(out) == len(texts)
    for r in out:
        assert 0 <= r["n_dup_lines"] <= r["n_lines"]
        assert 0.0 <= r["dup_line_ratio"] <= 1.0
    if sum(t.count("shared") for t in texts) >= 2:
        # 'shared' occurs in >=2 docs -> every doc containing it has dups
        for i, t in enumerate(texts):
            if "shared" in t:
                row = next(r for r in out if r["doc_id"] == i)
                assert row["n_dup_lines"] >= 1


@given(n=st.integers(min_value=0, max_value=10**13),
       bpk=st.integers(min_value=1, max_value=24))
@settings(max_examples=200, deadline=None)
def test_derive_bloom_size_and_k_invariants(n, bpk):
    """Sizing math holds at any corpus scale: m is a power of two, at
    least the floor, at least bits_per_key per key; k stays clamped to
    [1, 8] and near the ln2*m/n optimum inside the clamp."""
    from dbms_spark.operators.sketch import derive_bloom_k, derive_bloom_size

    m = derive_bloom_size(n, bpk)
    assert m >= 65536 and (m & (m - 1)) == 0        # floored power of two
    assert m >= n * bpk
    if n:
        assert m // 2 < max(n * bpk, 65536)          # no overshoot past 2x
    k = derive_bloom_k(m, n)
    assert 1 <= k <= 8
    if n and 1 <= round(0.6931 * m / n) <= 8:
        assert k == round(0.6931 * m / n)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=key_lists, k=st.sampled_from([4, 16, 64]))
def test_kmv_is_bottom_k_of_the_md5_set(spark, ks, k):
    """For ANY key multiset: the sketch is EXACTLY the k smallest
    distinct md5 hex strings (Python model equivalence) — the property
    every downstream use (uniform sample, NDV, lossless merge) rests
    on."""
    import hashlib

    from dbms_spark.operators.sketch import kmv_build

    df = spark.createDataFrame([(x,) for x in ks], "k bigint")
    got = [(r.hkey, r.key) for r in kmv_build(df, "k", k=k).collect()]
    model = sorted({(hashlib.md5(str(x).encode()).hexdigest(), str(x))
                    for x in ks})[:k]
    assert got == model


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vs=st.lists(st.floats(min_value=-50.0, max_value=150.0,
                             allow_nan=False), min_size=1, max_size=150),
       nbins=st.sampled_from([1, 7, 32]))
def test_hist_matches_python_binning_and_preserves_mass(spark, vs, nbins):
    """For ANY value list (including out-of-range values): the sketch
    equals Python clamp-binning exactly and total count equals the
    input size — no row is ever lost to range edges."""
    from dbms_spark.operators.sketch import hist_build

    lo, hi = 0.0, 100.0
    df = spark.createDataFrame([(v,) for v in vs], "v double")
    got = {r.bin: r.cnt for r in hist_build(df, "v", lo, hi, nbins).collect()}
    model = {b: 0 for b in range(nbins)}
    import math
    for v in vs:
        b = min(nbins - 1, max(0, int(math.floor((v - lo) * nbins / (hi - lo)))))
        model[b] += 1
    assert got == model
    assert sum(got.values()) == len(vs)
