"""Unit tests for the assessment aggregation pack (operators/assess.py);
the bulk of the pack is exercised end-to-end by the differential gates
(q41-q47, q60-q63, q181-q184 in test_queries_parity)."""


def test_assessment_pack2(spark):
    """Generic name-length operator + index-count / code-object /
    partition-type rollups (assess_migrate.go:415-1036)."""
    from dbms_spark.operators.assess import (
        code_object_summary, index_counts_over_limit,
        object_name_length_over_limit, partition_type_counts)

    names = spark.createDataFrame(
        [("short",), ("a_very_long_index_name",)], "object_name string")
    over = object_name_length_over_limit(names, "object_name", "INDEX", 10).collect()
    assert [(r["object_type"], r["object_name"], r["name_length"]) for r in over] == \
        [("INDEX", "a_very_long_index_name", 22)]

    idx = spark.createDataFrame(
        [("t1", "i1"), ("t1", "i2"), ("t1", "i3"), ("t2", "i4")],
        "table_name string, index_name string")
    oc = index_counts_over_limit(idx, limit=2).collect()
    assert [(r["table_name"], r["index_counts"]) for r in oc] == [("t1", 3)]

    code = spark.createDataFrame(
        [("p", "PROCEDURE", 10), ("q", "PROCEDURE", 30), ("f", "FUNCTION", 5)],
        "object_name string, object_type string, lines bigint")
    summ = {r["object_type"]: r for r in code_object_summary(code).collect()}
    assert summ["PROCEDURE"]["n_objects"] == 2
    assert summ["PROCEDURE"]["total_lines"] == 40
    assert summ["PROCEDURE"]["max_lines"] == 30

    parts = spark.createDataFrame(
        [("a", "RANGE", "p1", "x"), ("a", "RANGE", "p2", "y"), ("b", "HASH", "h0", "0")],
        "table_name string, partition_type string, partition_name string, high_value string")
    pt = {r["partition_type"]: r["n_tables"] for r in partition_type_counts(parts).collect()}
    assert pt == {"RANGE": 1, "HASH": 1}   # tables, not partitions


def test_index_length_and_table_types(spark):
    from dbms_spark.operators.assess import (
        index_length_over_limit, table_type_counts)

    idx = spark.createDataFrame(
        [("t", "ix_wide", "a,b"), ("t", "ix_narrow", "c")],
        "table_name string, index_name string, columns string")
    cat = spark.createDataFrame(
        [("t", "a", "VARCHAR(80)"), ("t", "b", "VARCHAR"), ("t", "c", "BIGINT"),
         ("t", "d", "SOMETYPE"), ("t", "e", "DECIMAL(15,2)")],
        "table_name string, column_name string, data_type string")
    over = index_length_over_limit(idx, cat, limit=1500).collect()
    assert [(r["index_name"], r["index_bytes"]) for r in over] == [("ix_wide", 2048)]
    # parameterized spellings join on the BASE type: DECIMAL(15,2) -> 16
    idx_dec = spark.createDataFrame(
        [("t", "ix_dec", "e")], "table_name string, index_name string, columns string")
    assert index_length_over_limit(idx_dec, cat, limit=1).collect()[0]["index_bytes"] == 16
    # unknown datatype falls back to 8 bytes, never drops the index
    idx2 = spark.createDataFrame(
        [("t", "ix_u", "d")], "table_name string, index_name string, columns string")
    assert index_length_over_limit(idx2, cat, limit=1).collect()[0]["index_bytes"] == 8

    tt = spark.createDataFrame(
        [("a", "HEAP"), ("b", "HEAP"), ("c", "EXTERNAL")],
        "table_name string, table_type string")
    counts = {r["table_type"]: r["counts"] for r in table_type_counts(tt).collect()}
    assert counts == {"HEAP": 2, "EXTERNAL": 1}


def test_approx_numeric_profile_accuracy(spark, sf_dir):
    """Every column's quantile estimate lands within one bin width of
    the exact percentile, from ONE table pass."""
    from dbms_spark.operators.assess import approx_numeric_profile
    from dbms_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ranges = {"l_quantity": (0.0, 60.0), "l_extendedprice": (0.0, 120_000.0)}
    est = {(r.col_name, r.p): r.value
           for r in approx_numeric_profile(li, ranges, nbins=40).collect()}
    for c, (lo, hi) in ranges.items():
        width = (hi - lo) / 40
        exact = li.selectExpr(
            f"percentile({c}, array(0.25D, 0.5D, 0.95D)) AS q").first().q
        for p, e in zip((0.25, 0.5, 0.95), exact):
            assert abs(est[(c, p)] - float(e)) <= width, (c, p, est[(c, p)], e)


def test_approx_numeric_profile_derived_ranges(spark, sf_dir):
    """Column-list form derives (lo, hi) from one min/max pass; the
    true max must not clamp away (p95 of a constant-free column sits
    strictly inside the derived range), and constant / all-NULL
    columns must not divide by zero."""
    from dbms_spark.operators.assess import approx_numeric_profile
    from dbms_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    est = {(r.col_name, r.p): r.value
           for r in approx_numeric_profile(
               li, ["l_quantity", "l_extendedprice"], nbins=40).collect()}
    exact = li.selectExpr("percentile(l_quantity, 0.5D) m").first().m
    assert abs(est[("l_quantity", 0.5)] - float(exact)) <= 60.0 / 40 * 2

    edge = spark.range(100).selectExpr(
        "CAST(7 AS DOUBLE) AS const_col", "CAST(NULL AS DOUBLE) AS null_col")
    prof = approx_numeric_profile(edge, ["const_col", "null_col"], nbins=8)
    vals = {(r.col_name, r.p): r.value for r in prof.collect()}
    assert abs(vals[("const_col", 0.5)] - 7.0) <= 1.0 / 8 * 2
    assert not any(c == "null_col" for c, _ in vals)  # nothing to profile


def test_categorical_concentration_hand_values(spark):
    """Hand-computed Simpson + modal share; NULLs are not categories;
    a constant column scores 1.0 on both measures."""
    from dbms_spark.operators.assess import categorical_concentration

    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("b", None),
            ("b", "x"), ("c", "x")]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.col_name: r for r in
           categorical_concentration(df, ["g", "v"]).collect()}
    g = out["g"]   # counts a=3, b=2, c=1 over n=6
    assert (g.n_rows, g.ndv) == (6, 3)
    assert g.top_share_ppm == 500000                      # 3/6
    assert g.simpson_ppm == int((9 + 4 + 1) * 1e6 / 36)   # 388888
    v = out["v"]   # NULL dropped: x=4, y=1 over n=5
    assert (v.n_rows, v.ndv) == (5, 2)
    assert v.top_share_ppm == 800000
    assert v.simpson_ppm == int((16 + 1) * 1e6 / 25)      # 680000

    const = spark.createDataFrame([("k",)] * 4, "c string")
    r = categorical_concentration(const, ["c"]).collect()[0]
    assert r.top_share_ppm == 1000000 and r.simpson_ppm == 1000000


def test_mad_outlier_profile_hand_values(spark):
    """Hand-computed median/MAD/fence on a crafted column; a
    majority-constant column (MAD 0) fences every off-median value."""
    from dbms_spark.operators.assess import mad_outlier_profile

    # v: 1..9 plus one spike 1000 -> median 5.5, adevs
    # {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} -> MAD 2.5,
    # fence 7.5: outliers are 1000 only? |1-5.5|=4.5 < 7.5 ... just 1000
    rows = [(float(x),) for x in range(1, 10)] + [(1000.0,)]
    df = spark.createDataFrame(rows, "v double")
    r = mad_outlier_profile(df, ["v"], k=3.0).collect()[0]
    assert (r.median_v, r.mad, r.n_outliers) == (5.5, 2.5, 1)
    assert r.outlier_ppm == 100000

    const = spark.createDataFrame(
        [(1.0,)] * 9 + [(2.0,)], "c double")
    rc = mad_outlier_profile(const, ["c"]).collect()[0]
    assert (rc.median_v, rc.mad, rc.n_outliers) == (1.0, 0.0, 1)


def test_mad_outlier_profile_grouped(spark):
    """Grouped fences are group-local; the shuffle-join path is
    verdict-identical to the broadcast path."""
    from dbms_spark.operators.assess import mad_outlier_profile

    rows = ([("a", float(x)) for x in range(1, 10)] + [("a", 1000.0)]
            + [("b", float(x)) for x in range(1, 11)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in
           mad_outlier_profile(df, ["v"], group_col="g").collect()}
    assert (out["a"].median_v, out["a"].mad, out["a"].n_outliers) == (5.5, 2.5, 1)
    assert out["b"].n_outliers == 0 and out["b"].median_v == 5.5

    shuffled = {r.g: tuple(r) for r in
                mad_outlier_profile(df, ["v"], group_col="g",
                                    broadcast_medians=False).collect()}
    assert shuffled == {r.g: tuple(r) for r in
                        mad_outlier_profile(df, ["v"], group_col="g").collect()}


def test_categorical_concentration_grouped(spark):
    """Grouped profile slices equal per-group runs of the ungrouped
    profile."""
    from dbms_spark.operators.assess import categorical_concentration

    rows = [("s1", "x"), ("s1", "x"), ("s1", "y"),
            ("s2", "x"), ("s2", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {(r.g, r.col_name): (r.n_rows, r.ndv, r.top_share_ppm, r.simpson_ppm)
           for r in categorical_concentration(df, ["v"], group_col="g").collect()}
    for gname in ("s1", "s2"):
        solo = categorical_concentration(
            df.filter(f"g = '{gname}'"), ["v"]).collect()[0]
        assert out[(gname, "v")] == (solo.n_rows, solo.ndv,
                                     solo.top_share_ppm, solo.simpson_ppm)


def _py_mad_sketch(vals, lo, hi, nbins, k):
    """Independent Python model of mad_outlier_profile_sketch for one
    (col, group): hist -> interpolated median -> adev hist -> mad ->
    lower-edge fence count.  Mirrors the algorithm, not the code."""
    width = (hi - lo) / nbins

    def hist(xs, origin):
        h = {}
        for x in xs:
            b = min(nbins - 1, max(0, int((x - origin) // width)))
            h[b] = h.get(b, 0) + 1
        return h

    def med(h, origin):
        total = sum(h.values())
        cum = 0
        for b in sorted(h):
            cum += h[b]
            if cum >= 0.5 * total:
                return origin + (b + (0.5 * total - (cum - h[b])) / h[b]) * width
        raise AssertionError

    m = med(hist(vals, lo), lo)
    adevs = [abs(v - m) for v in vals]
    h2 = hist(adevs, 0.0)
    mad = med(h2, 0.0)
    n_out = sum(c for b, c in h2.items() if b * width > k * mad)
    return m, mad, n_out


def test_mad_outlier_profile_sketch_model_and_bounds(spark):
    """The sketch profile equals an independent Python model of the
    same algorithm field-for-field (engine-symmetric-bug guard), its
    median/MAD sit within the documented error bounds of the exact
    profile (<= 1 and <= 2 bin widths), and far-from-fence spikes are
    always flagged."""
    from dbms_spark.operators.assess import (mad_outlier_profile,
                                             mad_outlier_profile_sketch)

    nbins, lo, hi, k = 512, 0.0, 512.0, 3.0
    width = (hi - lo) / nbins
    rows = ([("a", 100.0 + (i % 7)) for i in range(200)]
            + [("a", 500.0)] * 5
            + [("b", 50.0 + (i % 11)) for i in range(150)])
    df = spark.createDataFrame(rows, "g string, v double")
    sk = {r.g: r for r in mad_outlier_profile_sketch(
        df, {"v": (lo, hi)}, k=k, nbins=nbins, group_col="g").collect()}
    ex = {r.g: r for r in mad_outlier_profile(
        df, ["v"], k=k, group_col="g").collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        m, mad, n_out = _py_mad_sketch(vals, lo, hi, nbins, k)
        assert abs(sk[g].median_v - m) < 1e-9          # model identity
        assert abs(sk[g].mad - mad) < 1e-9
        assert sk[g].n_outliers == n_out
        assert abs(sk[g].median_v - ex[g].median_v) <= width        # <= 1w
        assert abs(sk[g].mad - ex[g].mad) <= 2 * width + 1e-9      # <= 2w
    # the x5 spikes sit ~400 from the median — flagged by ANY fence
    # within the error band; the clean group fences nothing
    assert sk["a"].n_outliers >= 5
    assert sk["b"].n_outliers == 0 == ex["b"].n_outliers


def test_mad_outlier_profile_sketch_derived_ranges(spark):
    """Column-list form derives ranges from one min/max pass; the
    ungrouped form returns one row per column."""
    from dbms_spark.operators.assess import mad_outlier_profile_sketch

    df = spark.createDataFrame(
        [(float(x), float(x * 2)) for x in range(1, 101)],
        "u double, w double")
    out = {r.col_name: r for r in
           mad_outlier_profile_sketch(df, ["u", "w"], nbins=256).collect()}
    assert set(out) == {"u", "w"}
    # medians land within a bin width of the true 50.5 / 101.0
    assert abs(out["u"].median_v - 50.5) <= 100.0 * 1.001 / 256 + 1e-9
    assert abs(out["w"].median_v - 101.0) <= 200.0 * 1.001 / 256 + 1e-9


def test_corr_screen_planted_correlations(spark):
    """y = 2x exactly -> signed r2 ~ +1e6; z = -3x -> ~ -1e6; an
    alternating independent column -> ~0; and the integer pipeline
    tracks Spark's own double corr() on the same data."""
    from dbms_spark.operators.assess import corr_screen

    rows = [(float(i % 97), 2.0 * (i % 97), -3.0 * (i % 97),
             float((i * 7919) % 13)) for i in range(2000)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    got = {(r.col_x, r.col_y): r.r2_signed_ppm
           for r in corr_screen(df, ["x", "y", "z", "w"]).collect()}
    assert got[("x", "y")] >= 999_000          # perfect positive
    assert got[("x", "z")] <= -999_000         # perfect negative
    assert abs(got[("x", "w")]) < 20_000       # engineered independence
    ref = round(df.stat.corr("x", "w") ** 2 * 1e6)
    assert abs(abs(got[("x", "w")]) - ref) <= max(20, ref // 10)


def test_corr_screen_huge_magnitudes_no_overflow(spark):
    """The round-8 ADVICE envelope: cents ~3e9 over 1e4 rows push cov
    to ~1e26 — the former FIXED 1e9 downscale then squared to ~1e40
    and overflowed DECIMAL(38,0) (Spark silently NULLed, DuckDB's
    HUGEINT raised, so the engines diverged exactly at scale).  The
    derived per-side downscale must (a) report a value, not NULL,
    (b) track the true r², and (c) hash-match the DuckDB twin on the
    same rows."""
    import duckdb

    from dbms_spark.operators.assess import corr_screen, corr_screen_sql

    # x spreads 0..2.9e7 (cents to 2.9e9 — inside the documented
    # per-row envelope, square 8.4e18 < 2^63) so vx ~ n²·var ~ 7e25
    # and cov ~ 7e25 on the affine pair: (cov DIV 1e9)² · 1e6 ~ 5e39
    rows = [(i * 2900.0, i * 2871.0 + float((i * 7919) % 97),
             float((i * 7919) % 1000) * 1.0e4) for i in range(10_000)]
    df = spark.createDataFrame(rows, "x double, y double, w double")
    got = {(r.col_x, r.col_y): r.r2_signed_ppm
           for r in corr_screen(df, ["x", "y", "w"]).collect()}
    # (a) computable, (b) x and y are exactly affine -> r2 ~ 1e6
    assert got[("x", "y")] is not None and got[("x", "y")] >= 999_000
    ref = round(df.stat.corr("x", "w") ** 2 * 1e6)
    assert got[("x", "w")] is not None
    assert abs(abs(got[("x", "w")]) - ref) <= max(20, ref // 10)
    # (c) cross-engine identical at the magnitudes that used to diverge
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        rows, columns=["x", "y", "w"]))
    oracle = {(r[0], r[1]): r[3] for r in
              con.sql(corr_screen_sql("t", ["x", "y", "w"])).fetchall()}
    assert got == oracle


def test_corr_screen_zero_variance_null(spark):
    from dbms_spark.operators.assess import corr_screen

    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)],
                               "x double, c double")
    rows = corr_screen(df, ["x", "c"]).collect()
    assert rows[0].r2_signed_ppm is None      # 0/0 unreported
