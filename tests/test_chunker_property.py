"""Property-based chunker invariants (hypothesis): for ANY key
distribution — duplicates, skew, negatives, singletons — the generated
predicates tile the table exactly and chunk ids agree with them."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbms_spark.plans import chunker

keys = st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=300)
nullable_keys = st.lists(
    st.one_of(st.none(), st.integers(min_value=-10**6, max_value=10**6)),
    min_size=1, max_size=300,
)
n_chunks = st.integers(min_value=1, max_value=9)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=keys, n=n_chunks)
def test_predicates_tile_exactly(spark, ks, n):
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    plan = chunker.plan_chunks(df, ["k"], n, total_rows=len(ks))
    preds = chunker.predicates(plan)
    counts = [df.filter(p).count() for p in preds]
    assert sum(counts) == len(ks), f"tiling broken: {counts} for n={n}"
    with_id = df.withColumn("cid", chunker.assign_chunk_id(plan, df))
    id_counts = {r["cid"]: r["c"] for r in
                 with_id.groupBy("cid").agg(F.count(F.lit(1)).alias("c")).collect()}
    for i, c in enumerate(counts):
        assert id_counts.get(i, 0) == c, f"chunk {i}: predicate={c} id={id_counts.get(i, 0)}"


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=nullable_keys, n=n_chunks)
def test_predicates_tile_exactly_with_null_keys(spark, ks, n):
    """NULL keys must land in exactly one chunk (chunk 0 under
    NULLS-FIRST ordering) for BOTH mechanisms — a NULL-key row silently
    dropped by every chunk predicate would vanish from a chunked scan."""
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    plan = chunker.plan_chunks(df, ["k"], n, total_rows=len(ks))
    preds = chunker.predicates(plan)
    counts = [df.filter(p).count() for p in preds]
    assert sum(counts) == len(ks), f"NULL-key rows dropped: {counts} vs {len(ks)}"
    with_id = df.withColumn("cid", chunker.assign_chunk_id(plan, df))
    id_counts = {r["cid"]: r["c"] for r in
                 with_id.groupBy("cid").agg(F.count(F.lit(1)).alias("c")).collect()}
    for i, c in enumerate(counts):
        assert id_counts.get(i, 0) == c, f"chunk {i}: predicate={c} id={id_counts.get(i, 0)}"


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
              st.one_of(st.none(), st.integers(min_value=-50, max_value=50))),
    min_size=1, max_size=200), n=n_chunks)
def test_composite_key_null_tiling(spark, ks, n):
    """Composite keys with NULLs in either position tile exactly and
    agree with the struct-comparison chunk ids."""
    df = spark.createDataFrame(ks, "a long, b long")
    plan = chunker.plan_chunks(df, ["a", "b"], n, total_rows=len(ks))
    preds = chunker.predicates(plan)
    counts = [df.filter(p).count() for p in preds]
    assert sum(counts) == len(ks), f"tiling broken: {counts} vs {len(ks)}"
    with_id = df.withColumn("cid", chunker.assign_chunk_id(plan, df))
    id_counts = {r["cid"]: r["c"] for r in
                 with_id.groupBy("cid").agg(F.count(F.lit(1)).alias("c")).collect()}
    for i, c in enumerate(counts):
        assert id_counts.get(i, 0) == c, f"chunk {i}: predicate={c} id={id_counts.get(i, 0)}"


# ---------------------------------------------------------------------------
# Python-model equivalence for the deterministic corpus operators
# (they promise pure-function-of-the-input semantics, so a hypothesis
# model test IS their specification)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=1, max_value=99)),
    min_size=1, max_size=80, unique_by=lambda r: r[0]),
    budgets=st.fixed_dictionaries(
        {"a": st.integers(min_value=1, max_value=400),
         "b": st.integers(min_value=1, max_value=400)}))
def test_mix_to_budget_matches_python_model(spark, rows, budgets):
    """For ANY corpus and budgets: the kept set equals the Python
    model (md5-sorted per source, keep while cum-before < budget)."""
    import hashlib

    from dbms_spark.llm.text import mix_to_budget

    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    got = sorted(r.doc_id for r in mix_to_budget(df, budgets).collect())
    model = []
    for src, budget in budgets.items():
        cum = 0
        for did, _, w in sorted((r for r in rows if r[1] == src),
                                key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()):
            if cum < budget:
                model.append(did)
            cum += w
    assert got == sorted(model)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=1, max_size=100, unique=True),
       w_train=st.integers(min_value=1, max_value=98))
def test_split_assign_matches_python_model(spark, ids, w_train):
    """For ANY id set and weights: every document's split equals the
    Python model (md5 prefix vs cumulative thresholds)."""
    import hashlib

    from dbms_spark.llm.text import split_assign

    w_val = (100 - w_train) / 2 / 100.0
    weights = {"train": w_train / 100.0, "val": w_val, "test": w_val}
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {r.doc_id: r.split for r in split_assign(df, weights).collect()}
    space = 16 ** 15
    names = sorted(weights)
    cuts, acc = [], 0.0
    for n in names[:-1]:
        acc += weights[n]
        cuts.append((n, int(acc * space)))
    model = {}
    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        model[i] = next((n for n, cut in cuts if h < cut), names[-1])
    assert got == model
