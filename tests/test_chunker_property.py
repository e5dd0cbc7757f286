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
