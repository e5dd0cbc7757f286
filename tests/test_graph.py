"""PageRank (operators/graph.py): structural invariants on tiny
hand-built graphs; cross-engine exactness is pinned by the q165
parity gate."""

from pyspark.sql import functions as F

from dbms_spark.operators.graph import pagerank


def _ranks(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_e6"] for r in pagerank(df, iters=iters).collect()}


def test_pagerank_star_hub_dominates(spark):
    # leaves 1..4 all point at hub 0; hub points back at leaf 1
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    r = _ranks(spark, edges)
    assert r[0] > r[1] > r[2]  # hub first; leaf 1 gets hub's backflow
    assert r[2] == r[3] == r[4] == 150_000  # pure restart mass

def test_pagerank_symmetric_pair_equal(spark):
    r = _ranks(spark, [(1, 2), (2, 1)])
    assert r[1] == r[2]
    # self-consistent fixed point of the 2-cycle: all mass retained
    # minus floor loss per round
    assert 990_000 <= r[1] <= 1_000_000


def test_pagerank_mass_bounds(spark):
    edges = [(a, b) for a in range(6) for b in range(6) if a != b]
    r = _ranks(spark, edges, iters=4)
    total = sum(r.values())
    n = len(r)
    assert n == 6
    # complete graph keeps everyone at the uniform fixed point
    assert len(set(r.values())) == 1
    assert 150_000 * n <= total <= 1_000_000 * n


def test_pagerank_duplicate_edges_ignored(spark):
    r1 = _ranks(spark, [(1, 2), (2, 1)])
    r2 = _ranks(spark, [(1, 2), (1, 2), (2, 1), (2, 1)])
    assert r1 == r2


# ---------------------------------------------------------------------------
# connected_components (large-star/small-star)
# ---------------------------------------------------------------------------

def _cc(spark, edges, **kw):
    from dbms_spark.operators.graph import connected_components
    pairs = spark.createDataFrame(edges, "a_id bigint, b_id bigint")
    return {r["doc_id"]: r["group_id"]
            for r in connected_components(pairs, **kw).collect()}


def test_cc_hand_computed(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
                      (10, 11), (11, 12), (10, 12),        # triangle
                      (20, 21),                            # pair
                      (30, 30)])                           # self-loop dropped
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_chain_beyond_label_propagation_reach(spark):
    """A 64-node chain (diameter 63): star contraction labels every
    node with the chain head in O(log n) rounds, while dedup_groups'
    default 4 rounds of min-label propagation can only pull labels 4
    hops — the complementary failure mode this operator exists for."""
    from dbms_spark.llm.dedup import dedup_groups

    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(65)}

    pairs = spark.createDataFrame(edges, "a_id bigint, b_id bigint")
    lp = {r["doc_id"]: r["group_id"] for r in dedup_groups(pairs).collect()}
    assert lp[64] != 0  # fixed rounds cannot reach the far end


def test_cc_edge_directions_and_duplicates_normalize(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_raises_when_rounds_exhausted(spark):
    import pytest

    with pytest.raises(RuntimeError, match="converge"):
        _cc(spark, [(i, i + 1) for i in range(32)], max_rounds=1)
