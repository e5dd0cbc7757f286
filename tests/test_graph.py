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
