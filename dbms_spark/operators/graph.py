"""Bounded-iteration graph analytics as finite relational expressions.

Second member of the iterative family next to
:func:`dbms_spark.llm.dedup.dedup_groups` (min-label propagation):
PageRank with a FIXED iteration count and pure-integer arithmetic, the
authority score crawl-curation pipelines use to weight hosts/URLs
before sampling training data.

Integer-exactness: ranks live in millionths (node starts at 1_000_000).
Each round a node ships ``(rank * 85) DIV (100 * outdeg)`` to every
out-neighbour and every node restarts from ``150_000`` — explicit
INTEGER division on BIGINTs (Spark ``DIV``, DuckDB ``//``), so the
computation never passes through doubles and both engines agree
exactly as long as ``rank_e6 * 85`` fits int64, i.e. total graph mass
below ~1e17 millionths (~1e11 nodes) — far beyond the 2^53 bound a
double intermediate would impose.  (This is PageRank up to O(1e-6)
quantization — the floors lose at most outdeg millionths per node per
round.)

Scale shape per round: one equi-join of the edge list against the rank
frontier (shuffle keyed on node id — AQE-coalesced/skew-split) plus a
map-side partial SUM into the destination key.  The edge list and
degree table are computed once and cached; rounds = O(iters) jobs over
them, the same bounded-loop pattern as label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INIT = 1_000_000
_RESTART = 150_000  # floor(0.15 * _INIT)


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3) -> DataFrame:
    """(node, rank_e6) after ``iters`` integer PageRank rounds over the
    directed edge list (deduplicated internally).  Nodes = every id
    appearing as src or dst; a node with no in-edges settles at the
    restart mass, a node with no out-edges simply ships nothing
    (its mass drains — standard dangling behaviour, pin semantics by
    symmetrizing the edge list upstream if undesired)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = e.select("src").union(e.select(F.col("dst").alias("src"))).distinct() \
             .select(F.col("src").alias("node")).persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # degrees never change across rounds: fuse them onto the edge list
    # ONCE and cache that — each round is then a single join against
    # the rank frontier instead of re-joining the degree table
    ed = e.join(deg, "src").persist()
    ranks = nodes.select("node", F.lit(_INIT).cast("bigint").alias("rank_e6"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("(rank_e6 * 85) DIV (100 * outdeg)").alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select("node", (F.lit(_RESTART) + F.coalesce(F.col("inflow"), F.lit(0)))
                    .cast("bigint").alias("rank_e6"))
        )
    return ranks


def pagerank_sql(edges_sql: str, src: str = "src", dst: str = "dst",
                 iters: int = 3) -> str:
    """DuckDB twin — rounds unrolled as chained CTEs.  The per-edge
    contribution uses DuckDB's ``//`` integer division (Spark's
    ``DIV``): both stay in BIGINT end-to-end, so exactness holds to
    int64 range rather than a double's 2^53."""
    ctes = [
        f"e AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, CAST({_INIT} AS BIGINT) AS rank_e6 FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"c{i} AS (SELECT e.dst, SUM((r.rank_e6 * 85) // (100 * d.outdeg)) "
            f"AS inflow "
            f"FROM e JOIN deg d ON e.src = d.src JOIN r{i} r ON e.src = r.node "
            f"GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT n.node, CAST({_RESTART} + COALESCE(c.inflow, 0) "
            f"AS BIGINT) AS rank_e6 "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst)"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_e6 FROM r{iters}")
