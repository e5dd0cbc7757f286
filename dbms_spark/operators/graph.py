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
from pyspark.sql.window import Window

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
    # the rank frontier instead of re-joining the degree table.
    # (Round 10: an explicit repartition(src)+sortWithinPartitions
    # before this persist was tried and REVERTED — whenever the e⋈deg
    # join runs as SMJ its output is already hash-partitioned AND
    # sorted on src, so the cache already satisfies each round's join
    # prep, and the extra exchange measured q165 2.16 -> 2.27 s.)
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


# ---------------------------------------------------------------------------
# Connected components without a diameter bound: alternating
# large-star / small-star (Kiveris et al. 2014, "Connected Components
# in MapReduce and Beyond").  Complements dedup_groups: label
# propagation needs `diameter` rounds (right for the near-clique
# groups LSH banding emits), star contraction converges in O(log n)
# rounds on ANY topology — the long chains/filament clusters a
# similarity graph can contain at web scale.
# ---------------------------------------------------------------------------


def _sym(e: DataFrame) -> DataFrame:
    """Both directions of the canonical (u > v) edge list."""
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) + {u}).  Emitted edges
    keep the (bigger, smaller) canonical orientation.

    min(N(u) + {u}) is attached per row by ONE window over a single
    exchange of the symmetrized list (guide §2.4): the groupBy + join
    form this replaces exchanged the full list twice per call (once
    into the per-u aggregate, once into the join's probe side)."""
    n = _sym(e)
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        n.select("u", "v", m.alias("m"))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect u and all its strictly-smaller neighbors to the
    smallest of them.  Same one-window shape as :func:`_large_star`;
    the per-u root link (u, m) is emitted once per row and collapsed
    by the final distinct (which the join form needed anyway)."""
    n = _sym(e).filter(F.col("v") < F.col("u"))
    nm = n.select(
        "u", "v", F.min("v").over(Window.partitionBy("u")).alias("m"))
    links = (
        nm.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionAll(nm.select("u", F.col("m").alias("v")))
    )
    return links.distinct()


def connected_components(pairs: DataFrame, id_a: str = "a_id",
                         id_b: str = "b_id",
                         max_rounds: int = 30) -> DataFrame:
    """(doc_id, group_id) for every node in ``pairs``, where group_id
    is the minimum node id of its connected component — the same
    contract as :func:`dbms_spark.llm.dedup.dedup_groups`, but with NO
    diameter assumption: alternating large-star/small-star contraction
    converges in O(log n) rounds on arbitrary graphs (chains,
    filaments, anything), where fixed-round label propagation would
    silently mislabel nodes farther than ``iters`` hops from their
    component minimum.

    Scale shape per round: two per-u min windows, each riding ONE
    exchange of its neighbor list, plus the emitted edges' distincts —
    no joins.  STRAGGLER TRADEOFF (round-11, ADVICE): window
    partitions cannot be AQE-skew-split (OptimizeSkewedJoin applies
    only to joins) and a window min has no map-side combine, so a hub
    node's entire neighbor list sorts in ONE task — the price of
    halving the exchanges vs the old groupBy(min)+join form, which
    was skew-tolerant but shuffled the list twice per call.  Bounded
    in practice because a hub star is exactly the contraction's fixed
    point: a degree-d hub costs one d-row window task for O(1) rounds
    (its neighbors re-point to the min and leave), it does not
    compound round over round; WindowExec buffers spill to disk, so
    the straggler is wall-clock, not OOM.  Graphs where single-key
    degree exceeds task comfort (10^8+) want a salted two-level min
    (min per (u, salt), then per u) grafted into ``_large_star`` /
    ``_small_star`` — not done here because every measured gate's hub
    degree is orders of magnitude below that.  Each round's edge set is ``localCheckpoint``-ed — for a
    DATA-DEPENDENT loop, persist() is not enough: the logical plan
    still nests every previous round (~5 references each), so Catalyst
    analysis grows exponentially and stalls the driver around round 7;
    checkpointing truncates the lineage so round r+1 plans against a
    materialized relation.  (On a cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
    executor-loss resilience; localCheckpoint trades that for speed.)
    The convergence probe computes (count, xor-of-row-hashes) in the
    one materializing aggregation per round and runs the exact
    one-sided EXCEPT only when the fingerprint repeats — on a
    topology whose edge COUNT is invariant round over round (chains:
    every contraction keeps n-1 edges) the count-only probe paid the
    EXCEPT every round; the xor fingerprint of a distinct edge set
    changes whenever the set does (up to a 2^-64 collision, and the
    EXCEPT still confirms exactly, so a collision costs one wasted
    probe, never a wrong answer).  Rounds are data-dependent but
    bounded: raises after ``max_rounds`` (2^30 nodes would converge
    well within 30) rather than returning a wrong labeling."""

    # LAZY checkpoints (round 10): the signature aggregation right
    # after each checkpoint is the materializing action, so lineage
    # truncation costs no extra job — one job per round
    def _sig(df: DataFrame) -> tuple:
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
        return r["n"], r["h"]

    e = (
        pairs.filter(F.col(id_a) != F.col(id_b))
        .select(F.greatest(id_a, id_b).alias("u"), F.least(id_a, id_b).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig_e = _sig(e)
    for _ in range(max_rounds):
        ns = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # carry the signature across rounds: this round's is next
        # round's, so each round pays one probe job, not two
        sig_ns = _sig(ns)
        converged = sig_ns == sig_e and ns.exceptAll(e).isEmpty()
        e, sig_e = ns, sig_ns
        if converged:
            break
    else:
        raise RuntimeError(f"star contraction did not converge in {max_rounds} rounds")
    roots = e.select(F.col("v").alias("doc_id")).distinct() \
             .withColumn("group_id", F.col("doc_id"))
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("group_id"))
        .unionAll(roots)
        .distinct()
    )


def connected_components_sql(pairs_sql: str, id_a: str = "a_id",
                             id_b: str = "b_id") -> str:
    """DuckDB twin via recursive transitive closure: every node's label
    is the minimum id it can reach (closure is O(n * component) pairs —
    an ORACLE formulation for test corpora, not a scale path; the
    Spark side is the scale path)."""
    return f"""
WITH RECURSIVE sym AS (
  SELECT {id_a} AS u, {id_b} AS v FROM ({pairs_sql}) WHERE {id_a} <> {id_b}
  UNION
  SELECT {id_b}, {id_a} FROM ({pairs_sql}) WHERE {id_a} <> {id_b}
),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
)
SELECT u AS doc_id, least(u, MIN(v)) AS group_id FROM reach GROUP BY u
"""
