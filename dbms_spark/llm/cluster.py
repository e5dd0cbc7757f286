"""Bounded-iteration k-means over embedding columns (array<float>).

The corpus-organization step a training-data pipeline runs after
dedup: discover domains/topics in embedding space, then sample or
re-weight per cluster (diversity sampling, domain mixing).  The
reference has no ML clustering — this extends the LLM-pipeline
surface the same way the ANN/LSH operators do.

Algorithm (Lloyd's, pinned for differential testability):

- Coordinates are fixed-point quantized (``round(x * 10000)``), so
  every squared-distance and centroid sum is an integer far below
  2^53 — double accumulation is EXACT on both engines regardless of
  reduction order (same trick as :mod:`dbms_spark.llm.similarity`).
- Seeds are the ``k`` vectors with the smallest ids (deterministic,
  O(k) take — no RNG, so the DuckDB twin can reproduce it).
- Assignment breaks distance ties toward the smaller centroid id via
  a zero-padded ``dist||cid`` string key (unique per pair, so
  ``min_by``/``arg_min`` is deterministic on both engines).
- Centroid update rounds the integer mean half-up via pure integer
  math ``floor((2*sum + n) / (2*n))`` — no engine-specific rounding
  mode can diverge.
- Exactly ``iters`` (assign, update) rounds, then one final
  assignment.  Fixed iteration count (not convergence-tested) keeps
  the computation a finite relational expression — the SQL twin
  unrolls the same rounds as chained CTEs, like
  :func:`dbms_spark.llm.dedup.dedup_groups_sql` does for label
  propagation.  Empty clusters drop out of the update (their group
  simply produces no row), matching both engines.

Scale shape: each round is one broadcast of k centroids against the
corpus (map-side nested-loop over k rows — never an all-pairs
shuffle) plus one k-key aggregation with map-side partial sums (the
per-dimension sums are 64 independent SUM aggregates, not an
explode).  The only sort is the O(k) seed take.  Driver never sees
vector data.  Integer-exactness bound: per-cluster coordinate sums
stay below 2^53 up to ~10^11 member vectors per cluster at the
default quantization — beyond any realistic shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_spark.llm.similarity import quantize_expr, quantize_sql

#: squared L2 over quantized vectors — integer-valued doubles
_DIST_SPARK = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
               "0D, (acc, v) -> acc + v)")
_DIST_DUCK = ("list_sum(list_transform(list_zip({a}, {b}), "
              "p -> (p[1] - p[2]) * (p[1] - p[2])))")


def _key_expr(dist: F.Column, cid: F.Column) -> F.Column:
    return F.concat(
        F.lpad(dist.cast("bigint").cast("string"), 14, "0"),
        F.lpad(cid.cast("string"), 10, "0"),
    )


def _assign(qv: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid): nearest centroid by quantized squared L2,
    ties toward the smaller centroid id."""
    dist = F.expr(_DIST_SPARK.format(a="q", b="cvec"))
    return (
        qv.crossJoin(F.broadcast(cent))
        .select("vec_id", F.col("cid"), _key_expr(dist, F.col("cid")).alias("key"))
        .groupBy("vec_id")
        .agg(F.expr("min_by(cid, key)").alias("cid"))
    )


def _update(assign: DataFrame, qv: DataFrame, dims: int) -> DataFrame:
    """(cid, cvec): per-cluster integer mean, rounded half-up."""
    j = assign.join(qv, "vec_id")
    sums = j.groupBy("cid").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(F.element_at("q", d + 1)).alias(f"s{d}") for d in range(dims)],
    )
    cvec = F.array(*[
        F.expr(f"cast(floor((2 * s{d} + cnt) / (2 * cnt)) as double)")
        for d in range(dims)
    ])
    return sums.select("cid", cvec.alias("cvec"))


def kmeans_assign(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster assignment (vec_id, cid) after ``iters`` Lloyd rounds.

    ``cid`` is the seed vector's id (stable across engines).  ``dims``
    must match the embedding width — the update aggregates one SUM per
    dimension so the plan stays explode-free.
    """
    from dbms_spark.plans.parallelism import ensure_parallelism

    # hash-partition the guard's exchange on vec_id (round 10, guide
    # §2.4): the broadcast crossJoin preserves the streamed side's
    # partitioning, so every round's groupBy(vec_id) assignment agg
    # AND the update's assign⋈qv join are satisfied by this ONE
    # exchange — the former round-robin repartition (which also paid
    # sortBeforeRepartition) forced a fresh vec_id exchange in each
    # of those places
    qv = ensure_parallelism(
        df.select(F.col(id_col).alias("vec_id"), quantize_expr(vec_col).alias("q")),
        keys=["vec_id"],
    ).persist()
    # Each round's k-row centroid relation is localCheckpoint'ed: the
    # checkpoint truncates the nested assign+update lineage to a k-row
    # leaf, so round i+1's Catalyst analysis and codegen see a tiny
    # plan instead of i nested rounds (cold first pass at sf0.1
    # measured 7.0 s lazy-chain vs 3.6 s checkpointed; warm passes are
    # within noise — the win is entirely plan-analysis/codegen, which
    # a single-pass caller always pays).  A driver-collected-centroid
    # variant (MLlib's shape, O(k*dims) literal rows per round) was
    # measured slower still: the collect serializes rounds into
    # blocking jobs whose scheduling latency exceeds the checkpoint's.
    cent = (
        qv.orderBy("vec_id").limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cvec"))
    )
    for _ in range(iters):
        # lazy: the k-row centroid RDD materializes inside whichever
        # job first reads it (the next round's exchange or the final
        # assignment) — same lineage truncation as the eager form
        # with zero standalone jobs per round (round-10: q159
        # 2.3 → ~1.6 s, q191 shares the win)
        cent = _update(_assign(qv, cent), qv, dims).localCheckpoint(eager=False)
    return _assign(qv, cent).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("cid").cast("bigint").alias("cid"),
    )


def kmeans_sizes(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster member counts after :func:`kmeans_assign`."""
    a = kmeans_assign(df, k=k, iters=iters, dims=dims, id_col=id_col, vec_col=vec_col)
    return a.groupBy("cid").agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))


def kmeans_assign_sql(
    table: str,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`kmeans_assign` — rounds unrolled as
    chained CTEs.  The update explodes per-dimension (parallel-unnest
    zip + ``list(... ORDER BY d)`` rebuild); explode is fine for the
    oracle, while the Spark side keeps the explode-free form."""
    dist = _DIST_DUCK.format(a="q", b="cvec")
    key = (f"lpad(CAST(CAST({dist} AS BIGINT) AS VARCHAR), 14, '0') || "
           f"lpad(CAST(cid AS VARCHAR), 10, '0')")

    def assign_cte(name: str, cent: str) -> str:
        return (f"{name} AS (SELECT vec_id, arg_min(cid, {key}) AS cid "
                f"FROM qv CROSS JOIN {cent} GROUP BY vec_id)")

    ctes = [
        f"qv AS (SELECT {id_col} AS vec_id, "
        f"{quantize_sql(vec_col)} AS q FROM {table})",
        f"c0 AS (SELECT vec_id AS cid, q AS cvec FROM qv ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(iters):
        ctes.append(assign_cte(f"a{i}", f"c{i}"))
        ctes.append(
            f"x{i} AS (SELECT cid, unnest(q) AS v, "
            f"unnest(range(1, len(q) + 1)) AS d "
            f"FROM a{i} JOIN qv USING (vec_id))"
        )
        ctes.append(
            f"n{i} AS (SELECT cid, COUNT(*) AS cnt FROM a{i} GROUP BY cid)"
        )
        ctes.append(
            f"c{i + 1} AS (SELECT cid, list(CAST(floor((2 * s + cnt) / (2 * cnt)) "
            f"AS DOUBLE) ORDER BY d) AS cvec FROM "
            f"(SELECT cid, d, SUM(v) AS s FROM x{i} GROUP BY cid, d) "
            f"JOIN n{i} USING (cid) GROUP BY cid)"
        )
    ctes.append(assign_cte("afinal", f"c{iters}"))
    return ("WITH " + ",\n".join(ctes)
            + "\nSELECT CAST(vec_id AS BIGINT) AS vec_id, "
              "CAST(cid AS BIGINT) AS cid FROM afinal")


def kmeans_sizes_sql(
    table: str,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    inner = kmeans_assign_sql(table, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return (f"SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members "
            f"FROM ({inner}) GROUP BY cid")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): cluster-scoped
# embedding near-dup removal
# ---------------------------------------------------------------------------

def derive_k(n_rows: int, target_cell: int = 4096, k_min: int = 4) -> int:
    """Scaled-k rule as a function: pick the cluster count that keeps
    the AVERAGE cell at ``target_cell`` rows, so the within-cell
    quadratic term sum(c_i^2) ≈ n * target_cell stays LINEAR in corpus
    size.  SCALE.md measured the difference: 10x data at fixed k was
    9.1x wall (cells grow, pairs grow quadratically); 10x data with
    scaled k was 1.4x."""
    return max(k_min, -(-n_rows // target_cell))


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    k: int | None = 4,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means partitions the embedding
    space, exact fixed-point cosine runs ONLY within each cluster, and
    pairs at/above ``threshold`` collapse via label propagation to
    their min-id representative.  Returns the SURVIVORS as
    ``(vec_id, cid)``.

    This is the scale story of the SemDeDup paper re-expressed
    relationally: the cluster assignment bounds the pair join to
    sum(c_i^2) instead of n^2 (cross-cluster near-dups are the
    accepted recall loss — vectors that similar land in the same cell
    of a reasonable quantizer), the pair sim is the same integer-exact
    quantized cosine as the ANN family, and the keep-one policy reuses
    :func:`dbms_spark.llm.dedup.dedup_groups`.  Every shuffle keys on
    cid or a vec id — AQE-coalesced/skew-split.

    Caching note: the assignment-vector relation is persisted (it
    feeds both pair legs and the survivor select) and NOT unpersisted
    — the entry lives until the session drops it.  Long-lived sessions
    calling this per shard should ``spark.catalog.clearCache()`` (or
    unpersist via the plan cache) between shards.

    ``k=None`` derives the cluster count from the corpus size via
    :func:`derive_k` (one ``count()`` over the input) — the fixed-k
    blowup guard for callers that don't know their scale up front;
    explicit ``k`` keeps deterministic cross-engine parity (the
    registry gate pins it)."""
    from dbms_spark.llm.dedup import dedup_groups
    from dbms_spark.llm.similarity import _DOT_SPARK, _NORM_SPARK

    if k is None:
        k = derive_k(df.count(), target_cell)
    assign = kmeans_assign(df, k=k, iters=iters, dims=dims,
                           id_col=id_col, vec_col=vec_col)
    v = df.select(F.col(id_col).alias("vec_id"),
                  quantize_expr(vec_col).alias("v"))
    v = v.withColumn("nrm", F.expr(_NORM_SPARK.format(a="v")))
    # (vec_id, cid, v, nrm) feeds BOTH pair legs and the survivor
    # select — persist it or the full k-means chain upstream re-runs
    # per use (SemDeDup materializes the cluster assignment anyway;
    # MEMORY_AND_DISK spills at corpus scale)
    m = assign.join(v, "vec_id").persist()
    a = m.select(F.col("cid"), F.col("vec_id").alias("a_id"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = m.select(F.col("cid"), F.col("vec_id").alias("b_id"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = _DOT_SPARK.format(a="va", b="vb")
    sim = f"floor({dot} / (na * nb) * 1000000) / 1000000"
    pairs = (
        a.join(b, "cid")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.expr(sim).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    groups = dedup_groups(pairs)
    drop = groups.filter(F.col("doc_id") != F.col("group_id")) \
                 .select(F.col("doc_id").alias("vec_id"))
    return m.select("vec_id", "cid").join(drop, "vec_id", "left_anti")


def semantic_dedup_sql(
    table: str,
    threshold: float,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`semantic_dedup` — the label-propagation
    sub-query nests its own WITH (outer CTEs are lexically visible
    inside it, so its pair source can reference ``m`` directly)."""
    from dbms_spark.llm.dedup import dedup_groups_sql
    from dbms_spark.llm.similarity import _DOT_DUCK, _NORM_DUCK

    assign = kmeans_assign_sql(table, k=k, iters=iters,
                               id_col=id_col, vec_col=vec_col)
    dot = _DOT_DUCK.format(a="a.v", b="b.v")
    pairs = (
        f"SELECT a.vec_id AS a_id, b.vec_id AS b_id "
        f"FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id "
        f"WHERE floor({dot} / (a.nrm * b.nrm) * 1000000) / 1000000 "
        f">= {threshold}"
    )
    norm = _NORM_DUCK.format(a="v")
    return f"""
WITH assign AS ({assign}),
vq AS (SELECT {id_col} AS vec_id, {quantize_sql(vec_col)} AS v FROM {table}),
m AS (SELECT vec_id, cid, v, {norm} AS nrm FROM assign JOIN vq USING (vec_id)),
grp AS ({dedup_groups_sql(pairs)}),
drop0 AS (SELECT doc_id AS vec_id FROM grp WHERE doc_id <> group_id)
SELECT m.vec_id, m.cid
FROM m LEFT JOIN drop0 USING (vec_id)
WHERE drop0.vec_id IS NULL
"""
