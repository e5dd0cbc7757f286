"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
(skew) detection.

A 100 TB groupBy on a skewed key needs the heavy keys known BEFORE the
shuffle to salt them (:mod:`dbms_spark.plans.skew`).  An exact
frequency table is itself a full shuffle of the key column; a count-min
sketch is one partial aggregation into O(d*w) cells — constant state
per executor, mergeable, and always an over-estimate (min over d
independent row hashes), so no heavy key is ever missed (one-sided
error: cms_est >= exact count, with overestimate probability bounded by
the classic (epsilon, delta) argument, epsilon = e/w, delta = e^-d).

All cell hashing is md5-based integer math, so the sketch has a
bit-identical DuckDB twin for the differential gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dbms_spark.plans.parallelism import literal_df


@dataclass
class MembershipFilter:
    """A Bloom filter whose parameters TRAVEL WITH the word relation —
    probing with mismatched (m_bits, k) silently breaks the
    no-false-negative contract, so the engine facade only ever hands
    out this bundle (and persists the parameters in a meta sidecar,
    see :func:`bloom_write`)."""

    words: DataFrame
    m_bits: int
    k: int
    n_keys_est: int | None = None


def _cell_expr(key: Column, j: int, width: int) -> Column:
    """Row-``j`` cell index of a key: md5-derived 32-bit hash mod width."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), key.cast("string"))), 1, 8), 16, 10)
    return (h.cast("bigint") % width).alias(f"c{j}")


def _cell_sql(key: str, j: int, width: int) -> str:
    return (f"(('0x' || substr(md5('{j}' || ':' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
            f" % {width})")


def cms_cells(df: DataFrame, key_col: str, depth: int = 3, width: int = 512) -> DataFrame:
    """The sketch itself: (j, cell, cnt) for j in [0, depth).  One
    explode (depth× row growth on a narrow projection) and one groupBy
    whose result is at most depth*width rows — the shuffle moves cell
    counts, never keys."""
    key = F.col(key_col)
    cells = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), _cell_expr(key, j, width).alias("cell"))
            for j in range(depth)
        ])).alias("jc")
    )
    return (
        cells.select(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_cells_sql(table_sql: str, key_col: str, depth: int = 3, width: int = 512) -> str:
    arms = "\nUNION ALL ".join(
        f"SELECT {j} AS j, {_cell_sql(key_col, j, width)} AS cell FROM src"
        for j in range(depth)
    )
    return f"WITH src AS ({table_sql}), jc AS ({arms})\n" \
           f"SELECT j, cell, COUNT(*) AS cnt FROM jc GROUP BY j, cell"


def heavy_hitters_with_cms(df: DataFrame, key_col: str, n: int = 5,
                           depth: int = 3, width: int = 512) -> DataFrame:
    """Exact top-``n`` keys by frequency, each with its count-min
    estimate alongside the exact count (``cms_est >= exact_cnt`` always
    — the one-sided guarantee the salting planner relies on).

    The exact side here is the verification harness; at scale the
    sketch alone (broadcast, O(d*w)) screens candidate keys so only
    suspected-heavy keys pay an exact count."""
    from pyspark.sql import Window

    key = F.col(key_col)
    sketch = cms_cells(df, key_col, depth, width)
    w_top = Window.orderBy(F.desc("exact_cnt"), F.asc(key_col))
    top = (
        df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_cnt"))
        .withColumn("rnk", F.row_number().over(w_top))
        .filter(F.col("rnk") <= n)
        .drop("rnk")
    )
    probes = top.select(
        key_col, "exact_cnt",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), _cell_expr(key, j, width).alias("cell"))
            for j in range(depth)
        ])).alias("jc"),
    ).select(key_col, "exact_cnt", F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy(key_col)
        .agg(
            F.max("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.min("cnt").cast("bigint").alias("cms_est"),
        )
    )


def heavy_hitters_with_cms_sql(table_sql: str, key_col: str, n: int = 5,
                               depth: int = 3, width: int = 512) -> str:
    cells = cms_cells_sql(table_sql, key_col, depth, width)
    probe_arms = "\nUNION ALL ".join(
        f"SELECT {key_col}, exact_cnt, {j} AS j, {_cell_sql(key_col, j, width)} AS cell FROM top"
        for j in range(depth)
    )
    return f"""
WITH cells AS ({cells}),
src AS ({table_sql}),
top AS (
  SELECT {key_col}, exact_cnt FROM (
    SELECT {key_col}, COUNT(*) AS exact_cnt,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, {key_col}) AS rnk
    FROM src GROUP BY {key_col}
  ) WHERE rnk <= {n}
),
probes AS ({probe_arms})
SELECT {key_col}, CAST(MAX(exact_cnt) AS BIGINT) AS exact_cnt,
       CAST(MIN(cnt) AS BIGINT) AS cms_est
FROM probes JOIN cells USING (j, cell)
GROUP BY {key_col}
"""


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) with deterministic md5 register
# math — the mergeable-NDV sketch, differentially testable.
#
# Spark's approx_count_distinct is the production HLL++, but its
# registers are engine-internal, so the assessment gate for it can only
# be error-bounded (tests/test_round3_ops.py).  This form pins the
# SKETCH ITSELF cross-engine: bucket/rho come from md5 bits, registers
# are a 64-row groupBy-MAX, and the raw estimate is pure BIGINT
# arithmetic — bit-identical on Spark and DuckDB.  Merge = elementwise
# MAX of register tables (unit-tested), which is what makes HLL the
# at-scale NDV shape: per-partition sketches combine losslessly, so
# 100 TB costs one partial-aggregated shuffle of 64 rows per column.
#
# Layout (m = 64 buckets, p = 6):
#   bucket = 12 md5 bits mod 64 (exact uniformity: 4096 / 64)
#   w      = independent 36 md5 bits; rho = leading zeros in w + 1
#            (w = 0 -> rho = 37)
#   raw estimate = floor(709 * m^2 * 2^37 / (1000 * S')) with
#   S' = sum over all m buckets of 2^(37 - M_j) — the classic
#   alpha_m * m^2 / sum(2^-M_j) scaled integer-exact (alpha_64 = 0.709
#   as the rational 709/1000; numerator 709 * 2^49 < 2^63).
#   Bias corrections (linear counting below 2.5m, the large-range
#   branch) involve ln() — libm-dependent, so NOT applied here; the
#   gate pins the raw estimator, and production use at <2.5m
#   cardinalities should prefer approx_ndv_profile anyway.
# ---------------------------------------------------------------------------

_HLL_M = 64
_HLL_WBITS = 36


def _hll_parts_expr(key: Column) -> tuple[Column, Column]:
    md = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(md, 10, 3), 16, 10).cast("bigint") % _HLL_M
    w = F.conv(F.substring(md, 1, 9), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(F.lit(_HLL_WBITS + 1) - F.length(F.bin(w)))
        .cast("bigint")
    )
    return bucket, rho


def _hll_parts_sql(key: str) -> tuple[str, str]:
    md = f"md5(CAST({key} AS VARCHAR))"
    bucket = f"(('0x' || substr({md}, 10, 3))::BIGINT % {_HLL_M})"
    w = f"('0x' || substr({md}, 1, 9))::BIGINT"
    rho = (f"CAST(CASE WHEN {w} = 0 THEN {_HLL_WBITS + 1} "
           f"ELSE {_HLL_WBITS + 1} - length(bin({w})) END AS BIGINT)")
    return bucket, rho


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """The sketch: (bucket, register) for every bucket in [0, m) —
    register = max rho observed in the bucket, 0 for empty buckets.
    One partial-aggregated 64-key shuffle; merging two corpora's
    sketches is an elementwise MAX."""
    bucket, rho = _hll_parts_expr(F.col(key_col))
    got = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("register"))
    )
    spark = df.sparkSession
    all_b = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    return (
        all_b.join(got, "bucket", "left")
        .select("bucket",
                F.coalesce("register", F.lit(0)).cast("bigint").alias("register"))
    )


def hll_registers_sql(table_sql: str, key_col: str) -> str:
    bucket, rho = _hll_parts_sql(key_col)
    return f"""
WITH src AS ({table_sql}),
got AS (SELECT {bucket} AS bucket, MAX({rho}) AS register FROM src GROUP BY 1),
all_b AS (SELECT unnest(range({_HLL_M})) AS bucket)
SELECT all_b.bucket, CAST(COALESCE(register, 0) AS BIGINT) AS register
FROM all_b LEFT JOIN got USING (bucket)
"""


def hll_estimate(df: DataFrame, key_col: str) -> DataFrame:
    """One row (hll_est, n_empty_buckets): the raw HLL estimator from
    the register table, all-BIGINT (see module banner for the scaled
    form).  n_empty_buckets is reported so a caller can see when the
    linear-counting regime applies."""
    regs = hll_registers(df, key_col)
    scale = 1 << (_HLL_WBITS + 1)
    num = 709 * _HLL_M * _HLL_M * scale
    return regs.agg(
        F.expr(f"CAST({num} DIV (1000 * SUM(CAST(POW(2, {_HLL_WBITS + 1} - register) "
               f"AS BIGINT))) AS BIGINT)").alias("hll_est"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_empty_buckets"),
    )


def hll_estimate_sql(table_sql: str, key_col: str) -> str:
    scale = 1 << (_HLL_WBITS + 1)
    num = 709 * _HLL_M * _HLL_M * scale
    return f"""
WITH regs AS ({hll_registers_sql(table_sql, key_col)})
SELECT CAST({num} // (1000 * SUM(CAST(2 ** ({_HLL_WBITS + 1} - register) AS BIGINT))) AS BIGINT) AS hll_est,
       CAST(SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_buckets
FROM regs
"""


def hll_ndv_by(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-GROUP approximate NDV: (group, ndv_est) from one grouped
    HLL sketch — the 100 TB form of ``groupBy(g).agg(countDistinct)``
    when groups are many and keys heavy (countDistinct shuffles every
    (group, key) pair; this shuffles at most m=64 register rows per
    group, partial-aggregated map-side).

    Same raw integer-exact estimator as :func:`hll_estimate` (alpha =
    709/1000, no libm bias branches, so the DuckDB twin is
    bit-identical — gate q223); buckets a group never observed
    contribute the empty-register term (m - n_present) * 2^(w+1)
    directly in the final aggregate, so no per-group bucket spine is
    materialized."""
    bucket, rho = _hll_parts_expr(F.col(key_col))
    scale = 1 << (_HLL_WBITS + 1)
    num = 709 * _HLL_M * _HLL_M * scale
    got = (
        df.select(F.col(group_col).alias("__grp"),
                  bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("__grp", "bucket").agg(F.max("rho").alias("register"))
    )
    return (
        got.groupBy("__grp")
        .agg(F.expr(
            f"CAST({num} DIV (1000 * ("
            f"SUM(CAST(POW(2, {_HLL_WBITS + 1} - register) AS BIGINT))"
            f" + ({_HLL_M} - COUNT(*)) * {scale})) AS BIGINT)")
            .alias("ndv_est"))
        .select(F.col("__grp").alias(group_col), "ndv_est")
    )


def hll_ndv_by_sql(table_sql: str, group_col: str, key_col: str) -> str:
    bucket, rho = _hll_parts_sql(key_col)
    scale = 1 << (_HLL_WBITS + 1)
    num = 709 * _HLL_M * _HLL_M * scale
    return f"""
WITH src AS ({table_sql}),
got AS (
  SELECT {group_col} AS grp, {bucket} AS bucket, MAX({rho}) AS register
  FROM src GROUP BY 1, 2
)
SELECT grp AS {group_col},
       CAST({num} // (1000 * (
         SUM(CAST(2 ** ({_HLL_WBITS + 1} - register) AS BIGINT))
         + ({_HLL_M} - COUNT(*)) * {scale})) AS BIGINT) AS ndv_est
FROM got GROUP BY grp
"""


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge HLL sketches: elementwise register MAX across any number
    of (bucket, register) tables — the lossless combine that lets
    per-shard / per-day sketches roll up without touching raw data.
    The result is EXACTLY the sketch of the unioned inputs (max is
    associative/commutative/idempotent), so rollups can be re-merged
    freely — registered alongside cms_cells as the repo's mergeable
    summaries."""
    if not register_tables:
        raise ValueError("hll_merge needs at least one register table")
    u = register_tables[0]
    for t in register_tables[1:]:
        u = u.unionByName(t)
    return (
        u.groupBy("bucket")
        .agg(F.max("register").cast("bigint").alias("register"))
    )


# ---------------------------------------------------------------------------
# Deterministic Bloom filter: membership summaries for incremental
# intake.  Probing an incoming batch against a persisted corpus-key
# filter answers "definitely new" without re-reading the corpus —
# the pre-join pruning pattern for 100 TB incremental pipelines
# (exact dedup / decontamination fast path; false positives fall
# through to the exact join, false negatives are impossible).
#
# Layout: m bits as m/32 32-bit words in a (word, bits) relation —
# the build is ONE partial-aggregated groupBy over n*k hash rows, the
# merge is elementwise bit_or (associative/idempotent, like
# hll_merge), and probes broadcast the word table.  32-bit words keep
# every shift inside positive BIGINT range in both engines, so the
# relation (and the gate) is bit-identical cross-engine.
#
# Relationship to llm/text.bloom_contamination_check: that one builds
# the filter INSIDE one query over a small benchmark set (positions as
# expression literals); this one materializes the filter AS A RELATION
# — persistable to parquet, mergeable across shards/days, probed by
# later jobs without re-reading the corpus.  Same math, different
# lifecycle.
# ---------------------------------------------------------------------------

_BLOOM_M = 65536        # bits (2^16) -> 2048 words (floor size)
_BLOOM_K = 4            # hash functions (default when not derived)

# Probe-side join strategy threshold: a (word BIGINT, bits BIGINT)
# relation is ~16 B/row, so 2^21 words = 32 MB — comfortably inside a
# Spark broadcast but above it a multi-GB broadcast per probe would be
# the bottleneck.  Larger filters fall back to a plain shuffle join on
# `word` (the probe side is k rows/key keyed by word — a fine,
# uniformly-hashed shuffle key).
_BLOOM_BROADCAST_MAX_WORDS = 1 << 21


def derive_bloom_size(n_keys: int, bits_per_key: int = 10,
                      floor_bits: int = _BLOOM_M) -> int:
    """m_bits for an expected key count: next power of two >=
    n_keys * bits_per_key (floor 65,536).  10 bits/key with the
    matched k (see :func:`derive_bloom_k`) gives ~1% FPR — the same
    derive-the-knob-from-the-data recipe as similarity.derive_n_planes
    and cluster auto-k.  Power-of-two sizing keeps sizes predictable
    across shards (filters only merge when m matches)."""
    if n_keys < 0:
        raise ValueError(f"n_keys must be >= 0, got {n_keys}")
    need = max(int(n_keys) * bits_per_key, floor_bits)
    m = floor_bits
    while m < need:
        m <<= 1
    return m


def derive_bloom_k(m_bits: int, n_keys: int) -> int:
    """Optimal hash count k = ln2 * m/n, clamped to [1, 8] (beyond 8
    the extra corpus-scan hash rows cost more than the FPR gain)."""
    if n_keys <= 0:
        return _BLOOM_K
    k = round(0.6931 * m_bits / n_keys)
    return max(1, min(8, k))


def _bloom_pos_expr(key: Column, j: int, m_bits: int) -> Column:
    """Bit position of hash ``j``: md5-derived 60-bit int mod m."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(f"bf{j}"), key.cast("string"))), 1, 15), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(m_bits))


def _bloom_pos_sql(key: str, j: int, m_bits: int) -> str:
    return (f"(('0x' || substr(md5('bf{j}:' || CAST({key} AS VARCHAR)), 1, 15))"
            f"::BIGINT % {m_bits})")


def bloom_build(df: DataFrame, key_col: str, m_bits: int = _BLOOM_M,
                k: int = _BLOOM_K) -> DataFrame:
    """Build the (word, bits) filter relation over a key column.  Empty
    words are materialized at 0 so the relation always has m/32 rows
    (stable shape for storage, merge, and the differential gate)."""
    # all k positions in ONE projection + explode: one corpus scan,
    # not k (a unionAll of per-j selects re-reads the input per hash)
    pos_arr = F.array(*[
        _bloom_pos_expr(F.col(key_col), j, m_bits) for j in range(k)])
    got = (
        df.select(F.explode(pos_arr).alias("pos"))
        .select((F.col("pos") / 32).cast("bigint").alias("word"),
                F.pmod(F.col("pos"), F.lit(32)).cast("int").alias("bit"))
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
             .alias("bits"))
    )
    spark = df.sparkSession
    all_w = spark.range(m_bits // 32).select(F.col("id").alias("word"))
    return (
        all_w.join(got, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0)).cast("bigint").alias("bits"))
    )


def bloom_build_sql(table_sql: str, key_col: str, m_bits: int = _BLOOM_M,
                    k: int = _BLOOM_K) -> str:
    pos = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(key_col, j, m_bits)} AS pos FROM src"
        for j in range(k))
    return f"""
WITH src AS ({table_sql}),
pos AS ({pos}),
got AS (
  SELECT CAST(pos // 32 AS BIGINT) AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
),
all_w AS (SELECT unnest(range({m_bits // 32})) AS word)
SELECT all_w.word, CAST(COALESCE(bits, 0) AS BIGINT) AS bits
FROM all_w LEFT JOIN got USING (word)
"""


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge filters built with the same (m, k): elementwise bit_or —
    per-shard/per-day filters roll up losslessly (the result is
    EXACTLY the filter of the unioned key sets)."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    u = filters[0]
    for t in filters[1:]:
        u = u.unionByName(t)
    return u.groupBy("word").agg(
        F.bit_or("bits").cast("bigint").alias("bits"))


def bloom_probe(batch: DataFrame, key_col: str, bloom: DataFrame,
                id_col: str, m_bits: int = _BLOOM_M,
                k: int = _BLOOM_K, *, validate: bool = False,
                broadcast_max_words: int = _BLOOM_BROADCAST_MAX_WORDS,
                ) -> DataFrame:
    """Probe a batch against a filter: (id, maybe_present).  False ->
    DEFINITELY not in the corpus (skip the exact join); true -> maybe
    (fall through to exact verification).

    Join strategy is size-thresholded on ``m_bits``: filters up to
    ``broadcast_max_words`` words (default 2^21 = 32 MB) broadcast —
    no shuffle of the batch; larger filters (a 10^10-key corpus at
    10 bits/key is ~3 G words) shuffle-join on ``word`` instead, so
    the probe never attempts a multi-GB broadcast.

    ``validate=True`` runs one cheap count over the word relation and
    raises if it doesn't equal ``m_bits // 32`` — the guard against
    probing a persisted filter with mismatched parameters, which would
    otherwise silently break the no-false-negative contract.  The
    engine facade validates via the persisted meta sidecar instead
    (zero extra jobs); pass True here when probing a bare relation of
    uncertain provenance."""
    if validate:
        n_words = bloom.count()
        if n_words != m_bits // 32:
            raise ValueError(
                f"bloom filter shape mismatch: relation has {n_words} words "
                f"but m_bits={m_bits} implies {m_bits // 32} — the filter "
                f"was built with different parameters; probing it would "
                f"return wrong verdicts (including false negatives)")
    side = (F.broadcast(bloom) if m_bits // 32 <= broadcast_max_words
            else bloom)
    # one batch scan: k positions per row via explode (see bloom_build)
    pos_arr = F.array(*[
        _bloom_pos_expr(F.col(key_col), j, m_bits) for j in range(k)])
    probed = (
        batch.select(F.col(id_col).alias("__id"), F.explode(pos_arr).alias("pos"))
        .select("__id", (F.col("pos") / 32).cast("bigint").alias("word"),
                F.pmod(F.col("pos"), F.lit(32)).cast("int").alias("bit"))
        .join(side, "word", "left")
        .select("__id",
                F.expr("shiftright(COALESCE(bits, CAST(0 AS BIGINT)), bit) & 1")
                .alias("hit"))
    )
    return (
        probed.groupBy("__id")
        .agg((F.min("hit") == 1).alias("maybe_present"))
        .select(F.col("__id").alias(id_col), "maybe_present")
    )


def bloom_write(bloom: DataFrame, path: str, m_bits: int, k: int,
                n_keys_est: int | None = None) -> None:
    """Persist a filter WITH its parameters: the word relation at
    ``path``, a one-row meta sidecar at ``path + "_meta"`` (m_bits, k,
    and the NDV estimate it was sized for).  Probing a reloaded filter
    through the sidecar makes parameter mismatch impossible — a bare
    (word, bits) parquet says nothing about the m/k it was built with,
    and a mismatched probe silently breaks the no-false-negative
    contract."""
    spark = bloom.sparkSession
    bloom.write.mode("overwrite").parquet(path)
    meta = literal_df(spark, 
        [(int(m_bits), int(k),
          int(n_keys_est) if n_keys_est is not None else None)],
        "m_bits BIGINT, k INT, n_keys_est BIGINT")
    meta.coalesce(1).write.mode("overwrite").parquet(path + "_meta")


def bloom_read(spark, path: str) -> tuple[DataFrame, int, int]:
    """Reload a persisted filter as (words, m_bits, k).  Raises if the
    meta sidecar is missing — probe parameters must never be guessed."""
    words = spark.read.parquet(path)
    try:
        meta = spark.read.parquet(path + "_meta").first()
    except Exception as exc:  # AnalysisException: path not found
        raise ValueError(
            f"no bloom meta sidecar at {path}_meta — this filter was "
            f"persisted without parameters; rebuild it via "
            f"engine.build_membership_filter or sketch.bloom_write") from exc
    return words, int(meta["m_bits"]), int(meta["k"])


def bloom_probe_sql(batch_sql: str, key_col: str, bloom_sql: str,
                    id_col: str, m_bits: int = _BLOOM_M,
                    k: int = _BLOOM_K) -> str:
    probes = " UNION ALL ".join(
        f"SELECT {id_col} AS __id, {_bloom_pos_sql(key_col, j, m_bits)} AS pos "
        f"FROM batch" for j in range(k))
    return f"""
WITH batch AS ({batch_sql}),
bloom AS ({bloom_sql}),
probes AS ({probes}),
hits AS (
  SELECT __id,
         ((COALESCE(bits, 0) >> CAST(pos % 32 AS INT)) & 1) AS hit
  FROM (SELECT __id, CAST(pos // 32 AS BIGINT) AS word, pos FROM probes)
  LEFT JOIN bloom USING (word)
)
SELECT __id AS {id_col}, MIN(hit) = 1 AS maybe_present
FROM hits GROUP BY 1
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) sketch: a MERGEABLE, DETERMINISTIC
# uniform sample of a key domain.  Keep the k smallest md5 hashes of
# the distinct keys; because md5 is a fixed function the sketch is a
# pure function of the key SET — the same rows on any engine, any
# partitioning, any day (unlike sample()/TABLESAMPLE, which are
# seed-and-split dependent).  Three uses:
#
#   * uniform distinct-key sample for profiling (each distinct key is
#     equally likely to land in the bottom k);
#   * NDV estimation: ndv ~= (k-1) / U(h_k) where U(h_k) is the k-th
#     smallest hash as a fraction of the hash space (Bar-Yossef 2002);
#   * lossless rollup: union of per-shard/per-day sketches re-topped
#     to k IS the sketch of the unioned key sets (bottom-k of a union
#     is the bottom-k of the per-part bottom-k's), same lifecycle as
#     hll_merge / bloom_merge.
#
# Scale shape: the naive build is distinct(hkey) -> sort -> limit k —
# the distinct is a partial-aggregated shuffle of every distinct key.
# For corpora where that shuffle is the cost (10^9+ NDV), pass
# ``expected_ndv`` (e.g. from :func:`hll_estimate`): a hash-prefix
# pre-filter keeps only ~oversample*k candidate keys BEFORE the
# distinct, so the shuffle carries a few thousand rows regardless of
# corpus size.  The pre-filter is probabilistically safe: the k-th
# smallest of n hashes exceeds the bound (oversample*k expected
# survivors) with probability < e^(-k*(oversample-1)^2/(2*oversample))
# (Chernoff) — at k=256, oversample=8 that is ~1e-340.  The failure is
# also DETECTABLE: a pre-filtered sketch with fewer than k rows while
# the NDV estimate says >= k distinct keys exist means the bound cut
# into the bottom-k; rebuild without the pre-filter.
#
# The hash order key is the full 32-hex md5 string (hex strings of
# equal length sort identically as strings in Spark and DuckDB); the
# numeric estimator uses the leading 15 hex digits (60 bits) as the
# position in [0, 16^15) — integer-exact in BIGINT on both engines.
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SPACE = 16 ** 15  # hash-space size of the 15-hex-digit prefix


def _kmv_hnum_expr(hkey: Column) -> Column:
    return F.conv(F.substring(hkey, 1, 15), 16, 10).cast("bigint")


def kmv_build(df: DataFrame, key_col: str, k: int = _KMV_K,
              expected_ndv: int | None = None,
              oversample: int = 8) -> DataFrame:
    """Bottom-k sketch relation (hkey, key): the k smallest distinct
    md5 hashes of ``key_col`` with their raw (stringified) keys.  NULL
    keys are ignored (a NULL is not a key).  With ``expected_ndv`` the
    pre-filter bounds the distinct shuffle at ~oversample*k rows (see
    module comment for the safety argument)."""
    keyed = (df.select(F.col(key_col).cast("string").alias("key"))
             .where(F.col("key").isNotNull())
             .select(F.md5("key").alias("hkey"), "key"))
    if expected_ndv is not None and expected_ndv > oversample * k:
        frac = (oversample * k) / float(expected_ndv)
        bound = int(frac * _KMV_SPACE) + 1
        keyed = keyed.where(_kmv_hnum_expr(F.col("hkey")) < F.lit(bound))
    # md5 is a function of key, so dropDuplicates on hkey alone is
    # deterministic (every surviving row carries the same key)
    return keyed.dropDuplicates(["hkey"]).orderBy("hkey").limit(k)


def kmv_build_sql(table_sql: str, key_col: str, k: int = _KMV_K) -> str:
    return f"""
WITH src AS ({table_sql}),
keyed AS (
  SELECT DISTINCT md5(CAST({key_col} AS VARCHAR)) AS hkey,
         CAST({key_col} AS VARCHAR) AS key
  FROM src WHERE {key_col} IS NOT NULL
)
SELECT hkey, key FROM keyed ORDER BY hkey LIMIT {k}
"""


def kmv_merge(*sketches: DataFrame, k: int = _KMV_K) -> DataFrame:
    """Merge sketches built over the same hash function: union, dedup,
    re-top-k.  Exactly the sketch of the unioned key sets."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    u = sketches[0]
    for t in sketches[1:]:
        u = u.unionByName(t)
    return u.dropDuplicates(["hkey"]).orderBy("hkey").limit(k)


def kmv_ndv(sketch: DataFrame, k: int = _KMV_K) -> DataFrame:
    """NDV estimate from a bottom-k sketch: exact count when the
    domain fit inside k, else (k-1) / U(h_k).  One row
    (ndv_estimate BIGINT).  All inputs to the double division are
    integer-exact, so the floor() result is cross-engine identical."""
    agg = sketch.agg(
        F.count("*").alias("n"),
        F.max(_kmv_hnum_expr(F.col("hkey"))).alias("hmax"))
    est = F.floor(F.lit(float(k - 1)) * F.lit(float(_KMV_SPACE))
                  / F.col("hmax").cast("double"))
    return agg.select(
        F.when(F.col("n") < k, F.col("n").cast("bigint"))
        .otherwise(est.cast("bigint")).alias("ndv_estimate"))


def kmv_ndv_sql(sketch_sql: str, k: int = _KMV_K) -> str:
    return f"""
WITH s AS ({sketch_sql}),
agg AS (
  SELECT COUNT(*) AS n,
         MAX(('0x' || substr(hkey, 1, 15))::BIGINT) AS hmax
  FROM s
)
SELECT CAST(CASE WHEN n < {k} THEN n
            ELSE floor({float(k - 1)} * {float(_KMV_SPACE)} / CAST(hmax AS DOUBLE))
       END AS BIGINT) AS ndv_estimate
FROM agg
"""


# ---------------------------------------------------------------------------
# Fixed-range histogram sketch: the quantile member of the sketch
# family (CMS = frequency, HLL/KMV = NDV, Bloom = membership, KMV =
# distinct-key sample).  A (bin, cnt) relation over a declared value
# range: build is ONE partial-aggregated groupBy into <= nbins rows,
# merge is elementwise SUM (lossless rollup across shards/days —
# exactly the histogram of the concatenated data), quantiles come from
# the cumulative distribution with linear interpolation inside the
# bin.  Unlike percentile()/approx_percentile this summarizes once and
# answers forever — per-day histograms roll forward without re-reading
# data, the same lifecycle as hll_registers/bloom_build.
#
# All binning is integer-exact-input double math (identical on any
# engine); out-of-range values clamp to the edge bins so the relation
# always accounts for every non-NULL row (cnt sums to the row count —
# pick [lo, hi) from known bounds or a prior min/max pass).
# ---------------------------------------------------------------------------

def _hist_bin_expr(col: str, lo: float, hi: float, nbins: int) -> str:
    if not hi > lo:
        raise ValueError(f"histogram range must satisfy hi > lo, got [{lo}, {hi})")
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    return (f"least({nbins - 1}, greatest(0, CAST(floor("
            f"(CAST({col} AS DOUBLE) - {float(lo)}) * {float(nbins)}"
            f" / {float(hi - lo)}) AS BIGINT)))")


def hist_build(df: DataFrame, col: str, lo: float, hi: float,
               nbins: int = 128) -> DataFrame:
    """(bin, cnt) histogram relation; every bin materialized (stable
    shape for storage/merge/the differential gate).  NULLs ignored."""
    got = (df.where(F.col(col).isNotNull())
           .select(F.expr(_hist_bin_expr(col, lo, hi, nbins)).alias("bin"))
           .groupBy("bin").agg(F.count("*").alias("cnt")))
    all_b = df.sparkSession.range(nbins).select(F.col("id").alias("bin"))
    return (all_b.join(got, "bin", "left")
            .select("bin", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")))


def hist_build_sql(table_sql: str, col: str, lo: float, hi: float,
                   nbins: int = 128) -> str:
    b = (f"LEAST({nbins - 1}, GREATEST(0, CAST(floor("
         f"(CAST({col} AS DOUBLE) - {float(lo)}) * {float(nbins)}"
         f" / {float(hi - lo)}) AS BIGINT)))")
    return f"""
WITH src AS ({table_sql}),
got AS (
  SELECT {b} AS bin, COUNT(*) AS cnt FROM src
  WHERE {col} IS NOT NULL GROUP BY 1
),
all_b AS (SELECT unnest(range({nbins})) AS bin)
SELECT all_b.bin, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt
FROM all_b LEFT JOIN got USING (bin)
"""


def hist_merge(*hists: DataFrame, group_col: str | None = None) -> DataFrame:
    """Merge histograms built with the same (lo, hi, nbins):
    elementwise count sum — the histogram of the unioned data.  Pass
    ``group_col`` for hist_by relations (sparse rows sum per
    (group, bin); bins absent everywhere stay implicit)."""
    if not hists:
        raise ValueError("hist_merge needs at least one histogram")
    u = hists[0]
    for t in hists[1:]:
        u = u.unionByName(t)
    keys = ["bin"] if group_col is None else [group_col, "bin"]
    return u.groupBy(*keys).agg(F.sum("cnt").cast("bigint").alias("cnt"))


def hist_quantiles(hist: DataFrame, ps: list[float], lo: float, hi: float,
                   nbins: int = 128) -> DataFrame:
    """Quantile estimates from the sketch: (p, value) per requested
    quantile, linear interpolation inside the covering bin (error
    bounded by one bin width).  Runs over the <= nbins relation — a
    driver-light plan regardless of the summarized corpus size."""
    from pyspark.sql.window import Window

    width = (hi - lo) / float(nbins)
    cum = (hist.select(
        "bin", "cnt",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum")))
    total = hist.agg(F.sum("cnt").alias("total"))
    # all requested quantiles in ONE pass over the cumulative relation
    # (a per-p union would recompute cum/total per quantile); covering
    # bin = first bin whose cumulative count reaches p*total
    psdf = hist.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"))
    hit = (psdf.crossJoin(cum).crossJoin(total)
           .where((F.col("cum") >= F.col("p") * F.col("total"))
                  & (F.col("cnt") > 0)))
    w = Window.partitionBy("p").orderBy("bin")
    return (hit.withColumn("rn", F.row_number().over(w)).where("rn = 1")
            .select(
                "p",
                (F.lit(float(lo)) + (F.col("bin")
                 + (F.col("p") * F.col("total")
                    - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
                 * F.lit(width)).alias("value")))


def hist_quantiles_sql(hist_sql: str, ps: list[float], lo: float, hi: float,
                       nbins: int = 128) -> str:
    width = (hi - lo) / float(nbins)
    arms = " UNION ALL ".join(
        f"SELECT CAST({float(p)} AS DOUBLE) AS p" for p in ps)
    return f"""
WITH h AS ({hist_sql}),
cum AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
tot AS (SELECT SUM(cnt) AS total FROM h),
ps AS ({arms}),
hit AS (
  SELECT p, bin, cnt, cum, total,
         ROW_NUMBER() OVER (PARTITION BY p ORDER BY bin) AS rn
  FROM ps CROSS JOIN cum CROSS JOIN tot
  WHERE cum >= p * total AND cnt > 0
)
SELECT p, {float(lo)} + (bin + (p * total - (cum - cnt)) / cnt) * {width} AS value
FROM hit WHERE rn = 1
"""


def hist_by(df: DataFrame, group_col: str, col: str, lo: float, hi: float,
            nbins: int = 128, weight_col: str | None = None) -> DataFrame:
    """Per-group histogram (group, bin, cnt) — one partial-aggregated
    groupBy into <= nbins rows PER GROUP, the grouped form of
    hist_build (same recipe as hll_ndv_by vs hll_estimate).  Only
    OBSERVED bins materialize: a group x nbins spine would explode at
    scale and empty bins are implicit zeros for every downstream use
    (merge sums sparse rows; quantile cumulation skips zero bins).
    ``weight_col`` (integer) histograms a weighted quantity — e.g. the
    token-length distribution weighted by tokens — cnt = SUM(weight)
    instead of row count."""
    agg = (F.count("*") if weight_col is None
           else F.sum(weight_col)).cast("bigint").alias("cnt")
    return (df.where(F.col(col).isNotNull())
            .select(F.col(group_col),
                    F.expr(_hist_bin_expr(col, lo, hi, nbins)).alias("bin"),
                    *([F.col(weight_col)] if weight_col else []))
            .groupBy(group_col, "bin").agg(agg))


def hist_by_sql(table_sql: str, group_col: str, col: str, lo: float,
                hi: float, nbins: int = 128,
                weight_col: str | None = None) -> str:
    b = (f"LEAST({nbins - 1}, GREATEST(0, CAST(floor("
         f"(CAST({col} AS DOUBLE) - {float(lo)}) * {float(nbins)}"
         f" / {float(hi - lo)}) AS BIGINT)))")
    agg = "COUNT(*)" if weight_col is None else f"SUM({weight_col})"
    return f"""
WITH src AS ({table_sql})
SELECT {group_col}, {b} AS bin, CAST({agg} AS BIGINT) AS cnt
FROM src WHERE {col} IS NOT NULL
GROUP BY 1, 2
"""


def hist_quantiles_by(hist: DataFrame, group_col: str, ps: list[float],
                      lo: float, hi: float, nbins: int = 128) -> DataFrame:
    """Per-group quantiles from a hist_by relation: (group, p, value).
    Windows run over the sparse <= nbins-per-group relation — the plan
    cost scales with distinct groups, never with the summarized
    corpus."""
    from pyspark.sql.window import Window

    width = (hi - lo) / float(nbins)
    wg = Window.partitionBy(group_col)
    cum = hist.select(
        group_col, "bin", "cnt",
        F.sum("cnt").over(wg.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(wg).alias("total"))
    psdf = hist.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"))
    hit = (cum.crossJoin(psdf)
           .where((F.col("cum") >= F.col("p") * F.col("total"))
                  & (F.col("cnt") > 0)))
    w = Window.partitionBy(group_col, "p").orderBy("bin")
    return (hit.withColumn("rn", F.row_number().over(w)).where("rn = 1")
            .select(
                group_col, "p",
                (F.lit(float(lo)) + (F.col("bin")
                 + (F.col("p") * F.col("total")
                    - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
                 * F.lit(width)).alias("value")))


def hist_quantiles_by_sql(hist_sql: str, group_col: str, ps: list[float],
                          lo: float, hi: float, nbins: int = 128) -> str:
    width = (hi - lo) / float(nbins)
    arms = " UNION ALL ".join(
        f"SELECT CAST({float(p)} AS DOUBLE) AS p" for p in ps)
    return f"""
WITH h AS ({hist_sql}),
cum AS (
  SELECT {group_col}, bin, cnt,
         SUM(cnt) OVER (PARTITION BY {group_col} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {group_col}) AS total
  FROM h
),
ps AS ({arms}),
hit AS (
  SELECT {group_col}, p, bin, cnt, cum, total,
         ROW_NUMBER() OVER (PARTITION BY {group_col}, p ORDER BY bin) AS rn
  FROM cum CROSS JOIN ps
  WHERE cum >= p * total AND cnt > 0
)
SELECT {group_col}, p,
       {float(lo)} + (bin + (p * total - (cum - cnt)) / cnt) * {width} AS value
FROM hit WHERE rn = 1
"""


def kmv_by(df: DataFrame, group_col: str, key_col: str,
           k: int = 64) -> DataFrame:
    """Per-group bottom-k sketch (group, hkey, key): the k smallest
    distinct key hashes WITHIN each group — a deterministic uniform
    distinct-key sample per group (per-source document samples, per-day
    spot-check sets), the grouped form of kmv_build.  Merge = union +
    kmv_by again on the union of sketch rows (bottom-k per group of a
    union is the bottom-k of per-part bottom-k's).  Two shuffles: the
    (group, hash) dedup partial-agg and the per-group top-k window —
    both carry hashes, never payloads."""
    from pyspark.sql.window import Window

    keyed = (df.select(F.col(group_col),
                       F.col(key_col).cast("string").alias("key"))
             .where(F.col("key").isNotNull())
             .select(group_col, F.md5("key").alias("hkey"), "key")
             .dropDuplicates([group_col, "hkey"]))
    w = Window.partitionBy(group_col).orderBy("hkey")
    return (keyed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn"))


def kmv_by_sql(table_sql: str, group_col: str, key_col: str,
               k: int = 64) -> str:
    return f"""
WITH src AS ({table_sql}),
keyed AS (
  SELECT DISTINCT {group_col}, md5(CAST({key_col} AS VARCHAR)) AS hkey,
         CAST({key_col} AS VARCHAR) AS key
  FROM src WHERE {key_col} IS NOT NULL
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY hkey) AS rn
  FROM keyed
)
SELECT {group_col}, hkey, key FROM rk WHERE rn <= {k}
"""


def kmv_overlap_matrix(sketch: DataFrame, group_col: str,
                       k: int = 64, built_k: int | None = None) -> DataFrame:
    """Pairwise key-overlap estimates between groups from their KMV
    sketches — the "how much do my sources share?" dashboard matrix a
    mixing decision reads before weighting corpora (cross-source
    boilerplate, mirrored dumps, common-crawl re-crawls).

    ``sketch`` is the per-group bottom-k relation from :func:`kmv_by`
    (group, hkey, key), built ONCE per source/day and persisted; this
    function never touches the raw corpus.  For every unordered group
    pair the estimator is the standard KMV set-operation form
    (Beyer et al. 2007): take the k smallest distinct hashes of the
    UNION of the two sketches; of those, the fraction present in both
    sides estimates the Jaccard similarity.  ``jaccard_ppm`` =
    floor(n_common * 1e6 / k_used) — pure integer arithmetic, so the
    relation is bit-identical cross-engine given identical sketches
    (which kmv_by guarantees: md5 hash order is engine-free).

    Scale shape: the input is <= G*k sketch rows for G groups — the
    pair expansion is (G^2/2)*2k rows AT MOST, independent of corpus
    size (G=10^3 sources at k=64 is ~32M tiny rows, one shuffle).  The
    group list is derived from the sketch itself and broadcast; no
    corpus read, no driver collect.

    ``k`` must not exceed the k the sketch was BUILT with: union
    bottom-k is only covered by each side's bottom-k' when k <= k'
    (hashes past a truncated side's coverage would get in_x = 0 and
    silently deflate n_common — the same mismatched-parameter hazard
    bloom_probe guards with its meta sidecar).  Pass ``built_k`` to
    assert the build parameter; without it a one-agg runtime check
    over the (already materialized, G*k-row) sketch raises when ``k``
    exceeds the widest per-group sketch — conservative for corpora
    whose sketches are all unsaturated (every group's full distinct
    set fits under its build k, where any ``k`` would in fact be
    exact), so callers that KNOW the build k should pass it.
    """
    from pyspark.sql.window import Window

    # the sketch feeds FOUR legs (two group lists, two hash sides);
    # without truncation each leg re-runs the sketch build — at scale
    # that is four corpus scans for a G*k-row relation.  localCheckpoint
    # materializes the tiny sketch once and every leg reads the leaf
    # (measured: 6 parquet scans -> 1 on the q240 gate plan).
    sketch = sketch.localCheckpoint()
    if built_k is not None:
        if k > built_k:
            raise ValueError(
                f"kmv_overlap_matrix k={k} exceeds the sketch's build "
                f"k={built_k}: union bottom-{k} is not covered by "
                f"bottom-{built_k} sides and n_common would deflate")
    else:
        widest = (sketch.groupBy(group_col).count()
                  .agg(F.max("count")).first()[0]) or 0
        if k > widest:
            raise ValueError(
                f"kmv_overlap_matrix k={k} exceeds the widest per-group "
                f"sketch ({widest} rows): the sketch may have been built "
                f"with a smaller k, which would deflate n_common — pass "
                f"built_k=<the kmv_by k> to assert coverage")
    a = sketch.select(F.col(group_col).alias("g_a"), "hkey")
    b = sketch.select(F.col(group_col).alias("g_b"), "hkey")
    ga = a.select("g_a").distinct()
    gb = b.select("g_b").distinct()
    # non-equi pair expansion over the tiny distinct-group relations:
    # broadcast the right side so this is a BroadcastNestedLoopJoin,
    # never a shuffled cartesian
    pairs = ga.join(F.broadcast(gb), F.col("g_a") < F.col("g_b"))
    ua = (pairs.join(F.broadcast(a), "g_a")
          .select("g_a", "g_b", "hkey",
                  F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    ub = (pairs.join(F.broadcast(b), "g_b")
          .select("g_a", "g_b", "hkey",
                  F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    u = (ua.unionByName(ub)
         .groupBy("g_a", "g_b", "hkey")
         .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("g_a", "g_b").orderBy("hkey")
    topk = u.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return (topk.groupBy("g_a", "g_b")
            .agg(F.count("*").cast("bigint").alias("k_used"),
                 F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_common"))
            .select("g_a", "g_b", "k_used", "n_common",
                    F.floor(F.col("n_common") * F.lit(1000000)
                            / F.col("k_used")).cast("bigint").alias("jaccard_ppm")))


def kmv_overlap_pairs(sketch: DataFrame, group_col: str,
                      k: int = 64, built_k: int | None = None) -> DataFrame:
    """SPARSE form of :func:`kmv_overlap_matrix` for large group
    counts: emits rows ONLY for group pairs whose sketches share at
    least one hash (absent pair == estimated Jaccard 0), so the cost
    scales with the OVERLAP structure instead of G².

    The dense matrix expands (G²/2)·2k rows for every pair whether or
    not they share anything — fine to G ≈ 10³ sources (the documented
    watch item), impossible at G = 10⁶ (5·10¹¹ pairs before a single
    estimate).  Here candidate pairs come from ONE equi-join of the
    sketch against itself on the hash value (the inverted-index trick:
    shuffle volume is Σ_h c_h² over per-hash group counts — zero for
    disjoint sources, bounded by sharing, never G²), and the exact
    union-bottom-k estimator then runs only for candidates.  Same
    estimator, same integer jaccard_ppm, same validation; a candidate
    whose shared hashes all fall beyond the union bottom-k keeps its
    row with n_common = 0 (it was proposed, and estimated 0).

    Identity contract (unit-tested): every dense-matrix row with
    n_common > 0 appears here with identical values; every row here
    equals its dense counterpart."""
    sketch = sketch.localCheckpoint()
    if built_k is not None:
        if k > built_k:
            raise ValueError(
                f"kmv_overlap_pairs k={k} exceeds the sketch's build "
                f"k={built_k}: union bottom-{k} is not covered by "
                f"bottom-{built_k} sides and n_common would deflate")
    else:
        widest = (sketch.groupBy(group_col).count()
                  .agg(F.max("count")).first()[0]) or 0
        if k > widest:
            raise ValueError(
                f"kmv_overlap_pairs k={k} exceeds the widest per-group "
                f"sketch ({widest} rows): the sketch may have been built "
                f"with a smaller k, which would deflate n_common — pass "
                f"built_k=<the kmv_by k> to assert coverage")
    a = sketch.select(F.col(group_col).alias("g_a"), "hkey")
    b = sketch.select(F.col(group_col).alias("g_b"), "hkey")
    cand = (a.join(b, "hkey")
            .where(F.col("g_a") < F.col("g_b"))
            .select("g_a", "g_b").distinct())
    ua = (cand.join(a, "g_a")
          .select("g_a", "g_b", "hkey",
                  F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    ub = (cand.join(b, "g_b")
          .select("g_a", "g_b", "hkey",
                  F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    from pyspark.sql.window import Window

    u = (ua.unionByName(ub)
         .groupBy("g_a", "g_b", "hkey")
         .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("g_a", "g_b").orderBy("hkey")
    topk = u.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return (topk.groupBy("g_a", "g_b")
            .agg(F.count("*").cast("bigint").alias("k_used"),
                 F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_common"))
            .select("g_a", "g_b", "k_used", "n_common",
                    F.floor(F.col("n_common") * F.lit(1000000)
                            / F.col("k_used")).cast("bigint").alias("jaccard_ppm")))


def kmv_overlap_pairs_sql(sketch_sql: str, group_col: str,
                          k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_overlap_pairs`."""
    return f"""
WITH sk AS ({sketch_sql}),
cand AS (
  SELECT DISTINCT a.{group_col} AS g_a, b.{group_col} AS g_b
  FROM sk a JOIN sk b ON a.hkey = b.hkey AND a.{group_col} < b.{group_col}
),
u AS (
  SELECT g_a, g_b, hkey, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT c.g_a, c.g_b, s.hkey, 1 AS in_a, 0 AS in_b
    FROM cand c JOIN sk s ON s.{group_col} = c.g_a
    UNION ALL
    SELECT c.g_a, c.g_b, s.hkey, 0 AS in_a, 1 AS in_b
    FROM cand c JOIN sk s ON s.{group_col} = c.g_b
  ) GROUP BY 1, 2, 3
),
topk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY g_a, g_b ORDER BY hkey) AS rn
  FROM u
)
SELECT g_a, g_b,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
       CAST(floor(SUM(in_a * in_b) * 1000000.0 / COUNT(*)) AS BIGINT) AS jaccard_ppm
FROM topk WHERE rn <= {k}
GROUP BY g_a, g_b
"""


def kmv_overlap_matrix_sql(sketch_sql: str, group_col: str,
                           k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_overlap_matrix` over the same
    ``kmv_by_sql`` sketch relation."""
    return f"""
WITH sk AS ({sketch_sql}),
pairs AS (
  SELECT a.g AS g_a, b.g AS g_b
  FROM (SELECT DISTINCT {group_col} AS g FROM sk) a
  JOIN (SELECT DISTINCT {group_col} AS g FROM sk) b ON a.g < b.g
),
u AS (
  SELECT g_a, g_b, hkey, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.g_a, p.g_b, s.hkey, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.{group_col} = p.g_a
    UNION ALL
    SELECT p.g_a, p.g_b, s.hkey, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.{group_col} = p.g_b
  ) GROUP BY 1, 2, 3
),
topk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY g_a, g_b ORDER BY hkey) AS rn
  FROM u
)
SELECT g_a, g_b,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
       CAST(floor(SUM(in_a * in_b) * 1000000.0 / COUNT(*)) AS BIGINT) AS jaccard_ppm
FROM topk WHERE rn <= {k}
GROUP BY g_a, g_b
"""
