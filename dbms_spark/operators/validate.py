"""Data-validation rules: the constraint checks a migration
verification runs AFTER the row compare — referential integrity and
key uniqueness (the reference enforces these implicitly by comparing
against a source whose engine enforced them; on a lake target they
must be checked explicitly, reference discipline:
database/processor/data_compare_* verification pass).

Scale shapes: FK orphan detection is a left-anti join keyed on the FK
(broadcast when the parent is a dim, shuffle otherwise — Catalyst
picks); PK duplicate detection is one groupBy on the key columns with
a HAVING filter.  Both shuffle keys + counts, never whole rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from dbms_spark.plans.parallelism import literal_df


def fk_orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str,
               relation: str) -> DataFrame:
    """One-row summary for one FK relation: child rows whose ``fk`` has
    no matching ``pk`` in the parent (NULL FKs are not orphans — SQL FK
    semantics)."""
    orphans = (
        child.select(F.col(fk).alias("__fk")).filter(F.col("__fk").isNotNull())
        .join(parent.select(F.col(pk).alias("__fk")).distinct(), "__fk", "left_anti")
    )
    return orphans.agg(F.count(F.lit(1)).alias("orphan_rows")).select(
        F.lit(relation).alias("relation"),
        F.col("orphan_rows").cast("bigint").alias("orphan_rows"),
    )


def fk_orphan_report(relations: list[tuple[DataFrame, DataFrame, str, str, str]]) -> DataFrame:
    """Union of :func:`fk_orphans` over (child, parent, fk, pk, name)."""
    return reduce(DataFrame.unionAll,
                  [fk_orphans(c, p, fk, pk, name) for c, p, fk, pk, name in relations])


def fk_orphans_sql(child_table: str, parent_table: str, fk: str, pk: str,
                   relation: str) -> str:
    return f"""
SELECT '{relation}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS orphan_rows
FROM {child_table} c
WHERE c.{fk} IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM {parent_table} p WHERE p.{pk} = c.{fk})
"""


def pk_duplicates(df: DataFrame, key_cols: list[str], table: str) -> DataFrame:
    """One-row summary: key tuples appearing more than once, and the
    total surplus rows a dedup would remove."""
    dups = (
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
    )
    return dups.agg(
        F.count(F.lit(1)).alias("dup_keys"),
        F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("surplus_rows"),
    ).select(
        F.lit(table).alias("table_name"),
        F.col("dup_keys").cast("bigint").alias("dup_keys"),
        F.col("surplus_rows").cast("bigint").alias("surplus_rows"),
    )


def pk_duplicates_sql(table: str, key_cols: list[str]) -> str:
    keys = ", ".join(key_cols)
    return f"""
SELECT '{table}' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS dup_keys,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS surplus_rows
FROM (SELECT {keys}, COUNT(*) AS n FROM {table} GROUP BY {keys} HAVING COUNT(*) > 1)
"""


# ---------------------------------------------------------------------------
# Column-constraint rules: declarative NOT NULL / range / regex / set
# membership checks — the data-contract pass a lake target needs where
# a source database enforced these in-engine.
# ---------------------------------------------------------------------------

#: rule = (rule_name, column, kind, param); kinds: not_null,
#: min (numeric lower bound), max, regexp (full match), in_set (list)
ConstraintRule = tuple


def _rule_violation_expr(column: str, kind: str, param) -> F.Column:
    c = F.col(column)
    if kind == "not_null":
        return c.isNull()
    if kind == "min":
        return c.isNotNull() & (c < F.lit(param))
    if kind == "max":
        return c.isNotNull() & (c > F.lit(param))
    if kind == "regexp":
        return c.isNotNull() & ~c.cast("string").rlike(f"^(?:{param})$")
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(param))
    raise ValueError(f"unknown constraint kind {kind!r}")


def _rule_violation_sql(column: str, kind: str, param) -> str:
    if kind == "not_null":
        return f"{column} IS NULL"
    if kind == "min":
        return f"{column} IS NOT NULL AND {column} < {param}"
    if kind == "max":
        return f"{column} IS NOT NULL AND {column} > {param}"
    if kind == "regexp":
        return (f"{column} IS NOT NULL AND NOT regexp_full_match("
                f"CAST({column} AS VARCHAR), '{param}')")
    if kind == "in_set":
        vals = ", ".join(f"'{v}'" for v in param)
        return f"{column} IS NOT NULL AND {column} NOT IN ({vals})"
    raise ValueError(f"unknown constraint kind {kind!r}")


def check_constraints(df: DataFrame, rules: list[ConstraintRule]) -> DataFrame:
    """Violation counts per rule in ONE scan: each rule becomes a
    conditional-sum aggregate (no per-rule pass, no row shuffle), then
    unpivots to (rule_name, violations) rows."""
    aggs = [
        F.sum(F.when(_rule_violation_expr(col, kind, param), 1).otherwise(0))
        .cast("bigint").alias(f"__r{i}")
        for i, (_, col, kind, param) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    stacked = ", ".join(f"'{name}', __r{i}" for i, (name, *_rest) in enumerate(rules))
    return wide.selectExpr(
        f"stack({len(rules)}, {stacked}) AS (rule_name, violations)")


def check_constraints_sql(table: str, rules: list[ConstraintRule]) -> str:
    aggs = ", ".join(
        f"CAST(SUM(CASE WHEN {_rule_violation_sql(col, kind, param)} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS __r{i}"
        for i, (_, col, kind, param) in enumerate(rules)
    )
    arms = "\nUNION ALL ".join(
        f"SELECT '{name}' AS rule_name, __r{i} AS violations FROM s"
        for i, (name, *_rest) in enumerate(rules)
    )
    return f"WITH s AS (SELECT {aggs} FROM {table})\n{arms}"


def windowed_constraint_counts(stream: DataFrame, rules: list[ConstraintRule],
                               ts_col: str = "ts", window: str = "15 minutes",
                               watermark: str = "30 minutes") -> DataFrame:
    """Streaming data-contract monitor: per event-time window, the
    violation count of every rule — the live form of
    :func:`check_constraints` (same conditional-sum aggregates, one
    watermarked windowed groupBy; late data beyond the watermark is
    dropped by contract)."""
    aggs = [
        F.sum(F.when(_rule_violation_expr(col, kind, param), 1).otherwise(0))
        .cast("bigint").alias(name)
        for name, col, kind, param in rules
    ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), *[
            F.col(name) for name, *_ in rules])
    )


def sequence_gaps(df: DataFrame, id_col: str,
                  group_col: str | None = None) -> DataFrame:
    """Missing ranges in an integer key sequence: (gap_lo, gap_hi,
    n_missing) for every maximal run of absent ids strictly between
    the observed min and max — the "did the migration drop a batch?"
    screen a row-count compare can pass while whole id ranges are
    missing from the middle.  Pass ``group_col`` for per-group key
    spaces (sharded auto-increment, line numbers within an order):
    gaps are then detected WITHIN each group and reported with it —
    and the run windows partition by the group, so the grouped form
    is the more scalable one.

    Fully distributed islands, ONE code path for both forms: an id
    STARTS a present-run iff id-1 is absent and ENDS one iff id+1 is
    absent.  Every gap is (prev_end + 1, start − 1) for a run start
    and the LARGEST same-group run end below it, so no explicit
    run-pairing is needed — only that backward as-of lookup over the
    O(n_runs) starts/ends relation:

    (a) both flags come from ONE neighbor-vote exchange — each raw id
        votes (x: present), (x+1: your left neighbor exists), (x-1:
        your right neighbor exists); a max-flag groupBy dedups and
        answers both neighbor probes at once;
    (b) probes (tag 0: run starts) and anchors (tag 1: run ends) emit
        from a single conditional explode — one lineage, no
        re-derived legs;
    (c) the as-of is range-bucketed: ``repartitionByRange`` on
        (group…, pos, tag) — sampled boundaries stay balanced under
        ANY id distribution AND any group skew (a per-group window
        would put a hot tenant's 10⁷ runs through one task, exactly
        the hazard the old global form had) — each bucket takes a
        per-group running max of anchor ends, and a small per-
        (group, bucket) summary carries the max end across buckets
        (the only cross-bucket window, partitioned by group; ≤
        n_buckets + n_groups rows).

    At equal position the probe sorts first, so a singleton run
    (lo == hi) never sees its own end; positions collide only within
    one id, so the range key is unique and boundaries cannot split a
    tie group.  (A contiguous sequence is 1 run however many rows; a
    pathological alternating sequence degrades n_runs toward n/2 —
    at that point the GAP REPORT is O(n) because the answer is, and
    the cost matches the output's.)  Duplicates are tolerated (the
    flag aggregation dedups); NULL ids are ignored; a NULL group is
    one group, matching the SQL twin's PARTITION BY."""
    from pyspark.sql import Window

    g = [group_col] if group_col else []
    spark = df.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # the three votes ride ONE tinyint bitmask (s=1, lp=2, rp=4)
    # folded with bit_or — one aggregate buffer and 9 fewer bytes per
    # exploded row than the former three max()-ed int flags (guide
    # §2.3: shuffle fewer bytes; the map-side partial bit_or dedups
    # votes before the exchange exactly as the three maxes did)
    flags = (df.select(*g, F.col(id_col).cast("bigint").alias("cid"))
             .filter(F.col("cid").isNotNull())
             .select(*g, F.explode(F.array(
                 F.struct(F.col("cid").alias("cid"),
                          F.lit(1).cast("tinyint").alias("m")),
                 F.struct((F.col("cid") + 1).alias("cid"),
                          F.lit(2).cast("tinyint").alias("m")),
                 F.struct((F.col("cid") - 1).alias("cid"),
                          F.lit(4).cast("tinyint").alias("m")))).alias("v"))
             .select(*g, "v.*")
             .groupBy(*g, "cid").agg(F.bit_or("m").alias("m"))
             .select(*g, "cid",
                     (F.col("m").bitwiseAND(1)).alias("s"),
                     (F.col("m").bitwiseAND(2)).alias("lp"),
                     (F.col("m").bitwiseAND(4)).alias("rp")))
    ev = F.filter(F.array(
        F.when((F.col("s") == 1) & (F.col("lp") == 0), F.struct(
            F.col("cid").alias("pos"), F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("anc_hi"))),
        F.when((F.col("s") == 1) & (F.col("rp") == 0), F.struct(
            F.col("cid").alias("pos"), F.lit(1).alias("tag"),
            F.col("cid").alias("anc_hi")))), lambda x: x.isNotNull())
    # lazy checkpoint BEFORE the range shuffle (round 10, guide §1.2):
    # repartitionByRange runs a boundary-SAMPLING job over its child
    # and then the shuffle itself — without a pin the neighbor-vote
    # explode + bit_or aggregation executed twice (once for sampling,
    # once for real).  The sampling job is the materializing action;
    # the shuffle then reads the pinned blocks (q275 ~4.3 → ~3.2 s).
    runs = (flags.select(*g, F.explode(ev).alias("e"))
            .select(*g, "e.*")
            .localCheckpoint(eager=False))
    merged = (runs
              .repartitionByRange(n_buckets, *g, "pos", "tag")
              .withColumn("bkt", F.spark_partition_id()))
    bw = (Window.partitionBy("bkt", *g).orderBy("pos", "tag")
          .rowsBetween(Window.unboundedPreceding, 0))
    # lazy checkpoint: the probe leg and the carry summary BOTH read
    # this relation, and bkt comes from spark_partition_id() over a
    # sampled range shuffle — two independent re-executions could
    # sample different boundaries and disagree on bkt; pinning one
    # materialization makes the bucket ids definitionally consistent
    # (and exchange reuse an optimization, not a correctness
    # dependency) without an eager job at construction
    loc = (merged.withColumn("loc_hi", F.max("anc_hi").over(bw))
           .localCheckpoint(eager=False))
    # carry columns renamed up front: the carry derives from loc, so
    # same-name column refs in the join condition would resolve to
    # ONE attribute (the self-join trap) — distinct names sidestep it
    carry = (loc.groupBy("bkt", *g).agg(F.max("anc_hi").alias("bkt_hi"))
             .withColumn("below_hi", F.max("bkt_hi").over(
                 Window.partitionBy(*g).orderBy("bkt")
                 .rowsBetween(Window.unboundedPreceding, -1)))
             .select(F.col("bkt").alias("__c_bkt"),
                     *[F.col(c).alias(f"__c_{c}") for c in g],
                     "below_hi"))
    probes = loc.filter(F.col("tag") == 0)
    cond = F.col("bkt") == F.col("__c_bkt")
    for c in g:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__c_{c}"))
    carry = carry if g else F.broadcast(carry)
    return (probes.join(carry, cond, "left")
            .withColumn("prev_hi", F.greatest("loc_hi", "below_hi"))
            .filter(F.col("prev_hi").isNotNull())
            .select(*g,
                    (F.col("prev_hi") + 1).alias("gap_lo"),
                    (F.col("pos") - 1).alias("gap_hi"),
                    (F.col("pos") - F.col("prev_hi") - 1)
                    .cast("bigint").alias("n_missing")))


def sequence_gaps_sql(table: str, id_col: str,
                      group_col: str | None = None) -> str:
    """DuckDB twin of :func:`sequence_gaps` (windowed gaps-and-islands
    — an independent formulation: island id from id - DENSE_RANK)."""
    gsel = f"{group_col}, " if group_col else ""
    gpart = f"PARTITION BY {group_col} " if group_col else ""
    gby = f"{group_col}, " if group_col else ""
    return f"""
WITH ids AS (
  SELECT DISTINCT {gsel}CAST({id_col} AS BIGINT) AS cid FROM {table}
  WHERE {id_col} IS NOT NULL
),
isl AS (
  SELECT {gsel}cid,
         cid - DENSE_RANK() OVER ({gpart}ORDER BY cid) AS grp FROM ids
),
runs AS (
  SELECT {gsel}MIN(cid) AS lo, MAX(cid) AS hi FROM isl GROUP BY {gby}grp
),
g AS (
  SELECT {gsel}lag(hi) OVER ({gpart}ORDER BY lo) AS prev_hi, lo FROM runs
)
SELECT {gsel}prev_hi + 1 AS gap_lo, lo - 1 AS gap_hi,
       CAST(lo - prev_hi - 1 AS BIGINT) AS n_missing
FROM g WHERE prev_hi IS NOT NULL
"""


# Benford's law first-digit probabilities, log10(1 + 1/d) in ppm —
# public mathematical constants, rounded half-even to 6 dp so both
# engines carry identical literals and the gate stays hash-exact.
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910,
               5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_screen(df: DataFrame, col: str) -> DataFrame:
    """FIRST-DIGIT (Benford) screen: the leading significant digit
    distribution of a numeric column against Benford's law — the
    classic fabricated-numbers / synthetic-data / unit-mixing
    detector an assessment pack runs over money columns.  Natural
    multi-order-of-magnitude data tracks the law; uniform synthetics,
    capped prices, or injected rows bend specific digits.

    Returns one row per digit 1-9: (digit, n, obs_ppm, benford_ppm,
    abs_dev_ppm) — observed share, the law, and |obs − law|, all
    integer ppm; digits never observed report n = 0 (the spine is
    the 9-literal relation, so missing digits can't hide).

    The digit comes from the value's STRING form (first [1-9] char),
    not floor(x / 10^floor(log10 x)) — no libm, and zero/NULL/
    non-positive-significand rows drop out by having no [1-9] match.
    Caveat: both engines must render the value without scientific
    notation — true for DECIMAL columns and for doubles in ordinary
    ranges (the gate's money column); screen extreme-exponent
    doubles via a DECIMAL cast first.

    Shape: one map-side digit extraction + one ≤9-key partial agg;
    the spine join is a 9-row broadcast."""
    spark = df.sparkSession
    # nullif before the cast: zero/NULL values match no [1-9], and
    # CAST('' AS BIGINT) throws under ANSI instead of NULLing
    digit = F.expr(
        f"CAST(nullif(regexp_extract(CAST(abs(`{col}`) AS STRING),"
        f" '([1-9])', 1), '') AS BIGINT)")
    got = (df.select(digit.alias("digit"))
           .where(F.col("digit").isNotNull() & (F.col("digit") > 0))
           .groupBy("digit")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    spine = literal_df(spark, 
        sorted(BENFORD_PPM.items()), "digit bigint, benford_ppm bigint")
    total = got.agg(F.sum("n").cast("bigint").alias("__t"))
    return (spine.join(got, "digit", "left")
            .crossJoin(F.broadcast(total))
            .select("digit",
                    F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
                    F.expr("CAST(1000000 AS BIGINT) * coalesce(n, 0)"
                           " DIV __t").cast("bigint").alias("obs_ppm"),
                    "benford_ppm")
            .withColumn("abs_dev_ppm",
                        F.abs(F.col("obs_ppm") - F.col("benford_ppm"))
                        .cast("bigint")))


def benford_screen_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`benford_screen`."""
    spine = " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS digit,"
        f" CAST({p} AS BIGINT) AS benford_ppm"
        for d, p in sorted(BENFORD_PPM.items()))
    return f"""
WITH spine AS ({spine}),
got AS (
  SELECT CAST(regexp_extract(CAST(abs({col}) AS VARCHAR), '([1-9])', 1)
              AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM {table}
  WHERE regexp_extract(CAST(abs({col}) AS VARCHAR), '([1-9])', 1) <> ''
  GROUP BY 1
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM got)
SELECT spine.digit, CAST(COALESCE(n, 0) AS BIGINT) AS n,
       CAST(CAST(1000000 AS BIGINT) * COALESCE(n, 0) // t.total AS BIGINT)
         AS obs_ppm,
       benford_ppm,
       CAST(abs(CAST(1000000 AS BIGINT) * COALESCE(n, 0) // t.total
                - benford_ppm) AS BIGINT) AS abs_dev_ppm
FROM spine LEFT JOIN got USING (digit), t
"""
