"""Data-scan / column profiling operators.

Re-expresses the reference's sampled NUMBER-classification scan
(reference: database/processor/data_scan_rule.go:150-168 CASE ladder,
scan rows database/processor/data_scan_row.go:51-200, block sampling
SAMPLE(pct) at :86-92) as declarative aggregations: integrality test
``x = floor(x)`` + range ladder, counted per category.

Sampling is deterministic (md5-prefix buckets) so profiles are
reproducible across engines and runs — the reference's Oracle
SAMPLE(pct) is block-random and not reproducible; determinism is a
deliberate improvement, not a divergence, and it's what makes the
DuckDB differential gate possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dbms_spark.plans.parallelism import literal_df

#: classification ladder mirroring the NUMBER precision mapping
#: (reference: database/mapping/oracle.go:30-250 — p<3 TINYINT,
#: 3<=p<5 SMALLINT, 5<=p<9 INT, 9<=p<19 BIGINT, else DECIMAL)
_LADDER = [
    ("TINYINT", -128, 127),
    ("SMALLINT", -32768, 32767),
    ("INT", -2147483648, 2147483647),
]


def classify_number_expr(x: Column) -> Column:
    """Category of a numeric value: smallest integer type that holds it
    exactly, else DECIMAL.  Integrality via x = floor(x) (portable;
    cast-based truncation rounds in some engines)."""
    is_int = x == F.floor(x)
    expr = F.when(~is_int, "DECIMAL")
    chain = None
    for name, lo, hi in _LADDER:
        cond = is_int & x.between(lo, hi)
        chain = F.when(cond, name) if chain is None else chain.when(cond, name)
    chain = chain.when(is_int, "BIGINT").otherwise("DECIMAL")
    return chain


def deterministic_sample(df: DataFrame, key: str, pct: float) -> DataFrame:
    """S5 sampled scan, reproducible: md5-prefix bucket of the key.
    ``pct`` in (0,100]; granularity 1/256."""
    threshold = max(1, round(256 * pct / 100.0))
    bucket = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 2), 16, 10).cast("bigint")
    return df.filter(bucket < threshold)


def profile_numbers(df: DataFrame, cols: list[str], sample_key: str | None = None,
                    sample_pct: float = 100.0) -> DataFrame:
    """Per-column classification counts: (col_name, category, cnt).
    One union'd pass; Catalyst prunes each leg to its single column."""
    base = df if sample_pct >= 100.0 else deterministic_sample(df, sample_key or cols[0], sample_pct)
    legs = [
        base.select(F.lit(c).alias("col_name"), F.col(c).alias("x"))
        for c in cols
    ]
    from functools import reduce

    stacked = reduce(DataFrame.unionAll, legs)
    return (
        stacked.select("col_name", classify_number_expr(F.col("x")).alias("category"))
        .groupBy("col_name", "category")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def profile_column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """General column profile: nulls, distinct (approx at scale), min/max
    — the scan-side statistics the reference stores per column."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__cnt"),
            F.count(c).alias(f"{c}__nonnull"),
            F.approx_count_distinct(c).alias(f"{c}__approx_distinct"),
        ]
    row = df.agg(*aggs).collect()[0]
    rows = [
        (c, row[f"{c}__cnt"], row[f"{c}__cnt"] - row[f"{c}__nonnull"], row[f"{c}__approx_distinct"])
        for c in cols
    ]
    return literal_df(df.sparkSession, 
        rows, "col_name string, cnt long, nulls long, approx_distinct long"
    )


def stratified_sample(df: DataFrame, stratum_col: str, key: str,
                      rates: dict[str, float]) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps rows whose
    md5-prefix bucket of ``key`` falls under that stratum's pct
    (granularity 1/256, like :func:`deterministic_sample`).  Strata
    absent from ``rates`` are dropped.

    The reproducible twin of ``df.sampleBy`` — what a training-data
    mixing pipeline needs when re-runs must produce the SAME subset
    (sampleBy's seed is engine-private; the md5 bucket is portable
    across engines, runs, and partitionings).  Map-side only."""
    bucket = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 2), 16, 10).cast("bigint")
    thr = None
    for s, pct in sorted(rates.items()):
        t = max(1, round(256 * pct / 100.0))
        cond = F.col(stratum_col) == s
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    return df.filter(bucket < thr.otherwise(F.lit(0)))


def stratified_sample_sql(table: str, stratum_col: str, key: str,
                          rates: dict[str, float]) -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {max(1, round(256 * pct / 100.0))}"
        for s, pct in sorted(rates.items())
    )
    return (
        f"SELECT * FROM {table} WHERE "
        f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 2))::BIGINT "
        f"< (CASE {stratum_col} {arms} ELSE 0 END)"
    )


#: Knuth multiplicative constant (2^32 / golden ratio)
_MULT_A = 2654435761


def mult_hash_bucket_expr(key: Column) -> Column:
    """Bucket in [0, 256) for NON-NEGATIVE integer keys via a Knuth
    multiplicative hash on the low 32 bits, with the multiply split so
    every intermediate stays under 2^63 (ANSI-safe; identical integer
    math in DuckDB via :func:`mult_hash_bucket_sql`).  ~6 integer ops
    per row where the md5-prefix filter pays a string cast + hash —
    the cheap sampling path for integer keys; md5 remains the general
    path."""
    a = key.cast("bigint") % 4294967296
    al, ah = a % 65536, (a / 65536).cast("bigint") % 65536
    prod = (al * _MULT_A) % 4294967296 + ((ah * _MULT_A) % 65536) * 65536
    return ((prod % 4294967296) / 16777216).cast("bigint")


def mult_hash_bucket_sql(key: str) -> str:
    return (
        f"((((({key} % 4294967296) % 65536) * {_MULT_A}) % 4294967296"
        f" + ((((({key} % 4294967296) // 65536) % 65536) * {_MULT_A}) % 65536) * 65536)"
        f" % 4294967296) // 16777216"
    )


def deterministic_sample_int(df: DataFrame, key: str, pct: float) -> DataFrame:
    """:func:`deterministic_sample` for non-negative integer keys —
    same 1/256 granularity, multiplicative hash instead of md5."""
    threshold = max(1, round(256 * pct / 100.0))
    return df.filter(mult_hash_bucket_expr(F.col(key)) < threshold)
