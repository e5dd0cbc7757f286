"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join handling (enabled in the session factory) covers
sort-merge joins at runtime; salting is the explicit-plan fallback for
(a) skewed aggregations, where one hot group key pins a reducer, and
(b) broadcast-averse skewed joins.  Pattern: spread the hot key across
``n_salts`` sub-keys, partial-aggregate, then merge — two small
shuffles instead of one stuck reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps column -> 'sum'|'count'|'min'|'max' or a LIST of
    those (the mergeable aggregates; avg = sum+count composed by the
    caller).  ``count`` has SQL COUNT(col) semantics — NULLs excluded;
    use the column key ``"*"`` for a row count (aliased
    ``count_rows``).  Stage 1 groups on (salt, keys) spreading a hot
    key over n_salts reducers; stage 2 merges the partials — its
    cardinality is |groups| x n_salts, tiny by construction.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    safe = lambda c: "rows" if c == "*" else c  # noqa: E731
    flat = [(c, fn) for c, fns in aggs.items()
            for fn in ([fns] if isinstance(fns, str) else fns)]
    stage1_aggs = []
    for c, fn in flat:
        if fn == "count":
            expr = F.count(F.lit(1)) if c == "*" else F.count(F.col(c))
            stage1_aggs.append(expr.alias(f"__p_{fn}_{safe(c)}"))
        elif fn in ("sum", "min", "max"):
            stage1_aggs.append(getattr(F, fn)(c).alias(f"__p_{fn}_{safe(c)}"))
        else:
            raise ValueError(f"non-mergeable aggregate {fn!r}")
    partial = salted.groupBy("__salt", *group_cols).agg(*stage1_aggs)
    merge = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    stage2_aggs = [
        getattr(F, merge[fn])(f"__p_{fn}_{safe(c)}").alias(f"{fn}_{safe(c)}")
        for c, fn in flat
    ]
    return partial.groupBy(*group_cols).agg(*stage2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the skewed (fact) side gets a random
    salt; the small (dim) side is exploded n_salts times so every
    (key, salt) partner exists.  Join key becomes (key, salt) —
    the hot key's rows spread over n_salts reducers.

    The dim side grows n_salts-fold — use only when it's far smaller
    than the skewed side (the same precondition as a broadcast, for
    cases where the dim is still too big to broadcast).
    """
    s = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    d = small.withColumn("__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})")))
    out = s.join(d, [on, "__salt"], how)
    return out.drop("__salt")


def top_keys(df: DataFrame, col: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: heaviest keys with counts and share — run this
    before choosing salting vs broadcast vs AQE-only.

    The denominator is a broadcast one-row scalar, NOT a global
    window: ``Window.partitionBy()`` funnels the whole per-key count
    relation into ONE task, and the high-cardinality skewed inputs
    this diagnostic exists for are exactly where that relation is
    huge."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            col, "cnt",
            (F.col("cnt").cast("double") / F.col("__total")).alias("share"),
        )
        .orderBy(F.desc("cnt"))
        .limit(n)
    )
