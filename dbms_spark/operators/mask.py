"""Deterministic data masking for migrate-to-nonprod flows.

A migration platform's sibling requirement: move production-shaped
data without production values.  Masking must be (a) deterministic —
two runs (or two engines) produce identical pseudonyms so referential
integrity and differential tests survive, (b) format-preserving enough
for downstream code, and (c) pure map-side (no shuffle, no state).

Everything here is md5-derived (common to both engines) — never
engine-native hash() or randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pseudonym_expr(col: Column, prefix: str = "ID_", width: int = 12) -> Column:
    """Deterministic opaque pseudonym: ``prefix`` + md5-prefix of the
    value.  Equal inputs -> equal outputs (joins still line up);
    unequal inputs collide with probability 16^-width."""
    return F.when(
        col.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit(prefix), F.substring(F.md5(col.cast("string")), 1, width)))


def pseudonym_sql(col: str, prefix: str = "ID_", width: int = 12) -> str:
    return (f"CASE WHEN {col} IS NULL THEN NULL ELSE "
            f"'{prefix}' || substr(md5(CAST({col} AS VARCHAR)), 1, {width}) END")


def bucket_numeric_expr(col: Column, bucket: float) -> Column:
    """Generalize a numeric to its bucket floor (k-anonymity-style
    coarsening): 12345.67 with bucket=1000 -> 12000."""
    return (F.floor(col / bucket) * bucket).cast("double")


def bucket_numeric_sql(col: str, bucket: float) -> str:
    return f"CAST(floor({col} / {bucket}) * {bucket} AS DOUBLE)"


def truncate_date_expr(col: Column) -> Column:
    """Generalize a date/timestamp to month start (NTZ-stable)."""
    return F.date_trunc("month", col).cast("timestamp_ntz")


def truncate_date_sql(col: str) -> str:
    return f"date_trunc('month', CAST({col} AS TIMESTAMP))"


def mask_columns(df: DataFrame, pseudonyms: list[str] | None = None,
                 buckets: dict[str, float] | None = None,
                 month_dates: list[str] | None = None,
                 prefix: str = "ID_") -> DataFrame:
    """Apply the three masking generalizations by column lists; all
    other columns pass through untouched.  One narrow projection —
    pushdown/pruning unaffected."""
    pseudonyms = pseudonyms or []
    buckets = buckets or {}
    month_dates = month_dates or []
    out = []
    for c in df.columns:
        if c in pseudonyms:
            out.append(pseudonym_expr(F.col(c), prefix).alias(c))
        elif c in buckets:
            out.append(bucket_numeric_expr(F.col(c), buckets[c]).alias(c))
        elif c in month_dates:
            out.append(truncate_date_expr(F.col(c)).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)
