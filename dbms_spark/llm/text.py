"""Text-analysis operators for large-scale training-data pipelines:
tokenization, per-document statistics, quality scoring, language ID,
and document fingerprinting.

All hot-path expressions are JVM-side Spark SQL (split / higher-order
array functions / md5) — no Python UDFs — and every operator has a
DuckDB-SQL twin generated from the same constants so the differential
gate covers them.  Numeric outputs are either exact integers, exact
integer-valued doubles (fixed-point), or ratios of identical integer
operands — bit-identical across engines by construction.

Determinism note: anything derived from hashing uses md5 (common to
both engines), never engine-native hash().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: minimal public stopword lists (frequency lists are public knowledge)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "los", "las", "y", "es", "uno", "una", "en", "del", "por"],
}
#: deterministic language priority for argmax ties
LANG_PRIORITY = ["en", "de", "fr", "es"]

_POLY_MOD = 1_000_000_007
_POLY_BASE = 31


def _sql_list(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _duck_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokens, empty-safe (JVM split, codegen'd)."""
    return F.expr(rf"filter(split(trim({text_col}), '\\s+'), x -> x != '')")


def tokens_sql(text_col: str = "text") -> str:
    return rf"list_filter(string_split_regex(trim({text_col}), '\s+'), x -> x != '')"


# ---------------------------------------------------------------------------
# Token statistics + quality scoring
# ---------------------------------------------------------------------------

def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, distinct ratio, average
    token length, stopword ratio — the feature block a quality filter
    consumes.  Single narrow projection, no shuffle."""
    sw = _sql_list(STOPWORDS["en"])
    return df.select(
        F.col(id_col),
        F.expr("size(toks)").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").alias("n_distinct"),
        F.expr("aggregate(toks, 0L, (a, x) -> a + length(x))").alias("total_len"),
        F.expr(
            "CASE WHEN size(toks) = 0 THEN 0.0 "
            "ELSE CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS DOUBLE) / size(toks) END"
        ).alias("avg_token_len"),
        F.expr(
            f"CASE WHEN size(toks) = 0 THEN 0.0 "
            f"ELSE CAST(size(filter(toks, t -> array_contains({sw}, t))) AS DOUBLE) / size(toks) END"
        ).alias("stopword_ratio"),
    ).withColumn("__", F.lit(None)).drop("__")


def token_stats_prepared(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return token_stats(df.withColumn("toks", tokens_expr(text_col)), id_col, text_col)


def token_stats_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    sw = _duck_list(STOPWORDS["en"])
    return f"""
SELECT {id_col},
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END AS avg_token_len,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(len(list_filter(toks, t -> list_contains({sw}, t))) AS DOUBLE) / len(toks) END AS stopword_ratio
FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})
"""


def quality_score_expr() -> Column:
    """Deterministic quality score in [0,1] from the stat block:
    rewards length in a healthy band, lexical diversity, and a sane
    stopword rate.  Fixed-point (floor at 4 dp) so engines agree."""
    raw = (
        "0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)"
        " + 0.4 * (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_distinct AS DOUBLE) / n_tokens END)"
        " + 0.2 * least(stopword_ratio * 5.0, 1.0)"
    )
    return F.expr(f"floor(({raw}) * 10000) / 10000")


def quality_score_sql() -> str:
    raw = (
        "0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)"
        " + 0.4 * (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_distinct AS DOUBLE) / n_tokens END)"
        " + 0.2 * least(stopword_ratio * 5.0, 1.0)"
    )
    return f"floor(({raw}) * 10000) / 10000"


# ---------------------------------------------------------------------------
# Language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

def lang_scores_exprs() -> list[Column]:
    return [
        F.expr(f"size(filter(toks, t -> array_contains({_sql_list(ws)}, t)))")
        .cast("bigint").alias(f"score_{lang}")
        for lang, ws in STOPWORDS.items()
    ]


def lang_id_pred_expr() -> Column:
    """argmax over stopword-hit scores with fixed priority tie-break;
    CJK-ratio shortcut for space-free scripts; 'unknown' if no signal."""
    best = "greatest(" + ", ".join(f"score_{l}" for l in LANG_PRIORITY) + ")"
    chain = f"CASE WHEN cjk_ratio > 0.3 THEN 'zh' WHEN {best} = 0 THEN 'unknown' "
    for lang in LANG_PRIORITY:
        chain += f"WHEN score_{lang} = {best} THEN '{lang}' "
    chain += "END"
    return F.expr(chain)


def cjk_ratio_expr(text_col: str = "text") -> Column:
    return F.expr(
        f"CASE WHEN length({text_col}) = 0 THEN 0.0 ELSE "
        f"CAST(length({text_col}) - length(regexp_replace({text_col}, '[\\\\x{{4e00}}-\\\\x{{9fff}}]', '')) AS DOUBLE)"
        f" / length({text_col}) END"
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    with_feats = (
        df.withColumn("toks", tokens_expr(text_col))
        .withColumn("cjk_ratio", cjk_ratio_expr(text_col))
        .select(F.col(id_col), "cjk_ratio", *lang_scores_exprs())
    )
    return with_feats.select(
        F.col(id_col),
        lang_id_pred_expr().alias("pred_lang"),
        *[F.col(f"score_{l}") for l in LANG_PRIORITY],
    )


def lang_id_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    scores = ", ".join(
        f"CAST(len(list_filter(toks, t -> list_contains({_duck_list(ws)}, t))) AS BIGINT) AS score_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"score_{l}" for l in LANG_PRIORITY) + ")"
    chain = f"CASE WHEN cjk_ratio > 0.3 THEN 'zh' WHEN {best} = 0 THEN 'unknown' "
    for lang in LANG_PRIORITY:
        chain += f"WHEN score_{lang} = {best} THEN '{lang}' "
    chain += "END"
    score_cols = ", ".join(f"score_{l}" for l in LANG_PRIORITY)
    return f"""
SELECT {id_col}, {chain} AS pred_lang, {score_cols}
FROM (
  SELECT {id_col}, {scores},
         CASE WHEN length({text_col}) = 0 THEN 0.0 ELSE
           CAST(length({text_col}) - length(regexp_replace({text_col}, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS DOUBLE)
           / length({text_col}) END AS cjk_ratio
  FROM (SELECT {id_col}, {text_col}, {tokens_sql(text_col)} AS toks FROM {table})
)
"""


# ---------------------------------------------------------------------------
# Text cleaning
# ---------------------------------------------------------------------------

def clean_text_expr(text_col: str = "text") -> Column:
    """Garbled-byte cleanup for raw ingests: strips control characters
    and U+FFFD replacement chars, collapses runs of whitespace
    (capability parity with the reference's charset-conversion garbage
    handling, utils/stringutil charset conversions — Spark is UTF-8
    native so only the cleanup half survives)."""
    stripped = F.regexp_replace(
        F.col(text_col), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]", ""
    )
    return F.regexp_replace(F.trim(stripped), r"\s+", " ")


def clean_text_sql(text_expr: str = "text") -> str:
    """DuckDB twin of :func:`clean_text_expr` (RE2 needs the 'g' flag
    for global replacement; the U+FFFD literal rides in the class)."""
    cls = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F�]"
    stripped = f"regexp_replace({text_expr}, '{cls}', '', 'g')"
    return f"regexp_replace(trim({stripped}), '\\s+', ' ', 'g')"


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Two fingerprints per doc: content md5 of the normalized text
    (lowercase, collapsed whitespace) and a polynomial rolling hash of
    the token sequence (order-sensitive, mod 1e9+7 — all intermediates
    integer-exact in 64-bit)."""
    norm = rf"lower(regexp_replace(trim({text_col}), '\\s+', ' '))"
    poly = (
        f"aggregate(toks, 0L, (acc, t) -> (acc * {_POLY_BASE} + "
        f"cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % {_POLY_MOD}) % {_POLY_MOD})"
    )
    return (
        df.withColumn("toks", tokens_expr(text_col))
        .select(
            F.col(id_col),
            F.expr(f"md5({norm})").alias("content_md5"),
            F.expr(poly).alias("poly_hash"),
        )
    )


def fingerprint_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    norm = rf"lower(regexp_replace(trim({text_col}), '\s+', ' ', 'g'))"
    return f"""
SELECT {id_col},
       md5({norm}) AS content_md5,
       CASE WHEN len(toks) = 0 THEN 0
            ELSE list_reduce(list_prepend(0, list_transform(toks,
                   t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % {_POLY_MOD})),
                 (acc, h) -> (acc * {_POLY_BASE} + h) % {_POLY_MOD}) END AS poly_hash
FROM (SELECT {id_col}, {text_col}, {tokens_sql(text_col)} AS toks FROM {table})
"""
