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
from dbms_spark.plans.parallelism import literal_df

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


def ingest_utf8_expr(bin_col: str = "raw",
                     garbled_replace: str = "�") -> Column:
    """Raw-bytes ingest canonicalization: binary column -> valid UTF-8
    string.  Invalid byte sequences become U+FFFD (one replacement per
    maximal invalid sequence — WHATWG/Java REPLACE semantics, Spark's
    ``make_valid_utf8``), then U+FFFD is substituted with the
    configured garble character.  This is the Spark-native counterpart
    of the reference's two-hop source→UTF8→target conversion with a
    garbled-replace knob (utils/stringutil/string.go CharsetConvert /
    CharsetConvertReplace; applied per string column in
    database/oracle/data_compare.go:616-625) — Spark is UTF-8 native,
    so only the validate+replace half has observable effect, and it
    runs JVM-side inside codegen (no Python, no shuffle).  Compose
    with :func:`clean_text_expr` for full dirty-ingest hygiene."""
    s = F.expr(f"make_valid_utf8(cast({bin_col} as string))")
    if garbled_replace == "�":
        return s
    return F.regexp_replace(s, "�", garbled_replace)


def ingest_charset(df: DataFrame, bin_col: str = "raw",
                   charset: str = "GBK",
                   garbled_replace: str = "�") -> DataFrame:
    """Legacy-charset ingest: decode a binary column from GBK /
    GB18030 / BIG5 (any Python codec) to UTF-8 text, invalid source
    sequences becoming U+FFFD then the configured garble char — the
    reference's full source→UTF8 hop with replace semantics
    (utils/stringutil/string.go:745-805: Go x/text decoders substitute
    RuneError on invalid input rather than failing).  Output: the
    input columns with ``bin_col`` replaced by a ``text`` string
    column.

    Path choice: Spark's ``decode(bin, 'GBK')`` is STRICT in Spark 4
    (MALFORMED_CHARACTER_CODING on any bad byte), so replace semantics
    need the codec — Arrow-batched ``mapInPandas`` (the multimodal
    decode pattern), NOT a row-at-a-time UDF.  UTF-8 sources should
    use :func:`ingest_utf8_expr` instead: pure codegen, no Python.
    One-time ingest cost; everything downstream is JVM-side.

    The per-batch decode is ``Series.str.decode(codec,
    errors='replace')`` — pandas' elementwise map with null
    propagation, measured ~1.9x the per-element Python list
    comprehension it replaced (0.17 s vs 0.32 s on 300k mixed
    valid/invalid/null GBK values), identical output including the
    U+FFFD-per-invalid-sequence placement."""
    from pyspark.sql import types as T

    others = [c for c in df.columns if c != bin_col]
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != bin_col]
        + [T.StructField("text", T.StringType())])
    codec, rep = charset, garbled_replace

    def decode(batches):
        for pdf in batches:
            out = pdf[others].copy()
            t = pdf[bin_col].str.decode(codec, errors="replace")
            if rep != "�":
                t = t.str.replace("�", rep, regex=False)
            out["text"] = t
            yield out

    return df.mapInPandas(decode, schema)


def encode_charset(df: DataFrame, text_col: str = "text",
                   charset: str = "GBK") -> DataFrame:
    """The write-side hop: UTF-8 text -> legacy-charset bytes,
    characters the target charset cannot represent becoming its
    replacement byte (``errors='replace'`` — the reference's
    ``encoding.ReplaceUnsupported`` wrap on the UTF8→GBK/BIG5
    encoders, utils/stringutil/string.go:719-740).  Output: input
    columns with ``text_col`` replaced by a ``raw`` binary column.
    For CSV targets prefer the sink's own ``charset`` option
    (JVM-side); this is for binary-addressed sinks (JDBC byte params,
    Kafka values)."""
    from pyspark.sql import types as T

    others = [c for c in df.columns if c != text_col]
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != text_col]
        + [T.StructField("raw", T.BinaryType())])
    codec = charset

    def encode(batches):
        for pdf in batches:
            out = pdf[others].copy()
            # Series.str.encode: pandas' elementwise map with null
            # propagation (same vectorization as ingest_charset)
            out["raw"] = pdf[text_col].str.encode(codec, errors="replace")
            yield out

    return df.mapInPandas(encode, schema)


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


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality heuristics)
# ---------------------------------------------------------------------------

#: max occurrence count of any element in a string array, computed as the
#: longest run of the SORTED array folded map-side — O(n log n) per row,
#: zero shuffles (vs the classic explode + two groupBys).
_MAX_FREQ_FOLD = (
    "aggregate(array_sort({arr}), "
    "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
    "(acc, t) -> CASE WHEN acc.prev IS NOT NULL AND t = acc.prev "
    "THEN named_struct('prev', t, 'run', acc.run + 1L, 'best', greatest(acc.best, acc.run + 1L)) "
    "ELSE named_struct('prev', t, 'run', 1L, 'best', greatest(acc.best, 1L)) END, "
    "acc -> acc.best)"
)

#: word bigram array (non-distinct, document order)
_BIGRAMS = (
    "CASE WHEN size(toks) < 2 THEN array() "
    "ELSE transform(sequence(0, size(toks) - 2), i -> toks[i] || ' ' || toks[i + 1]) END"
)


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document repetition heuristics (Gopher/C4-style filters):
    duplicate-word fraction, most-frequent-word fraction, duplicate-
    bigram fraction, plus the raw counts.

    Everything is computed INSIDE the row with array folds (sort +
    longest-run for the mode count) — zero shuffles, linear scan over
    the corpus, so at 100 TB this is a pure map stage that pipelines
    with the parquet scan.  The DuckDB twin takes the classic
    unnest + GROUP BY route; values match exactly because both count
    the same multiset.  Docs with no tokens are dropped (no
    denominators).  Fractions are DOUBLE quotients of exact BIGINTs —
    bit-identical across engines.
    """
    from dbms_spark.plans.parallelism import ensure_parallelism

    df = ensure_parallelism(df)
    toks = (
        df.withColumn("toks", tokens_expr(text_col))
        .filter(F.expr("size(toks) > 0"))
        .withColumn("bg", F.expr(_BIGRAMS))
    )
    n_words = F.expr("cast(size(toks) as bigint)")
    n_dw = F.expr("cast(size(array_distinct(toks)) as bigint)")
    top_w = F.expr(_MAX_FREQ_FOLD.format(arr="toks"))
    n_bg = F.expr("cast(size(bg) as bigint)")
    n_dbg = F.expr("cast(size(array_distinct(bg)) as bigint)")
    return toks.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_dw.alias("n_distinct_words"),
        top_w.alias("top_word_count"),
        n_bg.alias("n_bigrams"),
        n_dbg.alias("n_distinct_bigrams"),
        ((n_words - n_dw).cast("double") / n_words).alias("dup_word_frac"),
        (top_w.cast("double") / n_words).alias("top_word_frac"),
        F.when(n_bg > 0, (n_bg - n_dbg).cast("double") / n_bg)
        .otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
    )


def repetition_signals_sql(table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    return f"""
WITH toks AS (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}),
w AS (SELECT {id_col}, unnest(toks) AS t FROM toks WHERE len(toks) > 0),
wc AS (SELECT {id_col}, t, COUNT(*) AS c FROM w GROUP BY 1, 2),
ws AS (SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_words,
              CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
              CAST(MAX(c) AS BIGINT) AS top_word_count
       FROM wc GROUP BY 1),
bg AS (SELECT {id_col},
              unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS g
       FROM toks WHERE len(toks) >= 2),
bc AS (SELECT {id_col}, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bs AS (SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_bigrams,
              CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
       FROM bc GROUP BY 1)
SELECT ws.{id_col}, n_words, n_distinct_words, top_word_count,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
       CAST(n_words - n_distinct_words AS DOUBLE) / n_words AS dup_word_frac,
       CAST(top_word_count AS DOUBLE) / n_words AS top_word_frac,
       CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
            ELSE 0.0 END AS dup_bigram_frac
FROM ws LEFT JOIN bs ON ws.{id_col} = bs.{id_col}
"""


# ---------------------------------------------------------------------------
# Corpus-level n-gram frequency (contamination / boilerplate analysis)
# ---------------------------------------------------------------------------

_TRIGRAMS = (
    "CASE WHEN size(toks) < 3 THEN array() "
    "ELSE transform(sequence(0, size(toks) - 3), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) END"
)


def top_ngrams(df: DataFrame, text_col: str = "text", n: int = 3,
               k: int = 20) -> DataFrame:
    """Top-``k`` word ``n``-grams across the whole corpus by frequency
    (ties broken by ngram text, so the result set is deterministic).

    One shuffle: explode is map-side, the groupBy count does map-side
    partial aggregation on the ngram string, and the global top-k is a
    TakeOrdered over per-partition heaps — no full sort materializes.
    Boilerplate n-grams are heavy-hitter keys; the partial aggregation
    absorbs the skew before the shuffle."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    grams = {2: _BIGRAMS, 3: _TRIGRAMS}[n]
    # explode_OUTER on purpose: a plain explode makes Catalyst infer a
    # size()>0 pre-filter that re-inlines the whole ngram expression
    # below the parallelism exchange — single-threaded and ~6x the
    # work.  Outer generate infers nothing; empty docs yield one NULL
    # ngram row dropped by the post-generate filter (which cannot sink
    # below the Generate that defines its input).
    return (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .select(F.explode_outer(F.expr(grams)).alias("ngram"))
        .filter(F.col("ngram").isNotNull())
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def top_ngrams_sql(table: str = "documents", text_col: str = "text", n: int = 3,
                   k: int = 20) -> str:
    assert n == 3, "oracle emitted for the trigram default"
    return f"""
WITH toks AS (SELECT {tokens_sql(text_col)} AS toks FROM {table}),
g AS (SELECT unnest([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                     for i in range(1, len(toks) - 1)]) AS ngram
      FROM toks WHERE len(toks) >= 3)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT {k}
"""


def token_cooccurrence(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", min_df: int = 5,
                       max_df: int | None = None, min_pair: int = 2,
                       per_doc_cap: int | None = 256,
                       k: int = 50) -> DataFrame:
    """Top-``k`` token pairs by document-co-occurrence LIFT — the
    collocation / topic-signal miner (PMI = log lift; log is monotone,
    so lift ranks identically per pair count and stays integer-exact:
    ``lift_ppm`` = floor(1e6 · n_pair · N / (df_a · df_b))).

    Occupancy controls, because the within-doc pair expansion is
    Σ_d r_d² for r_d retained tokens per doc:

    - ``min_df`` drops hapax noise (rare pairs of rare tokens have
      degenerate lift and dominate undamped PMI rankings — the reason
      ``min_pair`` also gates the output);
    - ``max_df`` drops stop-word-grade head terms BEFORE pairing
      (the inverted_index recipe: they carry no collocation signal and
      their pair volume is O(corpus·r_d));
    - ``per_doc_cap`` bounds r_d: keep each doc's first ``cap``
      retained tokens in md5-of-token order — deterministic and
      engine-free (the kmv_by recipe), so a pathological 10⁶-distinct-
      token doc contributes cap² pairs, not 10¹².

    Shape: one distinct (id, token) explode; docfreq partial-agg;
    retained tokens re-join the doc relation; per-doc cap is a
    bounded window; the pair expansion is ONE equi-join on the doc id
    (both sides the same capped relation); pair counts partial-agg on
    the (a, b) key; top-k is a TakeOrdered."""
    from pyspark.sql.window import Window

    toks = (df.select(F.col(id_col),
                      F.explode(F.array_distinct(tokens_expr(text_col)))
                      .alias("token")))
    dfreq = (toks.groupBy("token")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df")))
    keep = dfreq.where(F.col("df") >= min_df)
    if max_df is not None:
        keep = keep.where(F.col("df") <= max_df)
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    kept = toks.join(keep, "token")
    if per_doc_cap is not None:
        w = Window.partitionBy(id_col).orderBy(F.md5("token"))
        kept = (kept.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= per_doc_cap).drop("__rn"))
    # the pair join reads this relation twice — materialize once
    kept = kept.select(id_col, "token", "df").localCheckpoint()
    a = kept.select(F.col(id_col), F.col("token").alias("tok_a"),
                    F.col("df").alias("df_a"))
    b = kept.select(F.col(id_col), F.col("token").alias("tok_b"),
                    F.col("df").alias("df_b"))
    pairs = (a.join(b, id_col)
             .where(F.col("tok_a") < F.col("tok_b"))
             .groupBy("tok_a", "tok_b", "df_a", "df_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
             .where(F.col("n_pair") >= min_pair)
             .crossJoin(F.broadcast(n))
             .select("tok_a", "tok_b", "n_pair", "df_a", "df_b",
                     F.expr("(CAST(1000000 AS DECIMAL(38,0)) * n_pair"
                            " * n_docs) DIV (CAST(df_a AS DECIMAL(38,0))"
                            " * df_b)").alias("lift_ppm")))
    topk = pairs.orderBy(F.desc("lift_ppm"), F.asc("tok_a"),
                         F.asc("tok_b")).limit(k)
    rw = Window.orderBy(F.desc("lift_ppm"), F.asc("tok_a"), F.asc("tok_b"))
    return topk.select("tok_a", "tok_b", "n_pair", "df_a", "df_b",
                       "lift_ppm",
                       F.row_number().over(rw).cast("bigint").alias("rank"))


def token_cooccurrence_sql(table: str, id_col: str = "doc_id",
                           text_col: str = "text", min_df: int = 5,
                           max_df: int | None = None, min_pair: int = 2,
                           per_doc_cap: int | None = 256,
                           k: int = 50) -> str:
    """DuckDB twin of :func:`token_cooccurrence`."""
    maxdf = f"AND df <= {max_df}" if max_df is not None else ""
    cap = (f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {id_col} "
           f"ORDER BY md5(token)) <= {per_doc_cap}"
           if per_doc_cap is not None else "")
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(list_distinct({tokens_sql(text_col)})) AS token
  FROM {table}
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
kept AS (
  SELECT {id_col}, token, df
  FROM toks JOIN dfreq USING (token)
  WHERE df >= {min_df} {maxdf}
  {cap}
),
pairs AS (
  SELECT a.token AS tok_a, b.token AS tok_b,
         CAST(COUNT(*) AS BIGINT) AS n_pair,
         a.df AS df_a, b.df AS df_b
  FROM kept a JOIN kept b ON a.{id_col} = b.{id_col} AND a.token < b.token
  GROUP BY 1, 2, 4, 5
  HAVING COUNT(*) >= {min_pair}
)
SELECT tok_a, tok_b, n_pair, df_a, df_b, lift_ppm, rank FROM (
  SELECT tok_a, tok_b, n_pair, df_a, df_b,
         CAST((CAST(1000000 AS HUGEINT) * n_pair * n.n_docs)
              // (CAST(df_a AS HUGEINT) * df_b) AS BIGINT) AS lift_ppm,
         CAST(ROW_NUMBER() OVER (
           ORDER BY (CAST(1000000 AS HUGEINT) * n_pair * n.n_docs)
                    // (CAST(df_a AS HUGEINT) * df_b) DESC,
                    tok_a, tok_b) AS BIGINT) AS rank
  FROM pairs, n
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------

def _exploded_shingles(df: DataFrame, cols: list, text_col: str, n: int) -> DataFrame:
    # explode_outer + post-filter: see top_ngrams — a plain explode
    # gets an inferred size()>0 filter that re-inlines the shingle
    # expression below the parallelism exchange (serial, ~6x work)
    from dbms_spark.llm.dedup import shingles_expr
    from dbms_spark.plans.parallelism import ensure_parallelism

    return (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .withColumn("sh", shingles_expr(n))
        .select(*cols, F.explode_outer("sh").alias("sh"))
        .filter(F.col("sh").isNotNull())
    )


def contamination_check(train: DataFrame, bench: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5) -> DataFrame:
    """Per-train-document count of word ``n``-gram shingles that also
    occur anywhere in the benchmark set (the standard train/eval
    overlap decontamination pass).

    Scale shape: the benchmark side is distinct-reduced and BROADCAST —
    eval sets are tiny next to a 100 TB corpus, so the probe is a
    map-side hash-join against the streamed train shingles; no shuffle
    of the corpus.  Train shingles are per-doc distinct (from
    :func:`~dbms_spark.llm.dedup.shingles_expr`), so ``n_hits`` counts
    distinct contaminated shingles per document."""
    bench_sh = _exploded_shingles(bench, [], text_col, n).distinct()
    return (
        _exploded_shingles(train, [F.col(id_col)], text_col, n)
        .join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def contamination_overlap(train: DataFrame, bench: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 5) -> DataFrame:
    """Per-train-document contamination RATIO: distinct shingle count,
    benchmark hits, and the floored hit fraction — the form a filter
    thresholds on (drop docs with overlap_ratio > x).  Zero-hit docs
    are kept (audit completeness), unlike :func:`contamination_check`.

    Same scale shape: broadcast bench set probed by a LEFT flag join —
    one shuffle of (doc_id, flag) pairs, corpus text never moves."""
    bench_sh = (
        _exploded_shingles(bench, [], text_col, n).distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        _exploded_shingles(train, [F.col(id_col)], text_col, n)
        .join(F.broadcast(bench_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .select(
            id_col, "n_shingles", "n_hits",
            (F.floor(F.col("n_hits").cast("double") / F.col("n_shingles").cast("double")
                     * 1000000) / 1000000).alias("overlap_ratio"),
        )
    )


def contamination_overlap_sql(train_sql: str, bench_sql: str, id_col: str = "doc_id",
                              n: int = 5) -> str:
    from dbms_spark.llm.dedup import shingles_sql

    return f"""
WITH tr AS ({train_sql}),
be AS ({bench_sql}),
tsh AS (SELECT {id_col}, unnest({shingles_sql(n)}) AS sh
        FROM (SELECT {id_col}, {tokens_sql()} AS toks FROM tr)),
bsh AS (SELECT DISTINCT unnest({shingles_sql(n)}) AS sh
        FROM (SELECT {tokens_sql()} AS toks FROM be))
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN bsh.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       floor(CAST(SUM(CASE WHEN bsh.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1000000) / 1000000 AS overlap_ratio
FROM tsh LEFT JOIN bsh ON tsh.sh = bsh.sh GROUP BY {id_col}
"""


def contamination_check_sql(train_sql: str, bench_sql: str, id_col: str = "doc_id",
                            n: int = 5) -> str:
    from dbms_spark.llm.dedup import shingles_sql

    return f"""
WITH tr AS ({train_sql}),
be AS ({bench_sql}),
tsh AS (SELECT {id_col}, unnest({shingles_sql(n)}) AS sh
        FROM (SELECT {id_col}, {tokens_sql()} AS toks FROM tr)),
bsh AS (SELECT DISTINCT unnest({shingles_sql(n)}) AS sh
        FROM (SELECT {tokens_sql()} AS toks FROM be))
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM tsh JOIN bsh USING (sh) GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

#: deliberately simple patterns that parse identically under Java regex
#: (Spark) and RE2 (DuckDB): char classes + bounded quantifiers only.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii_expr(text_col: str = "text") -> Column:
    """Emails then phones replaced by typed placeholder tags.  Spark's
    ``regexp_replace`` is global by default (DuckDB needs the 'g' flag
    — see :func:`pii_scan_sql`)."""
    return F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE, "<PHONE>",
    )


def pii_scan(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII counts plus an md5 of the redacted text (the
    hash differentially proves the redaction itself, not just the
    counts).  Pure map stage — JVM regex inside codegen, no shuffle."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PHONE_RE), F.lit(0)))
        .cast("bigint").alias("n_phones"),
        F.md5(redact_pii_expr(text_col).cast("binary")).alias("redacted_md5"),
    )


def pii_scan_sql(table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    em, ph = PII_EMAIL_RE, PII_PHONE_RE
    return f"""
SELECT {id_col},
       CAST(len(regexp_extract_all({text_col}, '{em}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({text_col}, '{ph}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace({text_col}, '{em}', '<EMAIL>', 'g'),
                          '{ph}', '<PHONE>', 'g')) AS redacted_md5
FROM {table}
"""


# ---------------------------------------------------------------------------
# Document chunking (training/RAG window splitter)
# ---------------------------------------------------------------------------

def chunk_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    window: int = 32, stride: int = 16) -> DataFrame:
    """Split each document into overlapping token windows with stable
    (doc_id, chunk_idx) identity — the standard context-window splitter
    in a training/RAG ingest pipeline.

    Map-side only: the chunk list is built inside the row with
    ``slice``/``transform`` and exploded (outer — see
    :func:`top_ngrams` for why), so the operator pipelines with the
    scan; chunk count per doc is ceil((n-w)/s)+1, short docs yield one
    chunk.  ``n_tokens`` counts the actual tokens in the (possibly
    short tail) chunk."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    n_chunks = (
        f"CASE WHEN size(toks) <= {window} THEN 1 "
        f"ELSE CAST(ceil((size(toks) - {window}) / CAST({stride} AS DOUBLE)) AS INT) + 1 END"
    )
    chunks = (
        f"transform(sequence(0, {n_chunks} - 1), i -> named_struct("
        f"'chunk_idx', CAST(i AS BIGINT), "
        f"'chunk_text', concat_ws(' ', slice(toks, i * {stride} + 1, {window})), "
        f"'n_tokens', CAST(least({window}, size(toks) - i * {stride}) AS BIGINT)))"
    )
    return (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .select(F.col(id_col), F.explode_outer(F.expr(chunks)).alias("c"))
        .filter(F.col("c").isNotNull())
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )


def chunk_documents_sql(table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text", window: int = 32,
                        stride: int = 16) -> str:
    n_chunks = (
        f"CASE WHEN len(toks) <= {window} THEN 1 "
        f"ELSE CAST(ceil((len(toks) - {window}) / CAST({stride} AS DOUBLE)) AS BIGINT) + 1 END"
    )
    return f"""
WITH toks AS (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}),
ix AS (SELECT {id_col}, toks, unnest(range({n_chunks})) AS i FROM toks)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {window}), ' ') AS chunk_text,
       CAST(least({window}, len(toks) - i * {stride}) AS BIGINT) AS n_tokens
FROM ix
"""


# ---------------------------------------------------------------------------
# Deterministic source mixing (dataset mixture weights)
# ---------------------------------------------------------------------------

def mix_sources(df: DataFrame, rates: dict[str, float], id_col: str = "doc_id",
                source_col: str = "source") -> DataFrame:
    """Down-sample each source to its mixture rate (pct) with the same
    deterministic md5-prefix rule as the sampled scan — reproducible
    across runs and engines, no RNG state.  Sources absent from
    ``rates`` are dropped (rate 0).  Pure map-side filter: at 100 TB
    this is a scan-speed pass with predicate pushdown on ``source``
    when the lake is source-partitioned."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10).cast("bigint")
    thr = F.lit(0)
    expr = None
    for s, pct in sorted(rates.items()):
        t = int(round(256 * pct / 100.0))
        cond = F.col(source_col) == s
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    thr = expr.otherwise(F.lit(0)) if expr is not None else thr
    return df.filter(bucket < thr)


def mix_sources_sql(table: str, rates: dict[str, float], id_col: str = "doc_id",
                    source_col: str = "source") -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {int(round(256 * pct / 100.0))}"
        for s, pct in sorted(rates.items())
    )
    return f"""
SELECT * FROM {table}
WHERE ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 2))::BIGINT
      < (CASE {source_col} {arms} ELSE 0 END)
"""


# ---------------------------------------------------------------------------
# Composed quality-filter pipeline (C4/Gopher-style pass)
# ---------------------------------------------------------------------------

def quality_filter(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   min_tokens: int = 30, min_quality: float = 0.5,
                   max_dup_word_frac: float = 0.62) -> DataFrame:
    """Every input row tagged with its filter ``verdict``: the FIRST
    failing rule in fixed order (too_short → low_quality → repetitive)
    or 'kept'.  One narrow projection — the token array is computed
    once and shared by every rule via codegen subexpression
    elimination; no shuffle, so at 100 TB this is a scan-speed pass."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    d = (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .withColumn("n_tokens", F.expr("size(toks)"))
        .withColumn("n_distinct", F.expr("size(array_distinct(toks))"))
        .withColumn("stopword_ratio", F.expr(
            f"CASE WHEN size(toks) = 0 THEN 0.0 "
            f"ELSE CAST(size(filter(toks, t -> array_contains({_sql_list(STOPWORDS['en'])}, t))) AS DOUBLE) / size(toks) END"
        ))
        .withColumn("quality", quality_score_expr())
        .withColumn("dup_word_frac", F.expr(
            "CASE WHEN n_tokens = 0 THEN 0.0 "
            "ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens END"))
    )
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("quality") < min_quality, "low_quality")
        .when(F.col("dup_word_frac") > max_dup_word_frac, "repetitive")
        .otherwise("kept")
    )
    return d.select(F.col(id_col), verdict.alias("verdict"))


def quality_filter_report(df: DataFrame, **kw) -> DataFrame:
    """(verdict, n) breakdown — the pipeline's audit trail."""
    return (
        quality_filter(df, **kw)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quality_filter_report_sql(table: str = "documents", id_col: str = "doc_id",
                              text_col: str = "text", min_tokens: int = 30,
                              min_quality: float = 0.5,
                              max_dup_word_frac: float = 0.62) -> str:
    return f"""
WITH s AS ({token_stats_sql(table, id_col, text_col)}),
v AS (SELECT CASE WHEN n_tokens < {min_tokens} THEN 'too_short'
                  WHEN {quality_score_sql()} < {min_quality} THEN 'low_quality'
                  WHEN (CASE WHEN n_tokens = 0 THEN 0.0
                        ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens END)
                       > {max_dup_word_frac} THEN 'repetitive'
                  ELSE 'kept' END AS verdict
      FROM s)
SELECT verdict, COUNT(*) AS n FROM v GROUP BY verdict
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms (keyword extraction)
# ---------------------------------------------------------------------------

def tfidf_top_terms(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3, broadcast_docfreq: bool = True) -> DataFrame:
    """Top-``k`` distinguishing tokens per document by tf-idf with a
    RATIONAL idf (tf x N/df, no logarithm): every factor is an exact
    integer below 2^53, so the one double division is correctly rounded
    and bit-identical across engines — rank order matches the classic
    ln() form because ln is monotone in N/df.

    Shape: one explode + two partial-aggregated shuffles (doc-term
    counts, term df) + the df-table join; the per-doc top-k is a
    bounded window.  ``broadcast_docfreq``: the docfreq relation is
    VOCABULARY-sized — fine to broadcast for corpora whose distinct
    tokens fit the broadcast budget (the default; an unhinted
    AQE-decided join measured 4.4x slower at sf0.1), but on a
    heavy-tailed 100 TB corpus (10^8+ distinct tokens, multi-GB) pass
    False to shuffle-join on ``tok`` instead — same verdicts, no
    vocabulary broadcast."""
    from pyspark.sql import Window

    from dbms_spark.plans.parallelism import ensure_parallelism

    words = (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .select(F.col(id_col), F.explode_outer("toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    tc = words.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = tc.groupBy(id_col).agg(F.sum("c").alias("total"))
    docfreq = tc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # corpus size = totals' row count (one row per doc with >= 1
    # token, exactly countDistinct(id) over words) — deriving it from
    # `words` directly would re-tokenize and re-explode the corpus a
    # second time; this leg re-reads tc/totals' exchanges instead
    n = totals.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tc.join(totals, id_col)
        .join(F.broadcast(docfreq) if broadcast_docfreq else docfreq, "tok")
        .crossJoin(F.broadcast(n))  # one-row corpus size, stays lazy
        .select(
            F.col(id_col), "tok",
            ((F.col("c") * F.col("n_docs")).cast("double") / (F.col("total") * F.col("df")))
            .alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.select(id_col, "tok", "tfidf", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
        .select(id_col, "tok", "tfidf", F.col("rank").cast("bigint").alias("rank"))
    )


def tfidf_top_terms_sql(table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3) -> str:
    return f"""
WITH words AS (SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {table}),
tc AS (SELECT {id_col}, tok, COUNT(*) AS c FROM words GROUP BY 1, 2),
totals AS (SELECT {id_col}, SUM(c) AS total FROM tc GROUP BY 1),
docfreq AS (SELECT tok, COUNT(*) AS df FROM tc GROUP BY 1),
n AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM words),
scored AS (
  SELECT tc.{id_col}, tc.tok,
         CAST(tc.c * n.n_docs AS DOUBLE) / (totals.total * docfreq.df) AS tfidf
  FROM tc JOIN totals ON tc.{id_col} = totals.{id_col}
          JOIN docfreq ON tc.tok = docfreq.tok, n
)
SELECT {id_col}, tok, tfidf, rank FROM (
  SELECT {id_col}, tok, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
                                 ORDER BY tfidf DESC, tok) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the broadcast-sketch scale path for
# contamination_check: at 100 TB the train side streams against a
# fixed-size bit set instead of the full benchmark shingle table)
# ---------------------------------------------------------------------------

#: two md5-derived bit positions per shingle (k=2 double hashing)
_BLOOM_K = 2


def _bloom_bit_expr(sh: Column, seed: int, m: int) -> Column:
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), sh)), 1, 8), 16, 10)
    return h.cast("bigint") % m


def _bloom_bit_sql(sh: str, seed: int, m: int) -> str:
    return f"(('0x' || substr(md5('{seed}' || ':' || {sh}), 1, 8))::BIGint % {m})"


def bloom_contamination_check(train: DataFrame, bench: DataFrame,
                              id_col: str = "doc_id", text_col: str = "text",
                              n: int = 5, m: int | None = 4096,
                              with_exact: bool = True) -> DataFrame:
    """Per-train-document shingle contamination screened through a
    Bloom filter of the benchmark shingles, with the exact membership
    count alongside (``n_bloom_hits >= n_exact_hits`` always — Bloom
    filters have no false negatives).

    Scale shape: the filter is ``m`` bits built from the (tiny) bench
    side and broadcast; each train shingle probes k=2 md5-derived bits
    map-side.  Unlike the exact broadcast of every bench shingle
    (:func:`contamination_check`), the broadcast here is fixed-size no
    matter how many benchmark suites pile up — the standard
    bloom-vs-hash-set tradeoff, paid in false positives that a second
    exact pass on just the flagged docs resolves.

    ``with_exact=True`` (the gate form) also broadcasts the exact
    shingle set and emits ``n_exact_hits`` so the no-false-negative
    invariant is checkable; production screening at scale passes
    ``with_exact=False`` to keep ONLY the fixed-size broadcast —
    that is the whole point of the filter.

    ``m=None`` derives the size from the bench shingle count at
    ~10 bits/shingle (one count on the small-by-contract bench side,
    same ``sketch.derive_bloom_size`` rule as the membership filter)
    so piling more benchmark suites in never saturates the filter;
    the literal 4096 default keeps the q35 gate deterministic."""
    from dbms_spark.llm.dedup import shingles_expr
    from dbms_spark.plans.parallelism import ensure_parallelism

    def sh(df: DataFrame, cols: list) -> DataFrame:
        return (
            ensure_parallelism(df)
            .withColumn("toks", tokens_expr(text_col))
            .withColumn("sh", shingles_expr(n))
            .select(*cols, F.explode_outer("sh").alias("sh"))
            .filter(F.col("sh").isNotNull())
        )

    bench_sh = sh(bench, []).distinct()
    if m is None:
        from dbms_spark.operators.sketch import derive_bloom_size

        m = derive_bloom_size(bench_sh.count(), floor_bits=4096)
    bits = (
        bench_sh.select(F.explode(F.array(*[
            _bloom_bit_expr(F.col("sh"), k, m) for k in range(_BLOOM_K)
        ])).alias("bit"))
        .distinct()
    )
    t = sh(train, [F.col(id_col)]).select(
        id_col, "sh",
        *[_bloom_bit_expr(F.col("sh"), k, m).alias(f"b{k}") for k in range(_BLOOM_K)],
    )
    for k in range(_BLOOM_K):
        marker = bits.select(F.col("bit").alias(f"b{k}"), F.lit(1).alias(f"m{k}"))
        t = t.join(F.broadcast(marker), f"b{k}", "left")
    maybe = F.when(sum(F.col(f"m{k}").isNotNull().cast("int") for k in range(_BLOOM_K))
                   == _BLOOM_K, 1).otherwise(0)
    aggs = [F.sum(maybe).cast("bigint").alias("n_bloom_hits")]
    if with_exact:
        exact = bench_sh.select("sh", F.lit(1).alias("ex"))
        t = t.join(F.broadcast(exact), "sh", "left")
        aggs.append(
            F.sum(F.coalesce(F.col("ex"), F.lit(0))).cast("bigint").alias("n_exact_hits"))
    return (
        t.groupBy(id_col)
        .agg(*aggs)
        .filter(F.col("n_bloom_hits") > 0)
    )


def bloom_contamination_check_sql(train_sql: str, bench_sql: str,
                                  id_col: str = "doc_id", n: int = 5,
                                  m: int = 4096) -> str:
    from dbms_spark.llm.dedup import shingles_sql

    bit_arms = " UNION ".join(
        f"SELECT {_bloom_bit_sql('sh', k, m)} AS bit FROM bsh" for k in range(_BLOOM_K)
    )
    probe_cols = ", ".join(f"{_bloom_bit_sql('sh', k, m)} AS b{k}" for k in range(_BLOOM_K))
    all_in = " AND ".join(f"b{k} IN (SELECT bit FROM bits)" for k in range(_BLOOM_K))
    return f"""
WITH tr AS ({train_sql}),
be AS ({bench_sql}),
bsh AS (SELECT DISTINCT unnest({shingles_sql(n)}) AS sh
        FROM (SELECT {tokens_sql()} AS toks FROM be)),
bits AS ({bit_arms}),
tsh AS (SELECT {id_col}, sh, {probe_cols}
        FROM (SELECT {id_col}, unnest({shingles_sql(n)}) AS sh
              FROM (SELECT {id_col}, {tokens_sql()} AS toks FROM tr)))
SELECT {id_col},
       CAST(SUM(CASE WHEN {all_in} THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CASE WHEN sh IN (SELECT sh FROM bsh) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_hits
FROM tsh
GROUP BY {id_col}
HAVING SUM(CASE WHEN {all_in} THEN 1 ELSE 0 END) > 0
"""


# ---------------------------------------------------------------------------
# URL / domain analysis (crawl-corpus provenance profiling)
# ---------------------------------------------------------------------------

#: char-class-only pattern (parses identically under Java regex and RE2);
#: group 1 captures the host.
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def url_domain_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-domain URL and document counts over URLs embedded in text —
    the provenance profile a crawl-based corpus filters on (domain
    allow/deny lists, per-domain caps).

    Scale shape: domain extraction is a map-side regexp over the text;
    only (domain, doc_id) pairs shuffle, distinct-doc counting rides
    the same aggregation."""
    doms = F.expr(
        f"transform(regexp_extract_all({text_col}, '{URL_DOMAIN_RE}', 1), x -> lower(x))"
    )
    return (
        df.select(F.col(id_col), F.explode_outer(doms).alias("domain"))
        .filter(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.count_distinct(F.col(id_col)).cast("bigint").alias("n_docs"),
        )
    )


def url_domain_stats_sql(table: str, id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    return f"""
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs
FROM (SELECT {id_col},
             lower(unnest(regexp_extract_all({text_col}, '{URL_DOMAIN_RE}', 1))) AS domain
      FROM {table})
GROUP BY domain
"""


# ---------------------------------------------------------------------------
# Inverted token index (retrieval primitive: postings + conjunctive
# term queries)
# ---------------------------------------------------------------------------

def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_df: int | None = None,
                   segment_size: int | None = None) -> DataFrame:
    """Posting lists: (token, doc_ids sorted, df_count).  One explode +
    one groupBy keyed on the token — the shuffle moves (token, id)
    pairs, never text.

    The token key is Zipf-skewed, and a stop-word-grade token's
    posting list is O(corpus) doc ids IN ONE ARRAY CELL — a multi-GB
    aggregation buffer no AQE skew-split can divide (skew-split
    splits groups across tasks, not one group's value).  Two
    occupancy controls, both OFF by default (the uncapped form is the
    exact index for bounded corpora):

    - ``max_df`` drops tokens whose document frequency exceeds it
      BEFORE any list materializes (the band_cap/fp_cap recipe —
      head terms carry no selectivity; a query term present in most
      docs prunes nothing).  The dropped-head relation is tiny by
      construction — at most total_pairs/max_df distinct tokens can
      each exceed max_df — so it broadcast-anti-joins against the
      pair stream with no extra shuffle of the pairs.
    - ``segment_size`` splits each retained posting list into
      (token, segment, doc_ids, seg_count, df_count) rows of at most
      ``segment_size`` ids, segments numbered in sorted-doc-id order
      — every array cell is bounded whatever the residual skew, and
      consumers stream a long list segment-by-segment.  The per-token
      window sort spills to disk; an in-buffer collect_list cannot.

    A production web-corpus index sets both; ``conjunctive_query`` /
    ``disjunctive_query`` / ``phrase_query`` never materialize lists
    and are unaffected.  Query terms dropped by ``max_df`` are absent
    from the index — callers treating absence as "matches nothing"
    must keep query vocabularies below the cap (the standard
    stop-word contract)."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_expr(text_col))).alias("token"))
    if max_df is not None:
        head = (toks.groupBy("token")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") > int(max_df)).select("token"))
        toks = toks.join(F.broadcast(head), "token", "left_anti")
    if segment_size is None:
        return toks.groupBy("token").agg(
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.count(F.lit(1)).cast("bigint").alias("df_count"),
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy("token")
    rk = toks.select(
        "token", F.col(id_col),
        (F.row_number().over(w.orderBy(id_col)) - 1).alias("_rn"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("_df"))
    return (rk.withColumn("segment",
                          F.expr(f"_rn div {int(segment_size)}").cast("bigint"))
            .groupBy("token", "segment")
            .agg(F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
                 F.count(F.lit(1)).cast("bigint").alias("seg_count"),
                 F.max("_df").alias("df_count")))


def inverted_index_sql(table: str, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_df: int | None = None,
                       segment_size: int | None = None) -> str:
    """DuckDB twin of :func:`inverted_index` (all parameter forms)."""
    toks = (f"SELECT {id_col}, unnest(list_distinct({tokens_sql(text_col)}))"
            f" AS token FROM {table}")
    kept = "toks"
    head_cte = ""
    if max_df is not None:
        head_cte = (f", head AS (SELECT token FROM toks GROUP BY token"
                    f" HAVING COUNT(*) > {int(max_df)})")
        kept = "(SELECT t.* FROM toks t ANTI JOIN head h USING (token))"
    if segment_size is None:
        return f"""
WITH toks AS ({toks}){head_cte}
SELECT token, list_sort(list({id_col})) AS doc_ids,
       CAST(COUNT(*) AS BIGINT) AS df_count
FROM {kept} GROUP BY token
"""
    return f"""
WITH toks AS ({toks}){head_cte},
rk AS (
  SELECT token, {id_col},
         ROW_NUMBER() OVER (PARTITION BY token ORDER BY {id_col}) - 1 AS _rn,
         CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS _df
  FROM {kept}
)
SELECT token, CAST(_rn // {int(segment_size)} AS BIGINT) AS segment,
       list_sort(list({id_col})) AS doc_ids,
       CAST(COUNT(*) AS BIGINT) AS seg_count,
       MAX(_df) AS df_count
FROM rk GROUP BY token, _rn // {int(segment_size)}
"""


def conjunctive_query(df: DataFrame, terms: list[str], id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Docs containing ALL ``terms``: explode distinct tokens, filter
    to the query terms (a pushed-down IN over the scan — the posting
    read), count per doc, keep count == len(terms).  No index
    materialization needed for one-shot queries; pair with
    :func:`inverted_index` persisted as a table for repeated ones."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_expr(text_col))).alias("token"))
    hits = toks.filter(F.col("token").isin(terms))
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") == len(terms))
        .select(id_col)
    )


def disjunctive_query(df: DataFrame, terms: list[str],
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Docs containing ANY of ``terms``, with the number of DISTINCT
    query terms present — (id, n_hits), the OR-query with a
    ranking-ready hit count (n_hits is the coordination score a
    boolean retriever sorts by before any tf-idf refinement).  Same
    pushed-down IN over the distinct-token explode as
    :func:`conjunctive_query`: one shuffle keyed on the doc id, never
    a posting-list materialization — a stop-word-grade query term
    costs its (token, id) pair volume but no giant array."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_expr(text_col))).alias("token"))
    return (toks.filter(F.col("token").isin(terms))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))


def disjunctive_query_sql(table: str, terms: list[str],
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB twin of :func:`disjunctive_query`."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(list_distinct({tokens_sql(text_col)})) AS token
  FROM {table}
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM toks WHERE token IN ({in_list})
GROUP BY {id_col}
"""


def phrase_query(df: DataFrame, phrase: list[str], id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Docs containing the EXACT consecutive token sequence ``phrase``
    — the positional-index query conjunctive retrieval cannot answer
    (AND says the terms co-occur somewhere; phrase says they are
    adjacent in order).

    Anchor trick instead of an n-way self-join: every occurrence of
    phrase term i at position p votes for anchor p - i; an anchor
    collecting all len(phrase) DISTINCT term indices is a true start
    position.  One posexplode (positions this time, not distinct
    tokens), a broadcast join against the len(phrase)-row (term, idx)
    relation, one (id, anchor) groupBy — shuffle volume is the
    matched-term pair count, never positions^n, and repeated terms in
    the phrase ("buffalo buffalo") fall out naturally because each
    occurrence votes once per index the term holds."""
    spark = df.sparkSession
    ti = literal_df(spark, 
        [(t, i) for i, t in enumerate(phrase)], "token string, idx int")
    pos = df.select(
        F.col(id_col), F.posexplode(tokens_expr(text_col)).alias("pos", "token"))
    votes = (pos.join(F.broadcast(ti), "token")
             .select(F.col(id_col), (F.col("pos") - F.col("idx")).alias("anchor"),
                     "idx"))
    return (votes.where(F.col("anchor") >= 0)
            .groupBy(id_col, "anchor")
            .agg(F.count_distinct("idx").alias("__n"))
            .where(F.col("__n") == len(phrase))
            .select(id_col).distinct())


def phrase_query_sql(table: str, phrase: list[str], id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB twin of :func:`phrase_query` (0-based lockstep unnest
    mirrors posexplode)."""
    arms = " UNION ALL ".join(
        "SELECT '" + t.replace("'", "''") + f"' AS token, {i} AS idx"
        for i, t in enumerate(phrase))
    return f"""
WITH pos AS (
  SELECT {id_col}, unnest(toks) AS token,
         unnest(range(len(toks))) AS pos
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})
),
ti AS ({arms}),
votes AS (
  SELECT {id_col}, pos - idx AS anchor, idx
  FROM pos JOIN ti USING (token)
  WHERE pos - idx >= 0
)
SELECT DISTINCT {id_col} FROM votes
GROUP BY {id_col}, anchor
HAVING COUNT(DISTINCT idx) = {len(phrase)}
"""


def bm25_rank(df: DataFrame, terms: list[str], id_col: str = "doc_id",
              text_col: str = "text", k: int = 10) -> DataFrame:
    """Top-``k`` docs for ``terms`` under BM25 with the standard
    constants k1 = 1.2, b = 0.75 — the ranking completion of the
    boolean retrieval family (conjunctive/disjunctive/phrase say WHICH
    docs match; BM25 says in what ORDER to read them).

    Integer-exact cross-engine scoring (the tfidf_top_terms recipe,
    extended): with k1 = 6/5 and b = 3/4, the per-term saturation
    weight clears its denominators exactly —

        tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
          = 44*tf*T / (20*tf*T + 6*T + 18*dl*N)      (avgdl = T/N)

    and the idf takes the RATIONAL Robertson form (N - df + 0.5) /
    (df + 0.5) = (2N - 2df + 1)/(2df + 1), log-free and per-term
    monotone in df exactly like the ln forms (Lucene's ln(1 + .)
    included).  Each term contributes floor(1e6 * weight * idf)
    computed in DECIMAL(38,0) / HUGEINT integer arithmetic — no
    doubles, no libm, bit-identical across engines; the ppm
    quantization is far finer than Lucene's own byte-quantized norms.
    Documented variant: because the rational idf grows ~N/df instead
    of ln(N/df), multi-term SUMS weight rare terms more sharply than
    the ln form — same per-term orderings, not score-identical to
    Lucene.

    Shape: doc length and the (N, T) corpus stats never explode —
    ``size(tokens)`` is a map-side projection, so they cost one narrow
    scan (stats) plus a map-side relation (dl); only the pushed-down
    IN scan for term frequencies explodes, and it keeps query-term
    rows only.  docfreq is a <= len(terms)-row broadcast chained on
    tf; corpus stats are a 1-row broadcast; the top-k is a
    distributed TakeOrdered.  No posting list is ever materialized —
    a stop-word query term costs its (token, id) pair volume, never a
    giant array."""
    from pyspark.sql import Window

    with_toks = df.withColumn("__toks", tokens_expr(text_col))
    # (n_docs, t_total) in ONE corpus pass, no explode
    stats = with_toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("__toks")).cast("bigint").alias("t_total"))
    # per-doc length: map-side only (no shuffle until the tf join)
    dl = with_toks.select(F.col(id_col),
                          F.size("__toks").cast("bigint").alias("dl"))
    tf = (with_toks.select(F.col(id_col),
                           F.explode("__toks").alias("token"))
          .filter(F.col("token").isin(terms))
          .groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    # (docs-with-hits x terms) rows — materialize once so the docfreq
    # branch and the scoring join don't each re-run the corpus
    # explode (the q247 shared-leg lesson)
    tf = tf.localCheckpoint()
    # one row per (doc, term) -> row count per term IS the doc frequency
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (tf.join(dl, id_col)
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(stats))
              .select(
                  F.col(id_col),
                  F.expr(
                      "(CAST(1000000 AS DECIMAL(38,0)) * 44 * tf * t_total"
                      " * (2*n_docs - 2*df + 1))"
                      " DIV ((CAST(20 AS DECIMAL(38,0)) * tf * t_total"
                      "       + CAST(6 AS DECIMAL(38,0)) * t_total"
                      "       + CAST(18 AS DECIMAL(38,0)) * dl * n_docs)"
                      "      * (2*df + 1))").alias("s")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.sum("s").cast("bigint").alias("score_x1e6")))
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # partial top-k, never the whole doc relation through one window
    # partition), then ranks over the k survivors
    topk = per_doc.orderBy(F.desc("score_x1e6"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_x1e6"), F.asc(id_col))
    return topk.select(id_col, "score_x1e6",
                       F.row_number().over(w).cast("bigint").alias("rank"))


def bm25_rank_sql(table: str, terms: list[str], id_col: str = "doc_id",
                  text_col: str = "text", k: int = 10) -> str:
    """DuckDB twin of :func:`bm25_rank` (HUGEINT stands in for
    DECIMAL(38,0); `//` is floor division on positive integers exactly
    like Spark's DIV)."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({tokens_sql(text_col)}) AS token FROM {table}
),
dl AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
t AS (SELECT CAST(SUM(dl) AS BIGINT) AS t_total FROM dl),
tf AS (
  SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token IN ({in_list}) GROUP BY 1, 2
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.{id_col},
         (CAST(1000000 AS HUGEINT) * 44 * tf * t_total
          * (2*n_docs - 2*df + 1))
         // ((CAST(20 AS HUGEINT) * tf * t_total
              + CAST(6 AS HUGEINT) * t_total
              + CAST(18 AS HUGEINT) * dl * n_docs)
             * (2*df + 1)) AS s
  FROM tf JOIN dl USING ({id_col}) JOIN dfreq USING (token), n, t
),
per_doc AS (
  SELECT {id_col}, CAST(SUM(s) AS BIGINT) AS score_x1e6
  FROM scored GROUP BY 1
)
SELECT {id_col}, score_x1e6, rank FROM (
  SELECT {id_col}, score_x1e6,
         CAST(ROW_NUMBER() OVER (ORDER BY score_x1e6 DESC, {id_col})
              AS BIGINT) AS rank
  FROM per_doc
) WHERE rank <= {k}
"""


def bm25_index(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               max_df: int | None = None) -> tuple[DataFrame, DataFrame]:
    """Build-once relations for :func:`bm25_query` — the
    index-then-query-many lifecycle (the sketch-ledger pattern: one
    corpus pass at build time, every later query costs only its own
    postings).  Returns ``(postings, doclens)``:

    - ``postings``: (token, id, tf) — the tf-weighted posting
      relation.  Persist it partitioned/sorted BY TOKEN (e.g.
      ``.write.partitionBy()``/bucketing on token): a query's IN
      filter then prunes to the query terms' row groups instead of
      scanning the corpus index.  ``max_df`` drops stop-word-grade
      head terms exactly as :func:`inverted_index` does — they carry
      no ranking selectivity and their posting volume is O(corpus).
    - ``doclens``: (id, dl) — per-doc token counts, map-side derived;
      n_docs / total-token stats are one cheap aggregate over it at
      query time, so no separate stats artifact can drift out of sync
      with the doclens ledger.

    :func:`bm25_query` over these relations is row-identical to
    :func:`bm25_rank` on the same corpus (unit-pinned) when the
    build and the one-shot form use the same ``max_df`` (default
    None)."""
    with_toks = df.withColumn("__toks", tokens_expr(text_col))
    doclens = with_toks.select(F.col(id_col).alias("id"),
                               F.size("__toks").cast("bigint").alias("dl"))
    postings = (with_toks.select(F.col(id_col).alias("id"),
                                 F.explode("__toks").alias("token"))
                .groupBy("token", "id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    if max_df is not None:
        dfreq = (postings.groupBy("token")
                 .agg(F.count(F.lit(1)).alias("__df")))
        head = dfreq.where(F.col("__df") > max_df).select("token")
        postings = postings.join(F.broadcast(head), "token", "left_anti")
    return postings, doclens


def bm25_query(postings: DataFrame, doclens: DataFrame, terms: list[str],
               k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` BM25 ranking from persisted :func:`bm25_index`
    relations — identical scoring to :func:`bm25_rank` (same integer
    arithmetic, same output schema with ``id_col`` naming), but the
    corpus is never re-tokenized: the query reads its terms' postings
    (a pushed-down IN over the persisted relation — with the ledger
    laid out by token, that's a pruned scan) plus one aggregate over
    the doc-bounded doclens relation for (N, T)."""
    from pyspark.sql import Window

    stats = doclens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("t_total"))
    tf = postings.filter(F.col("token").isin(terms)).localCheckpoint()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (tf.join(doclens, "id")
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(stats))
              .select(
                  F.col("id"),
                  F.expr(
                      "(CAST(1000000 AS DECIMAL(38,0)) * 44 * tf * t_total"
                      " * (2*n_docs - 2*df + 1))"
                      " DIV ((CAST(20 AS DECIMAL(38,0)) * tf * t_total"
                      "       + CAST(6 AS DECIMAL(38,0)) * t_total"
                      "       + CAST(18 AS DECIMAL(38,0)) * dl * n_docs)"
                      "      * (2*df + 1))").alias("s")))
    per_doc = (scored.groupBy("id")
               .agg(F.sum("s").cast("bigint").alias("score_x1e6")))
    topk = per_doc.orderBy(F.desc("score_x1e6"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score_x1e6"), F.asc("id"))
    return topk.select(F.col("id").alias(id_col), "score_x1e6",
                       F.row_number().over(w).cast("bigint").alias("rank"))


def mix_to_budget(df: DataFrame, budgets: dict[str, int],
                  id_col: str = "doc_id", source_col: str = "source",
                  weight_col: str = "n_chars",
                  expected_totals: dict[str, int] | None = None,
                  margin: float = 1.5) -> DataFrame:
    """Budgeted source mixing: training mixtures are specified in
    TOKENS, not document counts (mix_sources' rate form) — keep, per
    source, the md5-order-smallest documents until the cumulative
    ``weight_col`` reaches the source's budget (the straddling document
    is kept, so each source lands within one document of its budget).
    Deterministic: the kept set is a pure function of (ids, budgets),
    reproducible across runs/engines; ``id_col`` must be unique.
    Sources absent from ``budgets`` are dropped.  Budgets travel as a
    BROADCAST rules relation, not a CASE chain — expression depth is
    constant whether 3 sources or 10^5 (the assign_chunk_id lesson:
    nested when-chains StackOverflow near 1k arms).

    Scale shape: the running sum needs a per-source ordered window —
    a shuffle partitioned by the (few, skewed) sources.  The fix is
    the same hash-prefix pre-filter as sketch.kmv_build: pass
    ``expected_totals`` (per-source total weight, one stats pass or a
    histogram sketch away) and only ~margin*budget worth of the
    hash-smallest rows per source enter the sort; everything else
    drops map-side.  Identical to the unfiltered result whenever
    ``margin`` exceeds any OVERestimation factor of
    ``expected_totals`` (underestimates only widen the filter);
    failure is detectable: a pre-filtered source whose kept weight
    lands below budget while the source had more data means the bound
    cut — rerun that source unfiltered (both pinned in test_llm)."""
    from pyspark.sql.window import Window

    space = 16 ** 15
    out_cols = df.columns
    rows = []
    for src in sorted(budgets):
        if expected_totals:
            frac = min(1.0, margin * budgets[src]
                       / max(1, expected_totals.get(src, 0)))
            bound = int(frac * space) + 1
        else:
            bound = space + 1   # no pre-filter: every hash qualifies
        rows.append((src, float(budgets[src]), bound))
    rules = literal_df(df.sparkSession, 
        rows, f"{source_col} string, __budget double, __hbound bigint")
    hexp = F.md5(F.col(id_col).cast("string"))
    hnum = F.conv(F.substring(hexp, 1, 15), 16, 10).cast("bigint")
    d = (df.join(F.broadcast(rules), source_col)  # inner: unlisted sources drop
         .where(hnum < F.col("__hbound")))
    w = Window.partitionBy(source_col).orderBy(hexp)
    return (d.withColumn("__cum", F.sum(F.col(weight_col)).over(w))
            .where((F.col("__cum") - F.col(weight_col)) < F.col("__budget"))
            .select(*out_cols))


def mix_to_budget_sql(table: str, budgets: dict[str, int],
                      id_col: str = "doc_id", source_col: str = "source",
                      weight_col: str = "n_chars") -> str:
    srcs = sorted(budgets)
    inlist = ", ".join(f"'{s}'" for s in srcs)
    arms = " ".join(f"WHEN '{s}' THEN {float(budgets[s])}" for s in srcs)
    return f"""
SELECT * EXCLUDE (__cum) FROM (
  SELECT *, SUM({weight_col}) OVER (
      PARTITION BY {source_col}
      ORDER BY md5(CAST({id_col} AS VARCHAR))) AS __cum
  FROM {table} WHERE {source_col} IN ({inlist})
)
WHERE __cum - {weight_col} < (CASE {source_col} {arms} END)
"""


def split_assign(df: DataFrame, weights: dict[str, float],
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test splitting: append a ``split``
    column assigning each document to a named split with the given
    weights (fractions summing to ~1; the last split absorbs
    remainder).  Assignment is the md5 of the id against cumulative
    thresholds over a 60-bit hash space — a pure function of the id,
    so membership is stable across runs, engines, and corpus growth
    (a document never migrates between splits when other documents
    arrive, the property seeded randomSplit cannot give).  Map-side
    only: no shuffle, no RNG state."""
    space = 16 ** 15
    names = sorted(weights)
    acc, cuts = 0.0, []
    for name in names[:-1]:
        acc += weights[name]
        cuts.append((name, int(acc * space)))
    hnum = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                  16, 10).cast("bigint")
    expr = None
    for name, cut in cuts:
        c = hnum < F.lit(cut)
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    split = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", split)


def split_assign_sql(table: str, weights: dict[str, float],
                     id_col: str = "doc_id") -> str:
    space = 16 ** 15
    names = sorted(weights)
    acc, arms = 0.0, []
    for name in names[:-1]:
        acc += weights[name]
        arms.append(f"WHEN h < {int(acc * space)} THEN '{name}'")
    case = (f"CASE {' '.join(arms)} ELSE '{names[-1]}' END"
            if arms else f"'{names[-1]}'")
    return f"""
SELECT * EXCLUDE (h) FROM (
  SELECT *, ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}
) t, LATERAL (SELECT {case} AS split) s
"""


# ---------------------------------------------------------------------------
# Corpus-relative quality scoring (the CCNet idea without an external
# LM: docs whose tokens are RARE in the reference corpus score low)
# ---------------------------------------------------------------------------

def token_frequency_model(ref: DataFrame, text_col: str = "text",
                          min_count: int = 1) -> DataFrame:
    """Unigram model relation (tok, cnt) from a reference corpus —
    one explode + partial-aggregated groupBy; persist it and score
    any number of batches without re-reading the reference (the same
    summarize-once lifecycle as the sketches)."""
    return (ref.select(F.explode(tokens_expr(text_col)).alias("tok"))
            .groupBy("tok").agg(F.count("*").cast("bigint").alias("cnt"))
            .where(F.col("cnt") >= min_count))


def token_frequency_model_sql(table: str, text_col: str = "text",
                              min_count: int = 1) -> str:
    return f"""
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest({tokens_sql(text_col)}) AS tok FROM {table})
GROUP BY tok HAVING COUNT(*) >= {min_count}
"""


def corpus_frequency_score(docs: DataFrame, model: DataFrame,
                           id_col: str = "doc_id", text_col: str = "text",
                           broadcast_model: bool = True) -> DataFrame:
    """Corpus-relative quality: per doc, the mean reference-corpus
    count of its tokens (out-of-vocabulary tokens count 0) — the
    integer-exact stand-in for CCNet's LM-perplexity filter: fluent
    text made of common words scores high, OCR noise / boilerplate /
    wrong-language text scores low.  Returns (id, n_tokens,
    mean_tok_freq_x1000 BIGINT).  Token rows left-join the model
    (broadcast by default — vocabularies of 10^8+ distinct tokens
    should pass broadcast_model=False for a shuffle join on tok, the
    tfidf_top_terms recipe) and fold into ONE per-doc partial
    aggregation; the x1000 fixed-point mean keeps the gate
    bit-identical cross-engine."""
    toks = docs.select(F.col(id_col),
                       F.explode(tokens_expr(text_col)).alias("tok"))
    m = F.broadcast(model) if broadcast_model else model
    joined = toks.join(m, "tok", "left")
    return (joined.groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.expr("(SUM(COALESCE(cnt, 0)) * 1000) DIV COUNT(*)")
                 .cast("bigint").alias("mean_tok_freq_x1000")))


def corpus_frequency_score_sql(docs_table: str, model_sql: str,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> str:
    return f"""
WITH m AS ({model_sql}),
toks AS (
  SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {docs_table}
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST((SUM(COALESCE(cnt, 0)) * 1000) // COUNT(*) AS BIGINT) AS mean_tok_freq_x1000
FROM toks LEFT JOIN m USING (tok)
GROUP BY {id_col}
"""


def compression_ratio(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", level: int = 6) -> DataFrame:
    """Gopher's compression-quality signal: zlib-compressed size over
    raw utf-8 size per document — boilerplate/repetitive junk
    compresses far below fluent prose, so a low ratio flags low-value
    text the word-level heuristics (repetition_signals) can miss.
    (id, n_bytes, compressed_bytes, compression_ratio); empty/NULL
    text reports ratio 1.0 (nothing to judge).  Arrow-batched
    mapInPandas like the charset hops — zlib is not expressible in
    either SQL dialect, so this op is unit-tested rather than
    oracle-gated (the one such exception among the text ops; zlib's
    DEFLATE output at a fixed level is platform-stable in CPython, so
    the numbers are still deterministic)."""
    import pandas as pd

    out_schema = (f"{id_col} bigint, n_bytes bigint, compressed_bytes bigint, "
                  f"compression_ratio double")
    src = df.select(F.col(id_col), F.col(text_col).alias("__text"))

    def _score(batches):
        import zlib
        for pdf in batches:
            texts = pdf["__text"].fillna("")
            raw = [t.encode("utf-8") for t in texts]
            comp = [len(zlib.compress(b, level)) for b in raw]
            n = [len(b) for b in raw]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": n,
                "compressed_bytes": comp,
                "compression_ratio": [
                    (c / b) if b else 1.0 for c, b in zip(comp, n)],
            })

    return src.mapInPandas(_score, out_schema)


def c4_line_filter(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_line_words: int = 3) -> DataFrame:
    """C4's line-level cleaning (Raffel et al. 2020 §2.2), the
    rule-set the canonical web-corpus pipeline applies BEFORE the
    document-level heuristics: keep only lines that end in terminal
    punctuation and have at least ``min_line_words`` words, drop any
    document containing '{' (leaked code/markup) or the phrase
    'lorem ipsum', and drop documents left empty by the line pass.
    Returns (id, text, n_lines_kept, n_lines_dropped) with the
    reassembled text.  Pure array expressions — one map-side pass,
    codegen'd, no Python."""
    lines = f"split({text_col}, '\\n')"
    keep = (f"filter(transform({lines}, x -> trim(x)), x -> "
            f"size(filter(split(x, '\\\\s+'), w -> w != '')) >= {min_line_words} "
            f"AND x rlike '[.!?\"]$')")
    kept = df.select(
        F.col(id_col),
        F.col(text_col).alias("__orig"),
        F.expr(keep).alias("__kept"),
        F.expr(f"size(split({text_col}, '\\n'))").alias("__n_lines"))
    return (kept
            .where(~F.lower("__orig").contains("lorem ipsum"))
            .where(~F.col("__orig").contains("{"))
            .where(F.expr("size(__kept) > 0"))
            .select(
                id_col,
                F.array_join("__kept", "\n").alias(text_col),
                F.expr("CAST(size(__kept) AS BIGINT)").alias("n_lines_kept"),
                F.expr("CAST(__n_lines - size(__kept) AS BIGINT)")
                .alias("n_lines_dropped")))


def c4_line_filter_sql(table: str, id_col: str = "doc_id",
                       text_col: str = "text", min_line_words: int = 3) -> str:
    lines = f"string_split({text_col}, chr(10))"
    keep = (f"list_filter(list_transform({lines}, x -> trim(x)), x -> "
            f"len(list_filter(string_split_regex(x, '\\s+'), w -> w != '')) >= {min_line_words} "
            f"AND regexp_matches(x, '[.!?\"]$'))")
    return f"""
SELECT {id_col},
       array_to_string(kept, chr(10)) AS {text_col},
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       CAST(n_lines - len(kept) AS BIGINT) AS n_lines_dropped
FROM (
  SELECT {id_col}, {text_col} AS orig, {keep} AS kept,
         len({lines}) AS n_lines
  FROM {table}
)
WHERE NOT contains(lower(orig), 'lorem ipsum')
  AND NOT contains(orig, '{{')
  AND len(kept) > 0
"""


# ---------------------------------------------------------------------------
# Web-corpus text canonicalization: HTML stripping + Unicode NFC
# ---------------------------------------------------------------------------

#: entity -> replacement, applied AFTER tag removal (order matters:
#: &amp; last so '&amp;lt;' becomes '&lt;' literally, not '<')
_HTML_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                  ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def strip_html(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """HTML-to-text pre-pass (the step before any quality/dedup stage
    on crawled pages): drop <script>/<style> blocks with their
    contents, remove all remaining tags, decode the six ubiquitous
    entities, collapse whitespace runs.  Pure regexp_replace chain —
    whole-stage codegen, zero shuffle, no Python (a full HTML5 parser
    is deliberately out of scope: corpus pipelines use exactly this
    tag-strip + entity-decode form because parser-grade fidelity
    costs 100x for boilerplate that later stages drop anyway)."""
    e = F.col(text_col)
    # two explicit block patterns (not a backreference): the DuckDB
    # twin runs on RE2, which has no backreferences — keep the
    # pattern language identical on both engines
    e = F.regexp_replace(e, r"(?is)<script\b.*?</script\s*>", " ")
    e = F.regexp_replace(e, r"(?is)<style\b.*?</style\s*>", " ")
    e = F.regexp_replace(e, r"(?s)<!--.*?-->", " ")
    e = F.regexp_replace(e, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        e = F.regexp_replace(e, ent, rep)
    e = F.trim(F.regexp_replace(e, r"\s+", " "))
    return df.select(F.col(id_col), e.alias(text_col))


def strip_html_sql(table: str, id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """DuckDB twin of :func:`strip_html` (global-flag regexp_replace)."""
    e = text_col
    e = f"regexp_replace({e}, '(?is)<script\\b.*?</script\\s*>', ' ', 'g')"
    e = f"regexp_replace({e}, '(?is)<style\\b.*?</style\\s*>', ' ', 'g')"
    e = f"regexp_replace({e}, '(?s)<!--.*?-->', ' ', 'g')"
    e = f"regexp_replace({e}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, rep in _HTML_ENTITIES:
        rep = rep.replace("'", "''")
        e = f"replace({e}, '{ent}', '{rep}')"
    e = f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"
    return f"SELECT {id_col}, {e} AS {text_col} FROM {table}"


def normalize_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unicode canonicalization for dedup keys: NFC composition →
    lowercase → whitespace collapse.  Visually-identical strings that
    differ only in combining-mark encoding ('é' as U+00E9 vs
    e+U+0301) hash to DIFFERENT md5s and silently defeat every exact/
    minhash/fingerprint dedup stage — this is the fix, run once at
    ingest.

    NFC needs the Unicode composition tables, which Spark SQL does not
    expose — Arrow-batched ``mapInPandas`` over Python's unicodedata
    (the ingest_charset pattern; both it and DuckDB's nfc_normalize
    implement the same Unicode standard, so the twin is exact).
    Lower/collapse run in the same batch to keep it one Python hop.

    Returns ALL input columns in the input order with ``text_col``
    replaced in place — a run-once-at-ingest canonicalizer must not
    strip source/lang/timestamp metadata (an earlier form selected
    (id, text) only, silently dropping the rest while still paying
    the Arrow transfer for them).  Project before calling if only the
    (id, text) pair should cross the Python hop."""
    import unicodedata

    from pyspark.sql import types as T

    schema = T.StructType(
        [f if f.name != text_col else T.StructField(text_col, T.StringType())
         for f in df.schema.fields])

    def norm(batches):
        import re as _re

        ws = _re.compile(r"\s+")
        for pdf in batches:
            out = pdf.copy()
            out[text_col] = pdf[text_col].map(
                lambda s: ws.sub(" ", unicodedata.normalize("NFC", s)
                                 .lower()).strip()
                if s is not None else None)
            yield out[[f.name for f in schema.fields]]

    return df.mapInPandas(norm, schema)


def normalize_text_sql(table: str, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin of :func:`normalize_text` (all columns pass
    through, ``text_col`` replaced in place)."""
    return (f"SELECT * REPLACE (trim(regexp_replace(lower(nfc_normalize("
            f"{text_col})), '\\s+', ' ', 'g')) AS {text_col}) FROM {table}")


def adaptive_length_filter(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           lo_p: float = 0.01, hi_p: float = 0.99,
                           max_tokens: float = 2048.0,
                           nbins: int = 256,
                           group_col: str | None = None) -> DataFrame:
    """Self-calibrating token-length band: keep docs whose token count
    lies within the corpus's own [lo_p, hi_p] quantile band — fixed
    length cutoffs tuned on one corpus (C4's min-words, Gopher's
    bands) misfire on the next (code vs prose vs chat); the
    percentile band adapts per corpus and per refresh.

    Bounds come from the HISTOGRAM SKETCH (one partial-aggregated
    ≤nbins-row pass, error ≤ one bin width of [0, max_tokens]), never
    a sort — then one broadcast of the 2-value bound relation and a
    map-side filter: two table passes total at any corpus size.
    Token counts above ``max_tokens`` clamp into the last bin (the
    hist contract) and the FILTER comparison clamps the same way
    (least(n_toks, max_tokens)), so hi_p near 1.0 keeps over-long
    docs — max_tokens is the sketch's resolution ceiling, NOT a hard
    length cutoff (an unclamped comparison would silently drop every
    doc past max_tokens regardless of hi_p, and the differential gate
    could never see it because the twin clamps identically).  The
    documented use is trimming BOTH tails.  Returns the surviving
    rows of ``df`` unchanged, in the input column order.  With
    ``group_col`` the band is computed PER GROUP (sources differ
    wildly in length distribution — one global band over-trims the
    short-form source and under-trims the long-form one); the bounds
    relation is one row per group, broadcast back null-safely, so
    rows with a NULL group form their own band instead of being
    silently dropped by the equi-join.
    """
    from dbms_spark.operators.sketch import (hist_build, hist_by,
                                             hist_quantiles,
                                             hist_quantiles_by)

    toks = df.withColumn(
        "_n_toks", F.size(tokens_expr(text_col)).cast("double"))
    # the histogram clamps counts above max_tokens into the last bin;
    # the filter must compare the SAME clamped value or over-long docs
    # fall outside every band
    clamped = F.least(F.col("_n_toks"), F.lit(float(max_tokens)))
    if group_col is not None:
        h = hist_by(toks, group_col, "_n_toks", 0.0, float(max_tokens), nbins)
        qs = hist_quantiles_by(h, group_col, [lo_p, hi_p],
                               0.0, float(max_tokens), nbins)
        width = float(max_tokens) / float(nbins)
        bounds = qs.groupBy(group_col).agg(
            (F.floor(F.min("value") / width) * width).alias("_lo_v"),
            (F.floor(F.max("value") / width) * width + width).alias("_hi_v"))
        bounds = bounds.withColumnRenamed(group_col, "_g")
        return (toks.join(F.broadcast(bounds),
                          F.col(group_col).eqNullSafe(F.col("_g")))
                .where(clamped.between(F.col("_lo_v"), F.col("_hi_v")))
                .select(*df.columns))
    h = hist_build(toks, "_n_toks", 0.0, float(max_tokens), nbins)
    qs = hist_quantiles(h, [lo_p, hi_p], 0.0, float(max_tokens), nbins)
    # bin-align the bounds OUTWARD: the sketch's quantile interpolates
    # INSIDE the covering bin, so a length atom sitting exactly on a
    # mass bin's edge (every doc 50 tokens -> p05 estimate 50.05)
    # would fall outside a raw [p05, p95] band and the filter would
    # drop the entire body of the corpus.  Snapping lo down / hi up to
    # bin edges keeps every bin the quantile band touches.
    width = float(max_tokens) / float(nbins)
    bounds = qs.agg(
        (F.floor(F.min("value") / width) * width).alias("_lo_v"),
        (F.floor(F.max("value") / width) * width + width).alias("_hi_v"))
    return (toks.crossJoin(F.broadcast(bounds))
            .where(clamped.between(F.col("_lo_v"), F.col("_hi_v")))
            .select(*df.columns))


def adaptive_length_filter_sql(table: str, id_col: str = "doc_id",
                               text_col: str = "text",
                               lo_p: float = 0.01, hi_p: float = 0.99,
                               max_tokens: float = 2048.0,
                               nbins: int = 256,
                               group_col: str | None = None) -> str:
    """DuckDB twin of :func:`adaptive_length_filter` (grouped form
    with ``group_col``)."""
    from dbms_spark.operators.sketch import (hist_build_sql, hist_by_sql,
                                             hist_quantiles_by_sql,
                                             hist_quantiles_sql)

    toks = (f"SELECT *, CAST(len({tokens_sql(text_col)}) AS DOUBLE) AS _n_toks "
            f"FROM {table}")
    width = float(max_tokens) / float(nbins)
    clamped = f"least(_n_toks, {float(max_tokens)})"
    if group_col is not None:
        h = hist_by_sql(f"({toks})", group_col, "_n_toks",
                        0.0, float(max_tokens), nbins)
        qs = hist_quantiles_by_sql(f"({h})", group_col, [lo_p, hi_p],
                                   0.0, float(max_tokens), nbins)
        return f"""
WITH toks AS ({toks}),
bounds AS (SELECT {group_col} AS _g,
                  floor(MIN(value) / {width}) * {width} AS _lo_v,
                  floor(MAX(value) / {width}) * {width} + {width} AS _hi_v
           FROM ({qs}) GROUP BY {group_col})
SELECT toks.* EXCLUDE (_n_toks)
FROM toks JOIN bounds ON toks.{group_col} IS NOT DISTINCT FROM bounds._g
WHERE {clamped} BETWEEN _lo_v AND _hi_v
"""
    h = hist_build_sql(f"({toks})", "_n_toks", 0.0, float(max_tokens), nbins)
    qs = hist_quantiles_sql(f"({h})", [lo_p, hi_p], 0.0, float(max_tokens), nbins)
    return f"""
WITH toks AS ({toks}),
bounds AS (SELECT floor(MIN(value) / {width}) * {width} AS _lo_v,
                  floor(MAX(value) / {width}) * {width} + {width} AS _hi_v
           FROM ({qs}))
SELECT toks.* EXCLUDE (_n_toks) FROM toks, bounds
WHERE {clamped} BETWEEN _lo_v AND _hi_v
"""


def top_terms(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", k: int = 5,
              min_df: int = 1, max_df: int | None = None) -> DataFrame:
    """SALIENT-TERM extraction: each document's top-``k`` tokens by
    integer LIFT — how over-represented the token is in the doc
    relative to the corpus:

        lift_ppm = floor(1e6 · tf · N / (len_d · df))

    (tf = in-doc count, len_d = doc tokens, df = docs containing the
    token, N = corpus docs).  The log-free sibling of tf·idf, same
    rationale as :func:`token_cooccurrence`: log is monotone per
    token, integer lift keeps the gate hash-exact; the cross-token
    ordering weights rare terms more sharply than ln — documented,
    deliberate.  ``min_df``/``max_df`` drop hapax noise and stop-word
    heads before ranking (the usual occupancy controls).

    Returns (id, token, tf, df, lift_ppm, rank), rank 1..k per doc by
    (lift desc, token asc).

    Shape: one (id, token) partial-agg for tf (+ len via a same-pass
    window-free sum), one token partial-agg for df, a token join, a
    bounded per-doc top-k window — never a doc×vocab matrix."""
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col),
                     F.explode(tokens_expr(text_col)).alias("token"))
    tf = (toks.groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    dlen = (tf.groupBy(id_col)
            .agg(F.sum("tf").cast("bigint").alias("__len")))
    dfreq = (tf.groupBy("token")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df")))
    keep = dfreq.where(F.col("df") >= min_df)
    if max_df is not None:
        keep = keep.where(F.col("df") <= max_df)
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    scored = (tf.join(keep, "token").join(dlen, id_col)
              .crossJoin(F.broadcast(n))
              .select(F.col(id_col), "token", "tf", "df",
                      F.expr("(CAST(1000000 AS DECIMAL(38,0)) * tf * __n)"
                             " DIV (CAST(__len AS DECIMAL(38,0)) * df)")
                      .cast("bigint").alias("lift_ppm")))
    w = (Window.partitionBy(id_col)
         .orderBy(F.desc("lift_ppm"), F.asc("token")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k))


def top_terms_sql(table: str, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 5,
                  min_df: int = 1, max_df: int | None = None) -> str:
    """DuckDB twin of :func:`top_terms`."""
    maxdf = f"AND df <= {max_df}" if max_df is not None else ""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({tokens_sql(text_col)}) AS token FROM {table}
),
tf AS (SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
dlen AS (SELECT {id_col}, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
scored AS (
  SELECT tf.{id_col}, tf.token, tf.tf, dfreq.df,
         CAST((CAST(1000000 AS HUGEINT) * tf.tf * n.n_docs)
              // (CAST(dlen.len AS HUGEINT) * dfreq.df) AS BIGINT)
           AS lift_ppm
  FROM tf JOIN dfreq USING (token) JOIN dlen USING ({id_col}), n
  WHERE dfreq.df >= {min_df} {maxdf}
)
SELECT {id_col}, token, tf, df, lift_ppm,
       CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
            ORDER BY lift_ppm DESC, token) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# URL canonicalization + URL-keyed dedup — the cheapest dedup a crawl
# pipeline runs, BEFORE any content is fetched or hashed: the same
# page hides behind scheme/host case, www., default ports, fragments,
# tracking params, param order, and trailing slashes.  Pure map-side
# string expressions (both dialects share every primitive's semantics
# — regexp_extract empty-on-miss, split('','&') = [''], binary-order
# array_sort — probe-verified), so the canon key shuffles instead of
# the URL text.
# ---------------------------------------------------------------------------

#: query params that never identify content (trackers)
_TRACKING_PARAM_PREDS = ("x LIKE 'utm_%'", "x LIKE 'gclid=%'",
                         "x LIKE 'fbclid=%'", "x LIKE 'ref=%'")


def canonicalize_url_expr(col: str = "url") -> str:
    """Spark SQL expression: canonical form of an absolute http(s)
    URL.  Steps (each order-independent of param order, case, etc.):
    drop fragment; lowercase scheme and host; strip ``www.`` and the
    scheme's default port; collapse the path's trailing slash (root
    stays ``/``, an empty path becomes ``/``); drop tracking params;
    SORT the surviving query params (binary order).  Malformed rows
    (no scheme://host) canonicalize to NULL so they can be routed to
    a quarantine instead of colliding on ''."""
    u = f"regexp_replace({col}, '#.*$', '')"
    base = f"regexp_extract({u}, '^([^?]*)', 1)"
    query = f"regexp_extract({u}, '^[^?]*\\\\?(.*)$', 1)"
    scheme = f"lower(regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (f"regexp_replace(lower(regexp_extract({base},"
                f" '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1)),"
                f" '^www\\\\.', '')")
    host = (f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '')"
            f" WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '')"
            f" ELSE {hostport} END")
    path = (f"regexp_extract({base},"
            f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$', 1)")
    path_c = (f"CASE WHEN {path} IN ('', '/') THEN '/'"
              f" ELSE regexp_replace({path}, '/$', '') END")
    drop = " OR ".join(_TRACKING_PARAM_PREDS)
    params = f"filter(split({query}, '&'), x -> x != '' AND NOT ({drop}))"
    qsorted = f"array_join(array_sort({params}), '&')"
    return (f"CASE WHEN {scheme} = '' OR {host} = '' THEN NULL"
            f" ELSE concat({scheme}, '://', {host}, {path_c},"
            f" CASE WHEN {qsorted} = '' THEN '' ELSE concat('?', {qsorted}) END)"
            f" END")


def canonicalize_url_sql_expr(col: str = "url") -> str:
    """DuckDB twin of :func:`canonicalize_url_expr` — same steps,
    same regexes (probe-verified primitive-identical semantics)."""
    u = f"regexp_replace({col}, '#.*$', '')"
    base = f"regexp_extract({u}, '^([^?]*)', 1)"
    query = f"regexp_extract({u}, '^[^?]*\\?(.*)$', 1)"
    scheme = f"lower(regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (f"regexp_replace(lower(regexp_extract({base},"
                f" '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1)),"
                f" '^www\\.', '')")
    host = (f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '')"
            f" WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '')"
            f" ELSE {hostport} END")
    path = (f"regexp_extract({base},"
            f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$', 1)")
    path_c = (f"CASE WHEN {path} IN ('', '/') THEN '/'"
              f" ELSE regexp_replace({path}, '/$', '') END")
    drop = " OR ".join(_TRACKING_PARAM_PREDS)
    params = (f"list_filter(string_split({query}, '&'),"
              f" x -> x != '' AND NOT ({drop}))")
    # DuckDB's array_to_string([]) is NULL (Spark's array_join is '')
    qsorted = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    return (f"CASE WHEN {scheme} = '' OR {host} = '' THEN NULL"
            f" ELSE concat({scheme}, '://', {host}, {path_c},"
            f" CASE WHEN {qsorted} = '' THEN '' ELSE concat('?', {qsorted}) END)"
            f" END")


def url_dedup_stats(df: DataFrame, url_col: str = "url",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-canonical-URL dedup ledger: (canon_url, n_variants
    distinct raw spellings, n_docs, keep_doc = smallest id — the
    deterministic survivor a fetch queue keeps).  Malformed URLs
    (NULL canon) are excluded; route them via ``canon IS NULL``
    upstream.  One hash groupBy on the canon key."""
    canon = F.expr(canonicalize_url_expr(url_col))
    return (
        df.select(F.col(id_col), F.col(url_col), canon.alias("canon_url"))
        .filter(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(F.count_distinct(F.col(url_col)).cast("bigint").alias("n_variants"),
             F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.min(F.col(id_col)).cast("bigint").alias("keep_doc"))
    )


def url_dedup_stats_sql(table: str, url_col: str = "url",
                        id_col: str = "doc_id") -> str:
    canon = canonicalize_url_sql_expr(url_col)
    return f"""
SELECT canon_url,
       CAST(COUNT(DISTINCT {url_col}) AS BIGINT) AS n_variants,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN({id_col}) AS BIGINT) AS keep_doc
FROM (SELECT {id_col}, {url_col}, {canon} AS canon_url FROM {table})
WHERE canon_url IS NOT NULL
GROUP BY canon_url
"""


def bigram_frequency_model(ref: DataFrame, text_col: str = "text",
                           min_count: int = 1) -> DataFrame:
    """Bigram model relation (bg, cnt) with bg = 'w1 w2' — the
    conditional-context companion of :func:`token_frequency_model`
    (same summarize-once lifecycle: one explode + partial-aggregated
    groupBy, persist and score any number of batches)."""
    return (ref.select(tokens_expr(text_col).alias("toks"))
            .select(F.explode(F.expr(_BIGRAMS)).alias("bg"))
            .groupBy("bg").agg(F.count("*").cast("bigint").alias("cnt"))
            .where(F.col("cnt") >= min_count))


def bigram_frequency_model_sql(table: str, text_col: str = "text",
                               min_count: int = 1) -> str:
    return f"""
SELECT g AS bg, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest([toks[i] || ' ' || toks[i + 1]
                     for i in range(1, len(toks))]) AS g
      FROM (SELECT {tokens_sql(text_col)} AS toks FROM {table})
      WHERE len(toks) >= 2)
GROUP BY g HAVING COUNT(*) >= {min_count}
"""


def bigram_fluency(docs: DataFrame, bg_model: DataFrame,
                   uni_model: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   broadcast_model: bool = True) -> DataFrame:
    """Conditional-bigram fluency: per doc, the mean add-1-smoothed
    conditional probability P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
    of its bigrams under a reference model — the context-aware
    upgrade of :func:`corpus_frequency_score` (which a shuffled-word
    salad passes: same unigrams, destroyed bigrams; this catches it).
    LOG-FREE by design: the per-bigram probability is a ratio of
    non-negative integers, fixed-pointed with DIV, so the score is
    bit-identical cross-engine (the repo-wide no-ln discipline — the
    arithmetic mean of conditional probabilities ranks fluency like
    the geometric/perplexity form ranks it for filtering purposes,
    without a transcendental whose last ulp differs between libms).

    Returns (id, n_bigrams, mean_bigram_p_x1e6 BIGINT); docs with
    < 2 tokens have no bigrams and are absent, matching
    corpus_frequency_score's empty-doc convention.

    SCALE shape: doc bigrams left-join the bigram model and the
    unigram model (broadcast by default; pass broadcast_model=False
    for 10^8+-row vocabularies — shuffle joins on the bg/w1 keys),
    the vocabulary size V rides a PERSISTED 1-row broadcast (the
    fp_cap lesson: an unpersisted knob aggregate re-runs per leg),
    and everything folds into ONE per-doc partial aggregation."""
    from pyspark import StorageLevel

    bgs = (docs.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
           .select(F.col(id_col), F.explode(F.expr(_BIGRAMS)).alias("bg"))
           .withColumn("w1", F.expr("split(bg, ' ')[0]")))
    # the unigram model feeds TWO legs (vocab-size agg + w1 join) —
    # persist unless the caller already did (the fp_cap lesson:
    # an unpersisted shared leg re-runs its subtree per use)
    if uni_model.storageLevel == StorageLevel.NONE:
        uni_model = uni_model.persist()
    vocab = uni_model.agg(F.count("*").cast("bigint").alias("v")).persist()
    mb = bg_model
    m1 = uni_model.select(F.col("tok").alias("w1"),
                          F.col("cnt").alias("c1"))
    if broadcast_model:
        mb, m1 = F.broadcast(mb), F.broadcast(m1)
    p = ("((COALESCE(cnt, 0) + 1) * 1000000)"
         " DIV (COALESCE(c1, 0) + v)")
    return (bgs.join(mb, "bg", "left").join(m1, "w1", "left")
            .crossJoin(F.broadcast(vocab))
            .groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                 F.expr(f"SUM({p}) DIV COUNT(*)")
                 .cast("bigint").alias("mean_bigram_p_x1e6")))


def bigram_fluency_sql(docs_table: str, bg_model_sql: str,
                       uni_model_sql: str, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    p = "((COALESCE(cnt, 0) + 1) * 1000000) // (COALESCE(c1, 0) + v)"
    return f"""
WITH mb AS ({bg_model_sql}),
m1 AS (SELECT tok AS w1, cnt AS c1 FROM ({uni_model_sql})),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM ({uni_model_sql})),
bgs AS (
  SELECT {id_col},
         unnest([toks[i] || ' ' || toks[i + 1]
                 for i in range(1, len(toks))]) AS bg
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {docs_table})
  WHERE len(toks) >= 2
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM({p}) // COUNT(*) AS BIGINT) AS mean_bigram_p_x1e6
FROM bgs
LEFT JOIN mb USING (bg)
LEFT JOIN m1 ON string_split(bg, ' ')[1] = m1.w1
CROSS JOIN vocab
GROUP BY {id_col}
"""
