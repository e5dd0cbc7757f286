"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup — the dedup family a training-
data pipeline runs at corpus scale.

Scale design:

- exact dedup       — one hash-groupBy; shuffle key is the 32-byte md5.
- MinHash + LSH     — shingle -> k minhashes (map-side array math) ->
  band keys -> self-join per band bucket.  The join is on band-key
  equality, so candidate generation is O(bucket²) per bucket instead
  of O(n²) global — the standard banding argument.
- SimHash           — explode (doc, token, bit) -> two shuffles with
  partial aggregation; signature fits in two 32-bit halves so the
  pair-compare stays cheap.
- n-gram Jaccard    — exact verification on candidate pairs only.
- embedding near-dup — fixed-point cosine (see similarity.py) over
  LSH-bucketed candidates.

All hash math is md5-based and integer-exact, so every operator here
has a bit-identical DuckDB twin for the differential gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbms_spark.llm.text import tokens_expr, tokens_sql

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Duplicate groups by content hash: one row per group with >1 member
    — (content_md5, canonical_id = min id, group_size)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


def exact_dedup_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT md5({text_col}) AS content_md5, min({id_col}) AS canonical_id,
       COUNT(*) AS group_size
FROM {table} GROUP BY md5({text_col}) HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH banding
# ---------------------------------------------------------------------------

def shingles_expr(n: int = 3) -> F.Column:
    """Word n-gram shingles from a ``toks`` array column (distinct)."""
    joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size(toks) < {n} THEN array(concat_ws(' ', toks)) "
        f"ELSE array_distinct(transform(sequence(0, size(toks) - {n}), i -> {joined})) END"
    )


def shingles_sql(n: int = 3) -> str:
    # range() end is EXCLUSIVE (Spark's sequence() is inclusive):
    # 1-based start positions run 1 .. len-n+1, so end bound is len-n+2
    joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(toks) < {n} THEN [concat_ws(' ', toks)] "
        f"ELSE list_distinct([{joined} for i in range(1, len(toks) - {n - 2})]) END"
    )


#: affine minhash family over ONE base hash per shingle:
#: h_k(s) = (A[k] * base(s) + B[k]) mod P — the standard trick that
#: replaces k md5 calls per shingle with one md5 + k multiply-adds.
#: P = smallest prime > 2^32; every A odd and < 2^31 so that
#: A * base < 2^31 * 2^32 = 2^63 never overflows a signed 64-bit
#: (Spark runs ANSI mode: overflow throws, it doesn't wrap).
_MINHASH_P = 4_294_967_311
_MINHASH_A = [506952113, 99338871, 1119006269, 668265263,
              374761393, 18652613, 597399067, 722376585]
_MINHASH_B = [1013904223, 1664525, 1103515245, 12345,
              1181783497, 1538597951, 69069, 362437]

_BASE_SPARK = "transform(sh, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))"
_BASE_DUCK = "list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)"


def _minhash_expr_spark(k: int) -> str:
    a, b = _MINHASH_A[k % 8], _MINHASH_B[k % 8]
    return f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {_MINHASH_P}L))"


def _minhash_expr_duck(k: int) -> str:
    a, b = _MINHASH_A[k % 8], _MINHASH_B[k % 8]
    return f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_MINHASH_P}))"


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 8, keep_shingles: bool = False) -> DataFrame:
    """Per-doc minhash signature h0..h{k-1} over word-3-gram shingles.
    Pure map-side array math — one md5 per shingle, k affine mins —
    no shuffle beyond the parallelism guard.  ``keep_shingles`` also
    emits the raw shingle array (``sh``) so a downstream verifier can
    reuse it without re-shingling the corpus."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    df = ensure_parallelism(df)
    with_sh = (
        df.withColumn("toks", tokens_expr(text_col))
        .withColumn("sh", shingles_expr())
        .withColumn("hs", F.expr(_BASE_SPARK))
    )
    return with_sh.select(
        F.col(id_col),
        *(["sh"] if keep_shingles else []),
        *[F.expr(_minhash_expr_spark(k)).alias(f"h{k}") for k in range(num_hashes)],
    )


def minhash_signatures_sql(table: str, id_col: str = "doc_id", text_col: str = "text",
                           num_hashes: int = 8) -> str:
    hs = ", ".join(f"{_minhash_expr_duck(k)} AS h{k}" for k in range(num_hashes))
    return f"""
SELECT {id_col}, {hs}
FROM (SELECT {id_col}, {_BASE_DUCK} AS hs
      FROM (SELECT {id_col}, {shingles_sql()} AS sh
            FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})))
"""


def band_keys(num_hashes: int = 8, bands: int = 2) -> list[tuple[int, str]]:
    """(band_idx, concat expression of its hash slots) — shared shape
    for both dialects (md5 of comma-joined minhash values)."""
    per = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [f"h{i}" for i in range(b * per, (b + 1) * per)]
        out.append((b, " || ',' || ".join(f"CAST({c} AS {{T}})" for c in cols)))
    return out


def _banded(sigs: DataFrame, id_col: str, num_hashes: int, bands: int,
            carry: list[str], materialize: bool = False) -> DataFrame:
    """(id, carry..., band, bkey) — one row per band via posexplode of
    the band-key array.  The single definition of the band bucket key
    (md5 of the band's comma-joined minhash slots) every pair miner
    shares; the SQL twins derive the identical key via
    :func:`band_keys`.

    posexplode, NOT a union of per-band selects: union legs are
    independent subtrees, so each leg would re-derive the ENTIRE
    signature pipeline (tokenize + shingle + md5-per-shingle + k
    minhash folds) — bands× the map work, and with the self-joins
    above this the printed q24 plan scanned the corpus 8 times.  One
    Generate computes the signatures once and emits ``bands`` rows.

    ``materialize``: localCheckpoint the signature relation before the
    explode — for miners whose consumers sit in independent subtrees
    of one query (self-join legs, the capped form's window + star
    legs) Catalyst re-derives the explode's child per consumer, and a
    broadcast side can never reuse a shuffle exchange; pinning the
    (id, h0..h{{k-1}}, carry) rows makes the corpus pass run exactly
    once (the simhash_hamming_pairs lesson).  Leave False when every
    consumer reads the banded relation once (the *_between miners).

    The pin is EAGER (localCheckpoint default) and deliberate:
    (a) lazy checkpoints race when two join legs of the same action
    compute the child concurrently — both legs materialize it and the
    corpus pass runs twice anyway (measured on the q207/q209 shared
    window relation, round 10); (b) the pinned rows — id, minhashes,
    AND any ``carry`` payload such as full shingle arrays — live in
    executor-local non-replicated storage until the caller's query
    finishes, so carry memory is O(corpus x payload) and executor
    loss makes the block unrecoverable (Spark recomputes nothing past
    a localCheckpoint: the job fails and retries whole).  Callers
    passing heavy carry columns own that tradeoff; it is the price of
    not re-deriving tokenize+minhash per consumer."""
    per = num_hashes // bands
    if materialize:
        sigs = sigs.localCheckpoint()
    keys = []
    for b in range(bands):
        cols = [f"h{i}" for i in range(b * per, (b + 1) * per)]
        keys.append(F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in cols])))
    return sigs.select(F.col(id_col), *carry,
                       F.posexplode(F.array(*keys)).alias("band", "bkey"))


def _banded_sql_legs(id_col: str, num_hashes: int, bands: int) -> str:
    """The DuckDB twin of :func:`_banded` over a CTE named ``sigs``."""
    legs = []
    for b, expr in band_keys(num_hashes, bands):
        key = "md5(" + expr.format(T="VARCHAR") + ")"
        legs.append(f"SELECT {id_col}, {b} AS band, {key} AS bkey FROM sigs")
    return " UNION ALL ".join(legs)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = 8, bands: int = 2,
                        carry: list[str] | None = None) -> DataFrame:
    """Distinct candidate pairs (a_id < b_id) sharing at least one LSH
    band.  The self-join shuffles on the band key — bucket-local.

    ``carry`` names payload columns of ``sigs`` to ride along into the
    output as ``<col>_a`` / ``<col>_b`` (e.g. the shingle array for a
    downstream Jaccard verifier): the payload is shuffled with the
    banded rows instead of re-joined, and the signature relation
    (id, minhashes, carry) is pinned once (``materialize=True``) so
    neither join leg re-derives the corpus pass — a broadcast-planned
    leg otherwise recomputes it wholesale.  Pair dedup is a groupBy
    taking the first payload (identical across bands by
    construction)."""
    carry = carry or []
    banded = _banded(sigs, id_col, num_hashes, bands, carry, materialize=True)
    a = banded.alias("a")
    b_ = banded.alias("b")
    joined = (
        a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
        )
    )
    if not carry:
        return joined.distinct()
    return joined.groupBy("a_id", "b_id").agg(
        *[F.first(f"{c}_{s}").alias(f"{c}_{s}") for c in carry for s in ("a", "b")]
    )


def lsh_candidate_pairs_between(new_sigs: DataFrame, old_sigs: DataFrame,
                                id_col: str = "doc_id",
                                num_hashes: int = 8, bands: int = 2) -> DataFrame:
    """Incremental dedup: candidate pairs between a NEW batch and the
    EXISTING corpus — (new_id, old_id) sharing at least one LSH band.

    The production shape for a growing corpus: existing signatures are
    mined once and persisted; each intake batch hashes only itself and
    equi-joins the (new << old) banded legs, so the per-batch cost is
    O(batch) map work + a bucket-local join — never a re-mine or a
    corpus self-join.  The within-batch pairs remain
    :func:`lsh_candidate_pairs` on the new signatures alone."""
    n = _banded(new_sigs, id_col, num_hashes, bands, carry=[]) \
        .withColumnRenamed(id_col, "new_id")
    o = _banded(old_sigs, id_col, num_hashes, bands, carry=[]) \
        .withColumnRenamed(id_col, "old_id")
    return (
        n.join(o, ["band", "bkey"])
        .select("new_id", "old_id")
        .distinct()
    )


def lsh_candidate_pairs_between_sql(new_sql: str, old_sql: str,
                                    id_col: str = "doc_id", text_col: str = "text",
                                    num_hashes: int = 8, bands: int = 2) -> str:
    per = num_hashes // bands

    def banded(src: str) -> str:
        legs = []
        for b in range(bands):
            cols = [f"h{i}" for i in range(b * per, (b + 1) * per)]
            key = "md5(" + " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols) + ")"
            legs.append(f"SELECT {id_col}, {b} AS band, {key} AS bkey FROM {src}")
        return " UNION ALL ".join(legs)

    return f"""
WITH nsig AS ({minhash_signatures_sql(f"({new_sql})", id_col, text_col, num_hashes)}),
osig AS ({minhash_signatures_sql(f"({old_sql})", id_col, text_col, num_hashes)}),
nb AS ({banded("nsig")}),
ob AS ({banded("osig")})
SELECT DISTINCT nb.{id_col} AS new_id, ob.{id_col} AS old_id
FROM nb JOIN ob ON nb.band = ob.band AND nb.bkey = ob.bkey
"""


def lsh_candidate_pairs_sql(table: str, id_col: str = "doc_id", text_col: str = "text",
                            num_hashes: int = 8, bands: int = 2) -> str:
    banded = _banded_sql_legs(id_col, num_hashes, bands)
    return f"""
WITH sigs AS ({minhash_signatures_sql(table, id_col, text_col, num_hashes)}),
banded AS ({banded})
SELECT DISTINCT a.{id_col} AS a_id, b.{id_col} AS b_id
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bkey = b.bkey AND a.{id_col} < b.{id_col}
"""


def lsh_candidate_pairs_capped(sigs: DataFrame, id_col: str = "doc_id",
                               num_hashes: int = 8, bands: int = 2,
                               bucket_cap: int = 64) -> DataFrame:
    """Bucket-degeneracy-proof candidate pairs: buckets up to
    ``bucket_cap`` members expand exactly (all a<b pairs, as
    :func:`lsh_candidate_pairs`); LARGER buckets emit only the STAR to
    the bucket's minimum id (min_id, id_i) — O(bucket) pairs instead
    of O(bucket²).

    Why this is the right scale trade: the hazard bucket at 100 TB is
    a mega-cluster of near-identical docs (boilerplate pages, mirrored
    corpora) — a hot bucket with c members otherwise proposes
    c(c-1)/2 pairs; at c = 1M that is 5e11 pairs from ONE bucket.
    For downstream verify->connected-components grouping a spanning
    STAR keeps the whole cluster connected with GRAPH DIAMETER 1
    (every member verifies directly against the hub), so the dedup
    groups come out identical in one propagation round — a chain would
    be equally linear in pairs but needs diameter-many rounds, which a
    bounded label propagation won't finish.  The loss case is a giant
    bucket polluted with false positives: a member similar to some
    bucket-mate but NOT to the hub loses its link after verification;
    small (≤ cap) buckets keep exact semantics, which is why this is a
    cap, not a blanket star.  (The reference's histogram chunking,
    data_compare_divider.go:41, is the same instinct: bound the unit
    of work under a skewed key distribution.)

    One extra shuffle vs the uncapped form (the per-bucket window for
    size + min), also keyed on (band, bkey); the hot bucket's window
    task is O(bucket) — a straggler, not a death.
    """
    banded = _banded(sigs, id_col, num_hashes, bands, carry=[], materialize=True)
    w = Window.partitionBy("band", "bkey")
    sized = banded.withColumn("__n", F.count(F.lit(1)).over(w)) \
                  .withColumn("__hub", F.min(id_col).over(w))
    small = sized.filter(F.col("__n") <= bucket_cap)
    a, b_ = small.alias("a"), small.alias("b")
    exact = (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
    )
    star = (
        sized.filter((F.col("__n") > bucket_cap) & (F.col(id_col) != F.col("__hub")))
        .select(F.col("__hub").alias("a_id"), F.col(id_col).alias("b_id"))
    )
    return exact.unionByName(star).distinct()


def lsh_candidate_pairs_capped_sql(table: str, id_col: str = "doc_id",
                                   text_col: str = "text",
                                   num_hashes: int = 8, bands: int = 2,
                                   bucket_cap: int = 64) -> str:
    """DuckDB twin of :func:`lsh_candidate_pairs_capped`."""
    banded = _banded_sql_legs(id_col, num_hashes, bands)
    return f"""
WITH sigs AS ({minhash_signatures_sql(table, id_col, text_col, num_hashes)}),
banded AS ({banded}),
sized AS (
  SELECT {id_col}, band, bkey,
         COUNT(*) OVER (PARTITION BY band, bkey) AS n,
         MIN({id_col}) OVER (PARTITION BY band, bkey) AS hub
  FROM banded
)
SELECT DISTINCT a_id, b_id FROM (
  SELECT a.{id_col} AS a_id, b.{id_col} AS b_id
  FROM sized a JOIN sized b
    ON a.band = b.band AND a.bkey = b.bkey AND a.{id_col} < b.{id_col}
  WHERE a.n <= {bucket_cap}
  UNION ALL
  SELECT hub AS a_id, {id_col} AS b_id
  FROM sized WHERE n > {bucket_cap} AND {id_col} <> hub
)
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

#: fold one 32-bit half's bit votes over the token-hash array, entirely
#: inside the row: accumulator is a 32-wide bigint vote array.
_VOTE_FOLD = (
    "aggregate({h}, array_repeat(0L, 32), (acc, h) -> "
    "zip_with(acc, sequence(0, 31), (a, b) -> "
    "a + CASE WHEN (h >> b) & 1 = 1 THEN 1L ELSE -1L END))"
)

#: collapse a vote array into the signature half: bit b set iff votes[b] > 0.
_VOTE_SIG = (
    "aggregate(zip_with({v}, sequence(0, 31), (v, b) -> "
    "CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END), 0L, (a, x) -> a + x)"
)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash as two 32-bit halves (hi, lo) — bit votes over
    md5-derived token hashes, folded ENTIRELY map-side with array
    aggregates: zero shuffles, one row in → one row out (each input
    row is one document).

    Summing ±1 per token *occurrence* is arithmetically identical to
    the classic count-weighted vote over *distinct* tokens
    (Σ_occurrences ±1 = Σ_distinct cnt·±1), which is what the DuckDB
    oracle (:func:`simhash_sql`) computes via its GROUP BY — values
    match bit-for-bit while the Spark plan never explodes rows.
    Documents with no tokens are dropped, matching the oracle's
    ``unnest`` behavior."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    df = ensure_parallelism(df)
    votes = (
        df.withColumn("toks", tokens_expr(text_col))
        .filter(F.expr("size(toks) > 0"))
        .withColumn("hm", F.expr("transform(toks, t -> md5(t))"))
        .withColumn("hh", F.expr(
            "transform(hm, m -> cast(conv(substring(m, 1, 8), 16, 10) as bigint))"))
        .withColumn("hl", F.expr(
            "transform(hm, m -> cast(conv(substring(m, 9, 8), 16, 10) as bigint))"))
        .withColumn("v_hi", F.expr(_VOTE_FOLD.format(h="hh")))
        .withColumn("v_lo", F.expr(_VOTE_FOLD.format(h="hl")))
    )
    return votes.select(
        F.col(id_col),
        F.expr(_VOTE_SIG.format(v="v_hi")).alias("simhash_hi"),
        F.expr(_VOTE_SIG.format(v="v_lo")).alias("simhash_lo"),
    )


def simhash_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, tok, COUNT(*) AS cnt,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_hi,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_lo
  FROM (SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {table})
  GROUP BY 1, 2
),
bits AS (SELECT {id_col}, cnt, h_hi, h_lo, unnest(range(32)) AS b FROM toks),
votes AS (
  SELECT {id_col}, b,
         SUM(CASE WHEN (h_hi >> CAST(b AS INTEGER)) & 1 = 1 THEN cnt ELSE -cnt END) AS v_hi,
         SUM(CASE WHEN (h_lo >> CAST(b AS INTEGER)) & 1 = 1 THEN cnt ELSE -cnt END) AS v_lo
  FROM bits GROUP BY 1, 2
)
SELECT {id_col},
       CAST(SUM(CASE WHEN v_hi > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash_hi,
       CAST(SUM(CASE WHEN v_lo > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash_lo
FROM votes GROUP BY {id_col}
"""


def simhash_hamming_pairs(sigs: DataFrame, max_hamming: int = 3,
                          id_col: str = "doc_id",
                          band_cap: int | None = None) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — the
    Manku/Jain/Sarma 2007 web-dedup shape: split the 64-bit signature
    into 4 16-bit bands; by pigeonhole, two signatures within Hamming
    distance ``max_hamming`` <= 3 MUST agree exactly on at least one
    band, so candidates come from four band-value equi-joins (one
    shuffle on the band key, never all-pairs), then the exact distance
    ``bit_count(xor)`` verifies.  Output (a_id, b_id, hamming) with
    a_id < b_id.

    This is a different LSH family from the banded-minhash pipeline:
    minhash banding targets set-Jaccard over shingles, SimHash Hamming
    targets weighted-token cosine — the two catch different near-dup
    geometries and real pipelines run both.

    Scale shape: shuffle key is (band_idx, band_val) — 2^16 values per
    band spread uniformly by construction (md5-derived bit votes).  A
    band value shared by B docs emits B^2 candidate rows; boilerplate
    corpora concentrate mass in few signatures, so ``band_cap`` drops
    buckets wider than the cap before the join (same occupancy-control
    recipe as lsh_candidate_pairs_capped; dropped buckets mean those
    docs are ALREADY exact-band duplicates of many others — route them
    through exact dedup instead).  ``max_hamming`` must be <= 3: four
    bands only pigeonhole three bit flips.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError("4-band pigeonhole supports max_hamming in [0, 3]")
    # materialize the 3-column signature relation ONCE: it feeds the
    # band explode and BOTH join legs, and after Catalyst collapses the
    # projections the signature expressions would otherwise re-evaluate
    # through the join — for expression-heavy signatures (dHash's
    # 72-sample transform) that measured 367 s vs 3.9 s at sf0.1.  The
    # relation is id + two bigints, trivially materializable at any
    # corpus size, and the corpus scan behind it runs once, not twice.
    sigs = sigs.select(F.col(id_col), "simhash_hi", "simhash_lo").localCheckpoint()
    bands = F.array(*[
        F.expr(e) for e in (
            "shiftright(simhash_hi, 16) & 65535", "simhash_hi & 65535",
            "shiftright(simhash_lo, 16) & 65535", "simhash_lo & 65535")])
    ex = (sigs.select(F.col(id_col).alias("id"), "simhash_hi", "simhash_lo",
                      F.posexplode(bands).alias("band_idx", "band_val")))
    if band_cap is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band_idx", "band_val")
        ex = (ex.withColumn("bsz", F.count(F.lit(1)).over(w))
              .where(F.col("bsz") <= band_cap).drop("bsz"))
    a = ex.select(F.col("id").alias("a_id"), F.col("simhash_hi").alias("hi_a"),
                  F.col("simhash_lo").alias("lo_a"), "band_idx", "band_val")
    b = ex.select(F.col("id").alias("b_id"), F.col("simhash_hi").alias("hi_b"),
                  F.col("simhash_lo").alias("lo_b"), "band_idx", "band_val")
    ham = F.expr(
        "cast(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) as bigint)")
    return (a.join(b, ["band_idx", "band_val"])
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())


def hamming_pairs_over_sql(sigs_sql: str, max_hamming: int = 3,
                           id_col: str = "doc_id") -> str:
    """DuckDB twin of ``simhash_hamming_pairs`` over ANY
    (id, simhash_hi, simhash_lo) relation — text SimHash and image
    dHash share the banding/verify implementation.  DuckDB's ``^`` is
    exponentiation — bitwise XOR is ``xor()``."""
    return f"""
WITH sigs AS ({sigs_sql}),
ex AS (
  SELECT {id_col} AS id, simhash_hi, simhash_lo, b.band_idx,
         CASE b.band_idx
           WHEN 0 THEN (simhash_hi >> 16) & 65535
           WHEN 1 THEN simhash_hi & 65535
           WHEN 2 THEN (simhash_lo >> 16) & 65535
           ELSE simhash_lo & 65535 END AS band_val
  FROM sigs, (SELECT unnest(range(4)) AS band_idx) b
)
SELECT DISTINCT a.id AS a_id, b.id AS b_id,
       CAST(bit_count(xor(a.simhash_hi, b.simhash_hi))
            + bit_count(xor(a.simhash_lo, b.simhash_lo)) AS BIGINT) AS hamming
FROM ex a JOIN ex b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id
WHERE bit_count(xor(a.simhash_hi, b.simhash_hi))
      + bit_count(xor(a.simhash_lo, b.simhash_lo)) <= {max_hamming}
"""


def simhash_hamming_pairs_sql(table: str, max_hamming: int = 3,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB twin of ``simhash_hamming_pairs(simhash(df))`` (uncapped)."""
    return hamming_pairs_over_sql(simhash_sql(table, id_col, text_col),
                                  max_hamming, id_col)


def _hamming_bands(sigs: DataFrame, id_col: str, out_id: str) -> DataFrame:
    """4x16-bit pigeonhole band explode of an (id, simhash_hi,
    simhash_lo) relation — the shared propose leg of the full-corpus
    and between-batch Hamming miners."""
    bands = F.array(*[
        F.expr(e) for e in (
            "shiftright(simhash_hi, 16) & 65535", "simhash_hi & 65535",
            "shiftright(simhash_lo, 16) & 65535", "simhash_lo & 65535")])
    return sigs.select(
        F.col(id_col).alias(out_id),
        F.col("simhash_hi").alias(f"hi_{out_id}"),
        F.col("simhash_lo").alias(f"lo_{out_id}"),
        F.posexplode(bands).alias("band_idx", "band_val"))


def hamming_pairs_between(new_sigs: DataFrame, corpus_sigs: DataFrame,
                          max_hamming: int = 3, id_col: str = "doc_id",
                          band_cap: int | None = None) -> DataFrame:
    """Incremental SimHash-Hamming intake: near-dup pairs BETWEEN a
    new batch's signatures and the persisted corpus signature relation
    — (new_id, corpus_id, hamming), the O(batch) nightly form of
    :func:`simhash_hamming_pairs` (which a daily pipeline would
    otherwise have to re-run over the whole corpus to use at all).

    Same pigeonhole guarantee: within ``max_hamming`` <= 3 of a 64-bit
    signature, at least one 16-bit band matches exactly, so the
    cross-pairs come from a band equi-join of batch bands against
    corpus bands — shuffle volume is the batch's band rows plus the
    matching corpus buckets, never the corpus self-join.  Corpus
    signatures are 3 integer columns per doc, mined once and persisted
    (the lsh_candidate_pairs_between / winnowed_duplicates_between
    ledger pattern); within-batch pairs remain
    :func:`simhash_hamming_pairs` on the new signatures alone, and
    the union of the two calls equals the full-corpus run on
    new ∪ corpus restricted to those sides (pinned in test_llm).

    ``band_cap`` drops CORPUS band buckets wider than the cap (the
    boilerplate mega-buckets; the batch side is assumed small).  Ids
    must be disjoint across sides — the same ledger contract as every
    other *_between miner here."""
    if not 0 <= max_hamming <= 3:
        raise ValueError("4-band pigeonhole supports max_hamming in [0, 3]")
    # 3-column relations; checkpoint so expression-heavy signature
    # sources (dHash) evaluate once, not per joined row (the q247
    # lesson) — the batch side is small, the corpus side is usually a
    # persisted parquet read already, but checkpointing is cheap
    # insurance for both
    n = _hamming_bands(
        new_sigs.select(F.col(id_col), "simhash_hi", "simhash_lo")
        .localCheckpoint(), id_col, "new_id")
    c = _hamming_bands(
        corpus_sigs.select(F.col(id_col), "simhash_hi", "simhash_lo")
        .localCheckpoint(), id_col, "corpus_id")
    if band_cap is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band_idx", "band_val")
        c = (c.withColumn("bsz", F.count(F.lit(1)).over(w))
             .where(F.col("bsz") <= band_cap).drop("bsz"))
    ham = F.expr("cast(bit_count(hi_new_id ^ hi_corpus_id)"
                 " + bit_count(lo_new_id ^ lo_corpus_id) as bigint)")
    return (n.join(c, ["band_idx", "band_val"])
            .select("new_id", "corpus_id", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())


def hamming_pairs_between_over_sql(new_sigs_sql: str, corpus_sigs_sql: str,
                                   max_hamming: int = 3,
                                   id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`hamming_pairs_between` over ANY pair of
    (id, simhash_hi, simhash_lo) relations."""
    band = """
  SELECT {id} AS id, simhash_hi, simhash_lo, b.band_idx,
         CASE b.band_idx
           WHEN 0 THEN (simhash_hi >> 16) & 65535
           WHEN 1 THEN simhash_hi & 65535
           WHEN 2 THEN (simhash_lo >> 16) & 65535
           ELSE simhash_lo & 65535 END AS band_val
  FROM {src}, (SELECT unnest(range(4)) AS band_idx) b
"""
    return f"""
WITH nsig AS ({new_sigs_sql}),
csig AS ({corpus_sigs_sql}),
nb AS ({band.format(id=id_col, src="nsig")}),
cb AS ({band.format(id=id_col, src="csig")})
SELECT DISTINCT nb.id AS new_id, cb.id AS corpus_id,
       CAST(bit_count(xor(nb.simhash_hi, cb.simhash_hi))
            + bit_count(xor(nb.simhash_lo, cb.simhash_lo)) AS BIGINT) AS hamming
FROM nb JOIN cb
  ON nb.band_idx = cb.band_idx AND nb.band_val = cb.band_val
WHERE bit_count(xor(nb.simhash_hi, cb.simhash_hi))
      + bit_count(xor(nb.simhash_lo, cb.simhash_lo)) <= {max_hamming}
"""


def hamming_pairs_between_sql(new_sql: str, corpus_sql: str,
                              max_hamming: int = 3, id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB twin of ``hamming_pairs_between(simhash(new),
    simhash(corpus))``."""
    return hamming_pairs_between_over_sql(
        simhash_sql(f"({new_sql})", id_col, text_col),
        simhash_sql(f"({corpus_sql})", id_col, text_col),
        max_hamming, id_col)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

#: floor-quantized 6-dp Jaccard between two shingle arrays — ratio of
#: identical ints, so both engines produce the identical double.
_JACCARD = ("floor(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) "
            "/ size(array_union(sh_a, sh_b)) * 1000000) / 1000000")


def jaccard_on_pairs(df: DataFrame, cands: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", min_sim: float = 0.0) -> DataFrame:
    """The canonical dedup pipeline: LSH banding proposes, exact
    n-gram Jaccard disposes (the reference always verifies candidates
    before acting — data_compare semantics applied to dedup).

    ``cands`` is an (a_id, b_id) pair table, e.g. from
    :func:`lsh_candidate_pairs`.  If it already carries the shingle
    payload (``sh_a``/``sh_b`` via ``carry=["sh"]``) the verification
    is a pure map-side expression over the pair table — no join, no
    re-shingling.  Otherwise the shingle signature table is declared
    once and joined to both pair sides by id.  Output: (a_id, b_id,
    jaccard), jaccard floor-quantized at 6 dp."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    if "sh_a" in cands.columns and "sh_b" in cands.columns:
        return (
            cands.select("a_id", "b_id", F.expr(_JACCARD).alias("jaccard"))
            .filter(F.col("jaccard") >= min_sim)
        )
    sh = (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .select(F.col(id_col), shingles_expr().alias("sh"))
    )
    a = sh.select(F.col(id_col).alias("a_id"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b_id"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "a_id").join(b, "b_id")
        .select("a_id", "b_id", F.expr(_JACCARD).alias("jaccard"))
        .filter(F.col("jaccard") >= min_sim)
    )


def jaccard_on_lsh_sql(table: str, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 8, bands: int = 2, min_sim: float = 0.0) -> str:
    """DuckDB twin of ``jaccard_on_pairs(df, lsh_candidate_pairs(...))``."""
    duck_j = (f"floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) "
              f"/ len(list_distinct(list_concat(a.sh, b.sh))) * 1000000) / 1000000")
    return f"""
WITH cands AS ({lsh_candidate_pairs_sql(table, id_col, text_col, num_hashes, bands)}),
sh AS (
  SELECT {id_col}, {shingles_sql()} AS sh
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})
)
SELECT c.a_id, c.b_id, {duck_j} AS jaccard
FROM cands c
JOIN sh a ON a.{id_col} = c.a_id
JOIN sh b ON b.{id_col} = c.b_id
WHERE {duck_j} >= {min_sim}
"""

def jaccard_fixed_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        min_sim: float = 0.0) -> DataFrame:
    """Exact 3-gram Jaccard over a deterministic pair set (i, i + n/2):
    the verification stage that would run on LSH candidates at scale,
    here on a fixed blocking so the oracle can mirror it.  Similarity
    is floor-quantized at 6 dp (ratio of identical ints — exact).

    Scale shape: no driver job and shingles computed ONCE — ``n/2`` is
    a broadcast 1-row aggregate, each doc emits its pair role(s)
    (``a`` keyed by own id, ``b`` keyed by ``id - half``), and one
    groupBy on the pair key reunites the two shingle arrays.  That is
    a single n-row shuffle instead of a self-join that re-reads and
    re-shingles the corpus on both legs."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    lim = df.agg(
        F.floor(F.count(F.lit(1)) / 2).cast("long").alias("half"),
        F.min(id_col).alias("mn"),
        F.max(id_col).alias("mx"),
    )
    df = ensure_parallelism(df)
    sh = df.withColumn("toks", tokens_expr(text_col)).select(
        F.col(id_col), shingles_expr().alias("sh")
    )
    tagged = (
        sh.crossJoin(F.broadcast(lim))
        .select(
            "sh", "half",
            F.explode(F.expr(
                f"filter(array(named_struct('pk', {id_col}, 'side', 'a'), "
                f"named_struct('pk', {id_col} - half, 'side', 'b')), "
                "r -> r.pk >= mn AND r.pk + half <= mx)"
            )).alias("r"),
        )
        .select(F.col("r.pk").alias("pk"), F.col("r.side").alias("side"), "sh", "half")
    )
    pairs = (
        tagged.groupBy("pk")
        .agg(
            F.first(F.when(F.col("side") == "a", F.col("sh")), ignorenulls=True).alias("sh_a"),
            F.first(F.when(F.col("side") == "b", F.col("sh")), ignorenulls=True).alias("sh_b"),
            F.first("half").alias("half"),
        )
        .filter("sh_a IS NOT NULL AND sh_b IS NOT NULL")
    )
    inter = "size(array_intersect(sh_a, sh_b))"
    union = "size(array_union(sh_a, sh_b))"
    return (
        pairs.select(
            F.col("pk").alias("a_id"),
            (F.col("pk") + F.col("half")).alias("b_id"),
            F.expr(f"floor(CAST({inter} AS DOUBLE) / {union} * 1000000) / 1000000").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_sim)
    )


def jaccard_fixed_pairs_sql(table: str, id_col: str = "doc_id", text_col: str = "text",
                            min_sim: float = 0.0) -> str:
    # MATERIALIZED + jaccard-once subquery: the shingle CTE feeds both
    # self-join legs and the score feeds select+filter — without them
    # DuckDB re-inlines the shingle computation per leg and the list
    # intersection per reference (~6x the oracle's gate wall time)
    return f"""
WITH sh AS MATERIALIZED (
  SELECT {id_col}, {shingles_sql()} AS sh
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})
),
half AS (SELECT COUNT(*) // 2 AS h FROM {table}),
probe AS (SELECT a.{id_col}, a.sh, a.{id_col} + h AS pk FROM sh a, half)
SELECT a_id, b_id, jaccard FROM (
  SELECT a.{id_col} AS a_id, b.{id_col} AS b_id,
         floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) * 1000000) / 1000000 AS jaccard
  FROM probe a JOIN sh b ON b.{id_col} = a.pk
)
WHERE jaccard >= {min_sim}
"""


# ---------------------------------------------------------------------------
# Dedup group assignment (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def dedup_groups(pairs: DataFrame, id_a: str = "a_id", id_b: str = "b_id",
                 iters: int = 4) -> DataFrame:
    """Assign every node appearing in ``pairs`` to its duplicate group
    (``group_id`` = min node id in the connected component) by
    ``iters`` rounds of min-label propagation.

    Closes the dedup pipeline: LSH proposes pairs, Jaccard verifies
    them, and this groups verified pairs so a keep-one-representative
    policy (keep ``doc_id == group_id``) can be applied.

    Scale shape: each round is one equi-join of the (symmetrized +
    self-looped) edge list against the label frontier plus a map-side
    partial MIN — both shuffles key on a node id, so AQE coalesces and
    skew-splits them.  Duplicate clusters found by LSH banding are
    near-cliques (every member shares a band with most others), so
    their diameter is tiny and a small fixed ``iters`` converges; for
    general graphs with long chains, raise ``iters`` (rounds needed =
    graph diameter).  Reference analog: the compare/dedup grouping of
    verified row matches (multiset diff buckets), re-expressed as a
    bounded iterative DataFrame computation.
    """
    # localCheckpoint the SLIM pair list first: fwd/rev/nodes/edges and
    # the label frontier all re-derive it (6+ evaluations of the
    # upstream LSH pipeline otherwise), and — unlike persist, which
    # keeps the full LOGICAL plan — the checkpoint truncates lineage to
    # a leaf, so each propagation round's Catalyst analysis sees a
    # two-column table instead of the whole mining pipeline nested
    # round-times over (measured on the semantic-dedup gate at sf0.1:
    # rounds 15.1 s -> 1.8 s, survivor select 13.7 s -> 1.1 s).
    pairs = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint()
    fwd = pairs
    rev = pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nodes = fwd.unionAll(rev).select("src").distinct()
    # self-loops make "min over neighbours" include the node's own label
    edges = fwd.unionAll(rev).unionAll(nodes.select("src", F.col("src").alias("dst")))
    edges = edges.persist()
    labels = nodes.select(F.col("src").alias("id"), F.col("src").alias("label"))
    for _ in range(iters):
        labels = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "id")
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("group_id"))


def dedup_groups_sql(pairs_sql: str, id_a: str = "a_id", id_b: str = "b_id",
                     iters: int = 4) -> str:
    """DuckDB twin of :func:`dedup_groups` — the propagation rounds are
    unrolled into ``iters`` chained CTEs (l1..lN), each the exact
    relational step the Spark loop takes."""
    ctes = [
        f"pairs AS ({pairs_sql})",
        f"edges AS (SELECT {id_a} AS src, {id_b} AS dst FROM pairs"
        f" UNION ALL SELECT {id_b}, {id_a} FROM pairs"
        f" UNION ALL SELECT {id_a}, {id_a} FROM pairs"
        f" UNION ALL SELECT {id_b}, {id_b} FROM pairs)",
        "l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges)",
    ]
    for i in range(iters):
        ctes.append(
            f"l{i + 1} AS (SELECT e.src AS id, MIN(l.label) AS label "
            f"FROM edges e JOIN l{i} l ON e.dst = l.id GROUP BY e.src)"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id AS doc_id, label AS group_id FROM l{iters}")


# ---------------------------------------------------------------------------
# Line-level exact dedup (the C4 / RefinedWeb pass: boilerplate lines
# repeat across pages; a doc dominated by corpus-duplicated lines is
# boilerplate itself)
# ---------------------------------------------------------------------------

def duplicate_line_stats(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Per-document duplicate-line statistics against the whole corpus:
    ``n_lines``, ``n_dup_lines`` (lines whose trimmed content occurs
    more than once corpus-wide, counting multiplicity), and
    ``dup_line_ratio``.

    Scale shape: lines hash to 32-byte md5 map-side, so both shuffles
    (global line-frequency groupBy, then per-doc rollup) move hashes +
    counts, never line text.  The frequency side aggregates BEFORE the
    join — at 100 TB the distinct-line table is the small side of a
    key-only join, and duplicated boilerplate lines (the skew hazard)
    are exactly what AQE's skew-join splitting handles."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    lines = (
        ensure_parallelism(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode_outer(F.split(F.col(text_col), "\n")).alias("line"))
        .select(id_col, F.trim(F.col("line")).alias("line"))
        .filter(F.length("line") > 0)
        .select(id_col, F.md5(F.col("line")).alias("lk"))
    )
    freq = lines.groupBy("lk").agg(F.count(F.lit(1)).alias("occ"))
    return (
        lines.join(freq, "lk")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("n_dup_lines"),
        )
        .select(
            id_col,
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.col("n_dup_lines").cast("bigint").alias("n_dup_lines"),
            (F.col("n_dup_lines").cast("double") / F.col("n_lines")).alias("dup_line_ratio"),
        )
    )


def duplicate_line_stats_sql(table: str, id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB twin of :func:`duplicate_line_stats` (string_split on
    chr(10) ≡ Spark's regex split on '\\n' for literal newlines)."""
    return f"""
WITH lines AS (
  SELECT {id_col}, md5(line) AS lk
  FROM (SELECT {id_col}, trim(unnest(string_split({text_col}, chr(10)))) AS line
        FROM {table})
  WHERE len(line) > 0
),
freq AS (SELECT lk, COUNT(*) AS occ FROM lines GROUP BY lk)
SELECT {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
       CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_line_ratio
FROM lines JOIN freq USING (lk)
GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# Set-similarity join via prefix filtering (PPJoin-style) — the third
# classic near-dup family alongside MinHash-LSH and SimHash.  Exact
# (no probabilistic misses above the threshold): two sets with
# Jaccard >= t MUST share a token within each other's rarest-first
# prefix of length n - ceil(t*n) + 1, so joining on prefix tokens
# finds every qualifying pair while the frequency ordering keeps
# candidate buckets small (rare tokens first -> tiny join fan-out).
# ---------------------------------------------------------------------------


def _prefix_len_expr(n):
    # ceil(0.7 * n) computed in integers: floor((7n + 9) / 10) — no
    # float boundary anywhere, so both engines agree at every n
    return n - F.floor((n * 7 + 9) / 10).cast("long") + 1


def prefix_filter_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Near-dup pairs with 5-gram-shingle-set Jaccard >= 0.7 via
    prefix filtering: rank the shingle vocabulary rarest-first, keep
    each doc's rank-sorted shingle set, join docs sharing a PREFIX
    rank, verify exact Jaccard on the carried rank arrays (integer
    cross-multiplied 10*|∩| >= 7*|∪|, no float threshold).

    Shingle order matters doubly here: unigram (or short-shingle)
    vocabularies are small, sets collide corpus-wide, and prefix
    buckets go quadratic; 5-gram shingles make the space large enough
    that only genuine near-dups share rare prefix entries.

    Scale shape: rarity ordering WITHOUT a global rank — the sort key
    is ``lpad(count)||shingle`` (bijective with the shingle;
    lexicographic order == (count, shingle) order), so no
    single-partition row_number window and no vocabulary broadcast
    ever happens: the count join is an ordinary shuffle join on the
    shingle, per-doc arrays shuffle once to the prefix join, and the
    buckets are rare-shingle-keyed — the EXACT-join complement of the
    probabilistic MinHash-LSH path (no misses above threshold)."""
    from dbms_spark.llm.text import tokens_expr
    from dbms_spark.plans.parallelism import ensure_parallelism

    # persist the slim (doc, shingle) stream: the vocabulary count and
    # the rarity-key join both consume it — without the cache the
    # shingle explosion (the expensive map) runs twice.
    # explode_outer + post-filter, NOT explode: a plain explode gets an
    # inferred size()>0 filter that re-inlines the whole shingle
    # expression as a per-row predicate (~10x the map cost — same trap
    # documented at top_ngrams/contamination_check)
    toks = (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .withColumn("sh", shingles_expr(5))
        .select(F.col(id_col), F.explode_outer("sh").alias("t"))
        .filter(F.col("t").isNotNull())
        .persist()
    )
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    keyed = toks.join(vocab, "t").select(
        F.col(id_col),
        F.concat(F.lpad(F.col("c").cast("string"), 12, "0"), F.col("t")).alias("r"))
    docr = (
        keyed.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("r")).alias("ranks"),
             F.count(F.lit(1)).cast("long").alias("n"))
        .persist()
    )
    # candidate join carries IDS ONLY — the (large) rank arrays would
    # otherwise be duplicated x(prefix length) through the explode;
    # they re-attach afterwards to the (small) surviving pair set
    pref = docr.select(
        F.col(id_col),
        F.explode(F.slice("ranks", 1, _prefix_len_expr(F.col("n")))).alias("pr"),
    )
    cand = (
        pref.select(F.col(id_col).alias("a_id"), "pr")
        .join(pref.select(F.col(id_col).alias("b_id"), "pr"), ["pr"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    va = docr.select(F.col(id_col).alias("a_id"), F.col("ranks").alias("ra"),
                     F.col("n").alias("na"))
    vb = docr.select(F.col(id_col).alias("b_id"), F.col("ranks").alias("rb"),
                     F.col("n").alias("nb"))
    inter = F.size(F.array_intersect("ra", "rb")).cast("long")
    return (
        cand.join(va, "a_id").join(vb, "b_id")
        .select(
            "a_id", "b_id", inter.alias("inter"),
            (F.col("na") + F.col("nb") - inter).alias("uni"),
        )
        .filter(F.col("inter") * 10 >= F.col("uni") * 7)
    )


def prefix_filter_pairs_sql(table: str, id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    from dbms_spark.llm.text import tokens_sql

    return f"""
WITH tok AS (SELECT {id_col}, unnest({shingles_sql(5)}) AS t
             FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})),
vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
keyed AS (SELECT {id_col}, lpad(CAST(c AS VARCHAR), 12, '0') || t AS r
          FROM tok JOIN vocab USING (t)),
docr AS (SELECT {id_col}, list_sort(list(r)) AS ranks, CAST(COUNT(*) AS BIGINT) AS n
         FROM keyed GROUP BY {id_col}),
pref AS (SELECT {id_col}, ranks, n,
                unnest(ranks[1 : CAST(n - floor((n * 7 + 9) / 10) + 1 AS BIGINT)]) AS pr
         FROM docr),
cand AS (SELECT DISTINCT a.{id_col} AS a_id, b.{id_col} AS b_id,
                a.ranks AS ra, b.ranks AS rb, a.n AS na, b.n AS nb
         FROM pref a JOIN pref b ON a.pr = b.pr AND a.{id_col} < b.{id_col})
SELECT a_id, b_id, inter, uni
FROM (SELECT a_id, b_id, CAST(len(list_intersect(ra, rb)) AS BIGINT) AS inter,
             na + nb - CAST(len(list_intersect(ra, rb)) AS BIGINT) AS uni
      FROM cand)
WHERE inter * 10 >= uni * 7
"""


def strip_duplicated_lines(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", max_occ: int = 1) -> DataFrame:
    """Corpus-level boilerplate strip: drop every line whose TRIMMED
    content occurs in more than ``max_occ`` documents corpus-wide,
    then REASSEMBLE each document from its surviving ORIGINAL lines in
    original order (the C4/RefinedWeb repeated-line removal,
    completing :func:`duplicate_line_stats` which only reports).

    Matching is on the trimmed line (indentation variants of the same
    boilerplate collapse to one key), but surviving lines are emitted
    VERBATIM — indentation and inner spacing survive, so code and
    markdown round-trip.  Blank/whitespace-only lines are structure,
    not boilerplate candidates: always kept, never counted.
    ``n_kept_lines`` counts surviving non-blank lines; a document
    whose every non-blank line is boilerplate keeps its blanks with
    ``n_kept_lines = 0``, and one that is ENTIRELY boilerplate (no
    blanks either) still emits a row with ``clean_text = ''`` and
    ``n_kept_lines = 0`` — every input doc appears in the output (a
    downstream quality filter's problem to drop, not ours).  Only an
    empty-text doc degenerates to a single blank kept line.

    Scale shape: line DF (document frequency) aggregates over 32-byte
    md5 line keys — text crosses the wire once, carried next to its
    (doc, pos) key for the rebuild; the frequency side of the join is
    hash+count only.  Reassembly is one per-doc aggregation of
    (pos, line) structs sorted in-array — no window, no second sort
    shuffle."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    lines = (
        ensure_parallelism(df.select(id_col, text_col))
        .select(F.col(id_col),
                F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
        .withColumn("blank", F.length(F.trim(F.col("line"))) == 0)
        .withColumn("lk", F.when(~F.col("blank"), F.md5(F.trim(F.col("line")))))
    )
    docfreq = (
        lines.filter(~F.col("blank")).select("lk", id_col).distinct()
        .groupBy("lk").agg(F.count(F.lit(1)).alias("df"))
    )
    # dropped lines become NULL structs (skipped by collect_list) instead
    # of filtered-out ROWS: every doc keeps >=1 line row (split always
    # yields one element), so a fully-boilerplate doc still groups and
    # emits (clean_text='', n_kept_lines=0) — no doc-set join needed
    keep = F.col("blank") | (F.col("df") <= max_occ)
    marked = (
        lines.join(docfreq, "lk", "left")
        .withColumn("keep", keep)
    )
    return (
        marked.groupBy(id_col)
        .agg(F.expr(
            "array_join(transform(array_sort("
            "collect_list(CASE WHEN keep THEN struct(pos, line) END)),"
            " x -> x.line), '\n')").alias("clean_text"),
             F.sum(F.when(F.col("keep") & ~F.col("blank"), 1).otherwise(0))
             .cast("bigint").alias("n_kept_lines"))
    )


def strip_duplicated_lines_sql(table: str, id_col: str = "doc_id",
                               text_col: str = "text", max_occ: int = 1) -> str:
    """DuckDB twin of :func:`strip_duplicated_lines` —
    generate_subscripts supplies Spark's posexplode ordinal, and the
    ordered string_agg reproduces the in-array sorted rebuild."""
    return f"""
WITH split AS (
  SELECT {id_col}, string_split({text_col}, chr(10)) AS ls FROM {table}
),
lines AS (
  SELECT {id_col}, pos, line,
         len(trim(line)) = 0 AS blank,
         CASE WHEN len(trim(line)) > 0 THEN md5(trim(line)) END AS lk
  FROM (SELECT {id_col},
               unnest(ls) AS line,
               generate_subscripts(ls, 1) - 1 AS pos
        FROM split)
),
docfreq AS (
  SELECT lk, COUNT(*) AS df
  FROM (SELECT DISTINCT lk, {id_col} FROM lines WHERE NOT blank) GROUP BY lk
)
SELECT {id_col},
       COALESCE(string_agg(CASE WHEN blank OR df <= {max_occ} THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text,
       CAST(SUM(CASE WHEN (blank OR df <= {max_occ}) AND NOT blank
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines
FROM lines LEFT JOIN docfreq USING (lk)
GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# Exact duplicate-passage mining (cross-doc repeated n-token windows)
#
# The window form of exact-substring dedup (Lee et al. 2022 use suffix
# arrays on one machine; the distributed re-expression is fixed-width
# token windows, whose hashes shuffle like any other key): every
# n-token sliding window is hashed, a window is DUPLICATED when its
# hash occurs in >= 2 distinct docs, and the strip operator removes
# every token covered by a duplicated window.  Complements the line-
# level operators (duplicate_line_stats): passages that repeat across
# docs WITHOUT line boundaries — license blurbs re-wrapped, quoted
# paragraphs, templated sentences — are invisible to line dedup.
#
# Scale shape: the window relation is O(total tokens) rows of
# (doc_id, pos, 32-byte hash) — hashes shuffle, never window text; the
# duplicated set is the group-filtered slim side and joins back
# semi/inner on the hash.  Cover expansion is O(dup windows x n).
# ---------------------------------------------------------------------------


def _windows_spark(n: int) -> str:
    """``toks`` -> array<struct<pos,wh>>: 0-based window start + md5 of
    the space-joined n-token window.  The filter (not a CASE) keeps the
    branch typed when the doc is shorter than ``n``."""
    return (
        f"filter(transform(sequence(0, greatest(size(toks) - {n}, 0)), "
        f"i -> struct(i AS pos, md5(concat_ws(' ', slice(toks, i + 1, {n}))) AS wh)), "
        f"s -> s.pos <= size(toks) - {n})"
    )


def _windows_duck(n: int) -> str:
    """DuckDB twin of :func:`_windows_spark` (range() end-exclusive)."""
    return (
        f"[struct_pack(pos := i, wh := md5(array_to_string(toks[i+1:i+{n}], ' '))) "
        f"for i in range(0, greatest(len(toks) - {n} + 1, 0))]"
    )


def _window_rel(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, pos, wh) exploded window relation."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    return (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .select(F.col(id_col), F.explode(F.expr(_windows_spark(n))).alias("w"))
        .select(F.col(id_col), F.col("w.pos").alias("pos"), F.col("w.wh").alias("wh"))
    )


def _window_rel_sql(table: str, id_col: str, text_col: str, n: int) -> str:
    return f"""
SELECT {id_col}, w.pos AS pos, w.wh AS wh
FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}) t,
     LATERAL (SELECT unnest({_windows_duck(n)}, recursive := true)) AS w(pos, wh)
"""


def duplicate_passage_stats(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 5) -> DataFrame:
    """Per-doc duplicated-passage exposure: total windows, windows whose
    hash appears in >= 2 distinct docs, and their ppm share.  Every
    input doc emits a row (docs shorter than ``n`` tokens report
    0/0/0)."""
    w = _window_rel(df, id_col, text_col, n)
    # ONE derivation of the O(total tokens) window relation: group to
    # (wh, doc) occurrence counts, count the hash's distinct docs with
    # a window over the grouped rows (each (wh, doc) row IS one
    # distinct doc), and fold both per-doc counters out of one
    # aggregate.  The previous shape derived `w` twice — once into the
    # duplicated-hash set, once into the per-doc join leg — i.e. two
    # full tokenize+window+md5 passes over the corpus.
    # HOT-HASH STRAGGLER (ADVICE, round 11): the partitionBy(wh)
    # window has no AQE skew-split and no map-side combine, so a
    # boilerplate passage shared by millions of docs lands its (wh,
    # doc) rows in one task.  Bounded by the pre-aggregation to ONE
    # row per (hash, doc) — the task sorts distinct docs, not
    # occurrences — and WindowExec spills, so the cost is a straggler,
    # not an OOM; the old groupBy dup-set form was partial-aggregated
    # but paid a second full corpus pass.  Same documented tradeoff
    # as the capped LSH miner.
    g = w.groupBy("wh", id_col).agg(F.count(F.lit(1)).alias("c"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("wh"))
    per_doc = (
        g.withColumn("__nd", nd)
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_w"),
             F.sum(F.when(F.col("__nd") >= 2, F.col("c"))
                   .otherwise(F.lit(0))).alias("dup_w"))
    )
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_w", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("dup_w", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.when(F.coalesce("n_w", F.lit(0)) > 0,
                   F.floor(F.coalesce("dup_w", F.lit(0)) * 1000000
                           / F.col("n_w"))).otherwise(0)
            .cast("bigint").alias("dup_window_ppm"),
        )
    )


def duplicate_passage_stats_sql(table: str, id_col: str = "doc_id",
                                text_col: str = "text", n: int = 5) -> str:
    return f"""
WITH w AS ({_window_rel_sql(table, id_col, text_col, n)}),
dup AS (
  SELECT wh, 1 AS isdup FROM (SELECT DISTINCT wh, {id_col} FROM w)
  GROUP BY wh HAVING COUNT(*) >= 2
),
per_doc AS (
  SELECT {id_col}, COUNT(*) AS n_w, SUM(COALESCE(isdup, 0)) AS dup_w
  FROM w LEFT JOIN dup USING (wh)
  GROUP BY {id_col}
)
SELECT b.{id_col},
       CAST(COALESCE(n_w, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(dup_w, 0) AS BIGINT) AS n_dup_windows,
       CAST(CASE WHEN COALESCE(n_w, 0) > 0
                 THEN floor(COALESCE(dup_w, 0) * 1000000 / n_w)
                 ELSE 0 END AS BIGINT) AS dup_window_ppm
FROM (SELECT DISTINCT {id_col} FROM {table}) b
LEFT JOIN per_doc USING ({id_col})
"""


def top_duplicate_passages(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 5,
                           k: int = 20) -> DataFrame:
    """The ``k`` most-repeated cross-doc passages WITH their text:
    (wh, n_docs, n_occurrences, passage).  Passage text is re-derived
    for the top-k ONLY — the mining shuffle carries hashes and an
    exemplar (min doc, pos) key, then the k-row result broadcasts back
    against the corpus to slice the actual tokens, so full window text
    never rides a shuffle.  Deterministic order: occurrences desc, wh."""
    w = _window_rel(df, id_col, text_col, n)
    ekey = F.concat(F.lpad(F.col(id_col).cast("string"), 12, "0"),
                    F.lpad(F.col("pos").cast("string"), 8, "0"))
    top = (
        w.withColumn("__ek", ekey)
        .groupBy("wh")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.expr(f"count(distinct {id_col})").alias("n_docs"),
            F.expr(f"min_by({id_col}, __ek)").alias("__edoc"),
            F.expr("min_by(pos, __ek)").alias("__epos"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("wh"))
        .limit(k)
    )
    toks = df.select(F.col(id_col).alias("__edoc"), tokens_expr(text_col).alias("toks"))
    return (
        F.broadcast(top).join(toks, "__edoc")
        .select(
            "wh",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
            F.expr(f"concat_ws(' ', slice(toks, __epos + 1, {n}))").alias("passage"),
        )
    )


def top_duplicate_passages_sql(table: str, id_col: str = "doc_id",
                               text_col: str = "text", n: int = 5,
                               k: int = 20) -> str:
    return f"""
WITH w AS ({_window_rel_sql(table, id_col, text_col, n)}),
top AS (
  SELECT wh, COUNT(*) AS n_occurrences, COUNT(DISTINCT {id_col}) AS n_docs,
         arg_min({id_col}, lpad(CAST({id_col} AS VARCHAR), 12, '0')
                           || lpad(CAST(pos AS VARCHAR), 8, '0')) AS edoc,
         arg_min(pos, lpad(CAST({id_col} AS VARCHAR), 12, '0')
                      || lpad(CAST(pos AS VARCHAR), 8, '0')) AS epos
  FROM w GROUP BY wh HAVING COUNT(DISTINCT {id_col}) >= 2
  ORDER BY n_occurrences DESC, wh LIMIT {k}
)
SELECT wh, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_occurrences AS BIGINT) AS n_occurrences,
       array_to_string(toks[epos+1:epos+{n}], ' ') AS passage
FROM top JOIN (SELECT {id_col} AS edoc, {tokens_sql(text_col)} AS toks
               FROM {table}) USING (edoc)
"""


def strip_duplicated_passages(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text", n: int = 5) -> DataFrame:
    """Rebuild each doc WITHOUT tokens covered by any cross-doc
    duplicated window: (id, clean_text, n_kept_tokens).  Every input
    doc emits a row — one whose every token is covered comes back with
    ``clean_text = ''`` and ``n_kept_tokens = 0`` (mirrors the
    strip_duplicated_lines contract).

    Cover expansion is the slim side: duplicated (doc, window-start)
    rows explode to at most ``n`` covered positions each and anti-join
    the posexploded token relation on (doc, pos); the rebuild is one
    per-doc sort of surviving (pos, token) structs."""
    w = _window_rel(df, id_col, text_col, n)
    # ONE derivation of the window relation (the duplicate_passage_stats
    # rewrite): fold each (wh, doc)'s start positions into one row, count
    # the hash's distinct docs with a window over those rows, and expand
    # covers only for hashes seen in >= 2 docs — the duplicated-set
    # semi-join needed a second full tokenize+window+md5 pass.
    # Hot-hash straggler tradeoff documented in duplicate_passage_stats:
    # the partitionBy(wh) window puts a boilerplate hash's rows in one
    # task, bounded to one row per (hash, doc) by the pre-aggregation.
    g = w.groupBy("wh", F.col(id_col)).agg(F.collect_list("pos").alias("poss"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("wh"))
    covered = (
        g.withColumn("__nd", nd)
        .filter(F.col("__nd") >= 2)
        .select(F.col(id_col), F.explode("poss").alias("pos"))
        .select(F.col(id_col),
                F.explode(F.expr(f"sequence(pos, pos + {n - 1})")).alias("tpos"))
        .distinct()
    )
    toks = (
        df.withColumn("toks", tokens_expr(text_col))
        .select(F.col(id_col), F.posexplode("toks").alias("tpos", "tok"))
    )
    kept = (
        toks.join(covered, [id_col, "tpos"], "left_anti")
        .groupBy(id_col)
        .agg(F.expr("array_sort(collect_list(struct(tpos, tok)))").alias("ps"))
        .select(
            F.col(id_col),
            F.expr("concat_ws(' ', transform(ps, p -> p.tok))").alias("clean_text"),
            F.expr("size(ps)").cast("bigint").alias("n_kept_tokens"),
        )
    )
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(kept, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept_tokens", F.lit(0)).cast("bigint").alias("n_kept_tokens"),
        )
    )


def strip_duplicated_passages_sql(table: str, id_col: str = "doc_id",
                                  text_col: str = "text", n: int = 5) -> str:
    return f"""
WITH w AS ({_window_rel_sql(table, id_col, text_col, n)}),
dup AS (
  SELECT wh FROM (SELECT DISTINCT wh, {id_col} FROM w)
  GROUP BY wh HAVING COUNT(*) >= 2
),
covered AS (
  SELECT DISTINCT {id_col}, pos + s.i AS tpos
  FROM w SEMI JOIN dup USING (wh),
       LATERAL (SELECT unnest(range(0, {n})) AS i) s
),
toks AS (
  SELECT {id_col}, t.tpos - 1 AS tpos, t.tok
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS tk FROM {table}),
       LATERAL (SELECT unnest(tk) AS tok, generate_subscripts(tk, 1) AS tpos) t
),
kept AS (
  SELECT {id_col}, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         COUNT(*) AS n_kept
  FROM toks ANTI JOIN covered USING ({id_col}, tpos)
  GROUP BY {id_col}
)
SELECT b.{id_col}, COALESCE(clean_text, '') AS clean_text,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept_tokens
FROM (SELECT DISTINCT {id_col} FROM {table}) b
LEFT JOIN kept USING ({id_col})
"""


def duplicate_passages_between(new_df: DataFrame, corpus_df: DataFrame,
                               id_col: str = "doc_id", text_col: str = "text",
                               n: int = 5) -> DataFrame:
    """Incremental passage dedup: per NEW-batch doc, how many of its
    n-token windows already exist in the CORPUS — (id, n_windows,
    n_corpus_dup_windows, dup_window_ppm), every batch doc emitting a
    row.

    The production intake shape (mirrors
    :func:`lsh_candidate_pairs_between`): the corpus's window-hash
    relation is mined once and persisted by the caller; each batch
    hashes only itself — O(batch tokens) map work — and semi-joins the
    corpus hashes, so intake cost never re-reads the corpus text.
    Within-batch duplication stays :func:`duplicate_passage_stats` on
    the batch alone."""
    bw = _window_rel(new_df, id_col, text_col, n)
    cw = (_window_rel(corpus_df, id_col, text_col, n)
          .select("wh").distinct().withColumn("__dup", F.lit(1)))
    # one per-doc aggregate carries both counters (see
    # duplicate_passage_stats): left-join flag instead of semi-join +
    # second groupBy + second base join
    per_doc = (
        bw.join(cw, "wh", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_w"),
             F.sum(F.coalesce("__dup", F.lit(0))).alias("dup_w"))
    )
    base = new_df.select(F.col(id_col)).distinct()
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_w", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("dup_w", F.lit(0)).cast("bigint").alias("n_corpus_dup_windows"),
            F.when(F.coalesce("n_w", F.lit(0)) > 0,
                   F.floor(F.coalesce("dup_w", F.lit(0)) * 1000000
                           / F.col("n_w"))).otherwise(0)
            .cast("bigint").alias("dup_window_ppm"),
        )
    )


def duplicate_passages_between_sql(new_sql: str, corpus_sql: str,
                                   id_col: str = "doc_id", text_col: str = "text",
                                   n: int = 5) -> str:
    return f"""
WITH bw AS ({_window_rel_sql(f"({new_sql})", id_col, text_col, n)}),
cw AS (SELECT DISTINCT wh, 1 AS isdup
       FROM ({_window_rel_sql(f"({corpus_sql})", id_col, text_col, n)})),
per_doc AS (
  SELECT {id_col}, COUNT(*) AS n_w, SUM(COALESCE(isdup, 0)) AS dup_w
  FROM bw LEFT JOIN cw USING (wh)
  GROUP BY {id_col}
)
SELECT b.{id_col},
       CAST(COALESCE(n_w, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(dup_w, 0) AS BIGINT) AS n_corpus_dup_windows,
       CAST(CASE WHEN COALESCE(n_w, 0) > 0
                 THEN floor(COALESCE(dup_w, 0) * 1000000 / n_w)
                 ELSE 0 END AS BIGINT) AS dup_window_ppm
FROM (SELECT DISTINCT {id_col} FROM ({new_sql}) b0) b
LEFT JOIN per_doc USING ({id_col})
"""


# ---------------------------------------------------------------------------
# Winnowed passage fingerprints (Schleimer et al. 2003, SIGMOD —
# "Winnowing: Local Algorithms for Document Fingerprinting")
#
# The scale path for passage mining: instead of shuffling EVERY n-token
# window hash (O(total tokens) rows), select per position-window of w
# consecutive hashes the MINIMUM — the winnowing guarantee is that any
# substring shared between two docs of length >= n + w - 1 tokens
# contributes at least one IDENTICAL selected fingerprint in both, while
# the expected density of selected fingerprints is 2/(w+1) of positions.
# Mining then shuffles only the distinct selected fingerprints.
#
# Naive stride-s sampling has NO such guarantee (cross-doc copies align
# at different offsets mod s and are missed); winnowing's selection is
# content-defined, so alignment is irrelevant.
# ---------------------------------------------------------------------------


def _winnow_hashes_spark(n: int) -> str:
    """``toks`` -> bigint array of per-position window hashes (first 12
    md5 hex digits = 48 bits as an integer — value-identical to the
    DuckDB twin; 48 bits keeps fingerprint collisions negligible to
    ~10^7 windows, far past any per-partition corpus slice)."""
    return (
        f"transform(filter(sequence(0, greatest(size(toks) - {n}, 0)), "
        f"i -> i <= size(toks) - {n}), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', slice(toks, i + 1, {n}))), 1, 12), 16, 10) as bigint))"
    )


def _winnow_hashes_duck(n: int) -> str:
    return (
        f"[('0x' || substr(md5(array_to_string(toks[i+1:i+{n}], ' ')), 1, 12))::BIGINT "
        f"for i in range(0, greatest(len(toks) - {n} + 1, 0))]"
    )


def winnowed_fingerprints(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 5,
                          w: int = 4) -> DataFrame:
    """Per-doc DISTINCT winnowed fingerprints (id, fp): the minimum of
    each ``w``-long run of consecutive n-token window hashes.  Shared
    substrings of >= ``n + w - 1`` tokens are guaranteed to share a
    fingerprint; expected selected density is 2/(w+1).  All map-side
    array math (per-doc dedup via array_distinct before the explode) —
    this function itself shuffles nothing beyond the parallelism
    guard."""
    from dbms_spark.plans.parallelism import ensure_parallelism

    # Short-doc rule (standard winnowing): with 1 <= |hs| < w hashes the
    # whole doc is one selection window -> emit min(hs), so every doc of
    # >= n tokens yields at least one fingerprint.
    sel = (
        f"case when size(hs) >= {w} then "
        f"array_distinct(transform(filter(sequence(0, greatest(size(hs) - {w}, 0)), "
        f"i -> i <= size(hs) - {w}), "
        f"i -> array_min(slice(hs, i + 1, {w})))) "
        f"when size(hs) >= 1 then array(array_min(hs)) "
        f"else cast(array() as array<bigint>) end"
    )
    return (
        ensure_parallelism(df)
        .withColumn("toks", tokens_expr(text_col))
        .withColumn("hs", F.expr(_winnow_hashes_spark(n)))
        .select(F.col(id_col), F.explode(F.expr(sel)).alias("fp"))
    )


def winnowed_fingerprints_sql(table: str, id_col: str = "doc_id",
                              text_col: str = "text", n: int = 5,
                              w: int = 4) -> str:
    sel = (
        f"CASE WHEN len(hs) >= {w} THEN "
        f"list_distinct([list_min(hs[i+1:i+{w}]) "
        f"for i in range(0, greatest(len(hs) - {w} + 1, 0))]) "
        f"WHEN len(hs) >= 1 THEN [list_min(hs)] "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
    return f"""
SELECT {id_col}, f.fp AS fp
FROM (SELECT {id_col}, {sel} AS fps
      FROM (SELECT {id_col}, {_winnow_hashes_duck(n)} AS hs
            FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}))),
     LATERAL (SELECT unnest(fps) AS fp) f
"""


def winnowed_duplicate_stats(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", n: int = 5,
                             w: int = 4) -> DataFrame:
    """Per-doc winnowed-fingerprint dup exposure: (id, n_fps, n_dup_fps,
    dup_fp_ppm) — the 2/(w+1)-density form of
    :func:`duplicate_passage_stats` for corpora where shuffling every
    window is too much.  A fingerprint is duplicated when it appears in
    >= 2 distinct docs.  Every input doc emits a row."""
    fps = winnowed_fingerprints(df, id_col, text_col, n, w)
    # fingerprints are per-doc DISTINCT by construction (array_distinct
    # before the explode), so each (fp, doc) row is one distinct doc:
    # a window count over fp IS count(distinct doc) — one derivation
    # of the winnowing pass instead of the two the duplicated-set join
    # paid (see duplicate_passage_stats for the same rewrite, and for
    # the documented hot-fingerprint single-task window tradeoff)
    nd = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    per_doc = (
        fps.withColumn("__nd", nd)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_f"),
             F.sum(F.when(F.col("__nd") >= 2, F.lit(1))
                   .otherwise(F.lit(0))).alias("dup_f"))
    )
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_f", F.lit(0)).cast("bigint").alias("n_fps"),
            F.coalesce("dup_f", F.lit(0)).cast("bigint").alias("n_dup_fps"),
            F.when(F.coalesce("n_f", F.lit(0)) > 0,
                   F.floor(F.coalesce("dup_f", F.lit(0)) * 1000000
                           / F.col("n_f"))).otherwise(0)
            .cast("bigint").alias("dup_fp_ppm"),
        )
    )


def winnowed_duplicate_stats_sql(table: str, id_col: str = "doc_id",
                                 text_col: str = "text", n: int = 5,
                                 w: int = 4) -> str:
    return f"""
WITH fps AS ({winnowed_fingerprints_sql(table, id_col, text_col, n, w)}),
dup AS (
  SELECT fp, 1 AS isdup FROM fps GROUP BY fp HAVING COUNT(DISTINCT {id_col}) >= 2
),
per_doc AS (
  SELECT {id_col}, COUNT(*) AS n_f, SUM(COALESCE(isdup, 0)) AS dup_f
  FROM fps LEFT JOIN dup USING (fp)
  GROUP BY {id_col}
)
SELECT b.{id_col},
       CAST(COALESCE(n_f, 0) AS BIGINT) AS n_fps,
       CAST(COALESCE(dup_f, 0) AS BIGINT) AS n_dup_fps,
       CAST(CASE WHEN COALESCE(n_f, 0) > 0
                 THEN floor(COALESCE(dup_f, 0) * 1000000 / n_f)
                 ELSE 0 END AS BIGINT) AS dup_fp_ppm
FROM (SELECT DISTINCT {id_col} FROM {table}) b
LEFT JOIN per_doc USING ({id_col})
"""


def winnowed_duplicates_between(new_df: DataFrame, corpus_df: DataFrame | None,
                                id_col: str = "doc_id", text_col: str = "text",
                                n: int = 5, w: int = 4,
                                corpus_fps: DataFrame | None = None) -> DataFrame:
    """Incremental winnowed intake: per NEW-batch doc, how many of its
    selected fingerprints already exist in the CORPUS's fingerprint
    set — (id, n_fps, n_corpus_dup_fps, dup_fp_ppm), every batch doc
    emitting a row.

    The winnowing guarantee carries over to the two-corpus case: both
    sides select with the same content-defined rule, so a batch doc
    sharing a passage of >= n + w - 1 tokens with ANY corpus doc
    shares at least one selected fingerprint with it — at 2/(w+1) of
    the shuffle volume :func:`duplicate_passages_between` pays.  The
    corpus fingerprint relation is mined once and persisted by the
    caller; intake is O(batch tokens) map work plus a left join
    against it (one per-doc aggregate carries both counters, as in
    duplicate_passage_stats).

    Pass ``corpus_fps`` (any relation with an ``fp`` column — e.g. the
    persisted output of :func:`winnowed_fingerprints`) to skip mining
    the corpus entirely: the nightly-intake form where the raw corpus
    is never re-read (``corpus_df`` may then be None)."""
    bf = winnowed_fingerprints(new_df, id_col, text_col, n, w)
    if corpus_fps is not None:
        cf = corpus_fps.select("fp").distinct().withColumn("__dup", F.lit(1))
    else:
        cf = (winnowed_fingerprints(corpus_df, id_col, text_col, n, w)
              .select("fp").distinct().withColumn("__dup", F.lit(1)))
    per_doc = (
        bf.join(cf, "fp", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_f"),
             F.sum(F.coalesce("__dup", F.lit(0))).alias("dup_f"))
    )
    base = new_df.select(F.col(id_col)).distinct()
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_f", F.lit(0)).cast("bigint").alias("n_fps"),
            F.coalesce("dup_f", F.lit(0)).cast("bigint").alias("n_corpus_dup_fps"),
            F.when(F.coalesce("n_f", F.lit(0)) > 0,
                   F.floor(F.coalesce("dup_f", F.lit(0)) * 1000000
                           / F.col("n_f"))).otherwise(0)
            .cast("bigint").alias("dup_fp_ppm"),
        )
    )


def winnowed_duplicates_between_sql(new_sql: str, corpus_sql: str,
                                    id_col: str = "doc_id", text_col: str = "text",
                                    n: int = 5, w: int = 4) -> str:
    bf = winnowed_fingerprints_sql(f"({new_sql})", id_col, text_col, n, w)
    cf = winnowed_fingerprints_sql(f"({corpus_sql})", id_col, text_col, n, w)
    return f"""
WITH bf AS ({bf}),
cf AS (SELECT DISTINCT fp, 1 AS isdup FROM ({cf})),
per_doc AS (
  SELECT {id_col}, COUNT(*) AS n_f, SUM(COALESCE(isdup, 0)) AS dup_f
  FROM bf LEFT JOIN cf USING (fp)
  GROUP BY {id_col}
)
SELECT b.{id_col},
       CAST(COALESCE(n_f, 0) AS BIGINT) AS n_fps,
       CAST(COALESCE(dup_f, 0) AS BIGINT) AS n_corpus_dup_fps,
       CAST(CASE WHEN COALESCE(n_f, 0) > 0
                 THEN floor(COALESCE(dup_f, 0) * 1000000 / n_f)
                 ELSE 0 END AS BIGINT) AS dup_fp_ppm
FROM (SELECT DISTINCT {id_col} FROM ({new_sql})) b
LEFT JOIN per_doc USING ({id_col})
"""


# ---------------------------------------------------------------------------
# Containment (near-subset) duplication
# ---------------------------------------------------------------------------

#: floor-quantized 6-dp containment of side X's shingles in the pair's
#: intersection — ratio of identical ints, cross-engine identical.
_CONTAIN = ("floor(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) "
            "/ size(sh_{side}) * 1000000) / 1000000")


def derive_fp_cap(n_docs: int, floor: int = 64) -> int:
    """The fingerprint-occupancy cap SCALE RULE as a function —
    the derive-the-knob treatment (:func:`dbms_spark.llm.similarity.
    derive_n_planes`, Bloom m from NDV) applied to the containment
    family's one remaining opt-in bound: every fingerprint kept in
    the candidate self-join proposes ≤ cap² pairs, so total pair
    volume is ≤ cap · Σ occupancy = O(corpus fingerprint rows · cap);
    a cap that grows only log2(n) keeps that O(n log n) — where the
    UNCAPPED default let one boilerplate fingerprint shared by 10⁵
    docs propose 10¹⁰ pairs on its own (the skewed-unit-of-work
    hazard the reference's histogram divider bounds the same way,
    database/processor/data_compare_divider.go:41-201).

    Recall argument for dropping (not starring, as the capped LSH
    does): winnowing guarantees a contained doc of ≥ n + w − 1 tokens
    shares ALL its winnowed fingerprints with the host, so the pair
    survives unless EVERY shared fingerprint exceeds the cap — a doc
    made entirely of corpus-wide boilerplate, which subset-dedup
    should skip anyway.  The log2 growth term acknowledges that
    legitimate template occupancy rises with corpus size; the floor
    keeps small-corpus (gate-scale) runs exactly uncapped in effect
    (measured occupancy ≤ 4 at sf0.1).

    Exact integer arithmetic: ceil(log2(n)) computed as the bit
    length of n-1 — the same LENGTH(BIN(n-1)) expression both engine
    dialects emit (:func:`_fp_cap_sql_expr`, :func:`_fp_cap_col`), so
    the Python helper, the Spark operator, and the DuckDB twin share
    ONE cap value at every corpus size (float log2 could disagree at
    exact powers of two)."""
    return max(floor, 8 * max(1, n_docs - 1).bit_length())


def _fp_cap_col(n_col: F.Column, floor: int = 64) -> F.Column:
    """:func:`derive_fp_cap` as a Spark COLUMN over a row-count column
    — lets the capped operators derive the cap INSIDE the plan (a
    broadcast one-row aggregate) instead of paying an eager count()
    job at plan-construction time."""
    return F.greatest(
        F.lit(floor),
        (8 * F.length(F.bin(F.greatest(F.lit(1), n_col - 1)))).cast("int"))


def _fp_cap_sql_expr(count_sql: str, floor: int = 64) -> str:
    """:func:`derive_fp_cap` as a DuckDB scalar expression over a
    COUNT(*) subquery — the oracle-side half of the shared-cap
    contract."""
    return (f"GREATEST({floor}, 8 * LENGTH(BIN(CAST(GREATEST(1, "
            f"({count_sql}) - 1) AS BIGINT))))")


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 5, w: int = 4,
                      min_containment: float = 0.5,
                      fp_cap: int | str | None = "auto") -> DataFrame:
    """Asymmetric near-SUBSET duplicate pairs: containment
    C(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| — the
    quote-inclusion / page-embedded-in-aggregator geometry that
    symmetric Jaccard structurally misses (doc A fully quoted inside a
    10x larger B has J ~= |A|/|B| -> 0 but C(A in B) = 1; Broder 1997
    defined both measures for exactly this reason).  Output
    (a_id, b_id, c_a_in_b, c_b_in_a) with a_id < b_id, keeping pairs
    where EITHER direction >= ``min_containment``; containments are
    floor-quantized at 6 dp (integer ratios -> cross-engine identical).

    Candidates come from shared WINNOWED fingerprints (density
    2/(w+1)): any shared token run of >= n + w - 1 tokens guarantees a
    shared fingerprint (Schleimer 2003), so a contained doc of >= that
    length can never be missed.  The verify step re-joins the n-token
    shingle arrays by id and evaluates both directions map-side —
    exactly the propose/verify shape of jaccard_on_pairs.

    Scale: the fingerprint self-join shuffles fingerprint ints only;
    ``fp_cap`` drops fingerprints shared by more than ``cap`` docs
    (boilerplate mega-buckets — same occupancy control as the capped
    LSH; a fingerprint in 10^5 docs proposes 10^10 pairs and says
    nothing about subset structure).  The default ``"auto"`` derives
    the cap from the corpus size INSIDE the plan (a broadcast one-row
    count aggregate — no eager job at plan-construction time; pass an
    int to pin it, or None for explicitly unbounded), and the SQL
    twin derives the IDENTICAL cap from the same count
    (:func:`_fp_cap_sql_expr`), so operator and oracle share one
    contract at every scale — not only while the floor exceeds real
    occupancy.
    """
    from dbms_spark.llm.text import tokens_expr
    from dbms_spark.plans.parallelism import ensure_parallelism

    # 1-row relation, PERSISTED: the broadcast cap feeds both
    # self-join legs — unpersisted, each leg re-runs the corpus count
    capdf = (df.agg(_fp_cap_col(F.count(F.lit(1))).alias("__cap")).persist()
             if fp_cap == "auto" else None)
    # fps feeds both self-join legs and sh feeds both verify legs —
    # persisted so the corpus is tokenized once per relation instead
    # of once per leg (4 scans -> 2 on the gate plan; a long-lived
    # session batching many corpora should clearCache() between runs,
    # same lifecycle note as semantic_dedup).  The persist sits AFTER
    # the occupancy-cap filter so the per-fp count window and the cap
    # broadcast also run once — persisting the raw winnow output made
    # every self-join leg re-run Window + cap crossJoin over the cache
    # (round 10; the q245 plan carried that subtree three times).
    fps = winnowed_fingerprints(df, id_col, text_col, n, w)
    if fp_cap is not None:
        from pyspark.sql.window import Window

        wdw = Window.partitionBy("fp")
        fps = fps.withColumn("ndocs", F.count(F.lit(1)).over(wdw))
        if capdf is not None:
            fps = (fps.crossJoin(F.broadcast(capdf))
                   .where(F.col("ndocs") <= F.col("__cap"))
                   .drop("ndocs", "__cap"))
        else:
            fps = fps.where(F.col("ndocs") <= fp_cap).drop("ndocs")
    fps = fps.persist()
    cands = (fps.select(F.col(id_col).alias("a_id"), "fp")
             .join(fps.select(F.col(id_col).alias("b_id"), "fp"), "fp")
             .where(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id").distinct())
    sh = (ensure_parallelism(df)
          .withColumn("toks", tokens_expr(text_col))
          .select(F.col(id_col), shingles_expr(n).alias("sh"))
          .persist())
    a = sh.select(F.col(id_col).alias("a_id"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b_id"), F.col("sh").alias("sh_b"))
    c_ab = F.expr(_CONTAIN.format(side="a"))
    c_ba = F.expr(_CONTAIN.format(side="b"))
    return (cands.join(a, "a_id").join(b, "b_id")
            .select("a_id", "b_id", c_ab.alias("c_a_in_b"),
                    c_ba.alias("c_b_in_a"))
            .where(F.greatest("c_a_in_b", "c_b_in_a") >= min_containment))


def containment_pairs_sql(table: str, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 5, w: int = 4,
                          min_containment: float = 0.5,
                          fp_cap: int | str | None = "auto") -> str:
    """DuckDB twin of :func:`containment_pairs` — including the
    fingerprint-occupancy cap: ``"auto"`` (default, mirroring the
    operator) derives :func:`derive_fp_cap` from the same COUNT(*) the
    Spark side aggregates, an int pins it, None uncaps."""
    fps0 = winnowed_fingerprints_sql(table, id_col, text_col, n, w)
    if fp_cap == "auto":
        fp_cap = _fp_cap_sql_expr(f"SELECT COUNT(*) FROM {table}")
    cap_filter = (
        f""",
capped AS (
  SELECT {id_col}, fp FROM (
    SELECT {id_col}, fp, COUNT(*) OVER (PARTITION BY fp) AS __ndocs
    FROM fps0)
  WHERE __ndocs <= ({fp_cap})
)""" if fp_cap is not None else f""",
capped AS (SELECT {id_col}, fp FROM fps0)""")
    duck_c = ("floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) "
              "/ len({side}.sh) * 1000000) / 1000000")
    c_ab, c_ba = duck_c.format(side="a"), duck_c.format(side="b")
    return f"""
WITH fps0 AS ({fps0}){cap_filter},
fps AS (SELECT * FROM capped),
cands AS (
  SELECT DISTINCT x.{id_col} AS a_id, y.{id_col} AS b_id
  FROM fps x JOIN fps y ON x.fp = y.fp AND x.{id_col} < y.{id_col}
),
sh AS (
  SELECT {id_col}, {shingles_sql(n)} AS sh
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table})
)
SELECT c.a_id, c.b_id, {c_ab} AS c_a_in_b, {c_ba} AS c_b_in_a
FROM cands c
JOIN sh a ON a.{id_col} = c.a_id
JOIN sh b ON b.{id_col} = c.b_id
WHERE greatest({c_ab}, {c_ba}) >= {min_containment}
"""


def containment_pairs_between(new_df: DataFrame, corpus_df: DataFrame,
                              id_col: str = "doc_id", text_col: str = "text",
                              n: int = 5, w: int = 4,
                              min_containment: float = 0.5,
                              fp_cap: int | str | None = "auto",
                              corpus_fps: DataFrame | None = None) -> DataFrame:
    """Incremental containment intake: near-subset pairs BETWEEN a new
    batch and the corpus — (new_id, corpus_id, c_new_in_corpus,
    c_corpus_in_new), keeping pairs where EITHER direction >=
    ``min_containment``; the O(batch) nightly form of
    :func:`containment_pairs` (quote-inclusion / excerpt geometry
    across the batch/corpus boundary: "is tonight's article already
    embedded in something we have, or does it contain something we
    have?").

    Candidates come from shared winnowed fingerprints exactly as in
    the full-corpus form (the >= n + w - 1-token guarantee carries
    over since both sides select with the same content-defined rule),
    but joined batch-fps x corpus-fps instead of self-joined.  Pass
    ``corpus_fps`` (the persisted output of
    :func:`winnowed_fingerprints` over the corpus) to skip re-mining
    the corpus — the ledger pattern of winnowed_duplicates_between.
    The verify stage then re-shingles ONLY the docs that appear in a
    candidate pair (a semi-join pushes the shingle work to the
    candidate subset — the full-corpus form must shingle everything,
    the intake form shingles O(candidates)).

    ``fp_cap`` drops fingerprints whose COMBINED doc count across the
    two sides exceeds the cap — same occupancy control, counted over
    the union so a fingerprint just under the cap on each side cannot
    still propose cap² cross pairs.  The default ``"auto"`` derives
    the cap from the combined doc count as a broadcast one-row
    aggregate inside the plan (:func:`derive_fp_cap` semantics; no
    eager job — int to pin, None for explicitly unbounded) — when
    ``corpus_fps`` is supplied, the corpus term comes from the
    LEDGER's row count instead (one slim metadata-cheap scan; a
    parquet-backed ledger answers from footers), never the corpus
    itself: fingerprint rows ≥ doc count, and log2 flattens the
    overshoot to a slightly LOOSER cap — erring toward recall — so
    the O(batch) intake contract survives the derived default (the
    SQL twin, which has no ledger, derives from doc counts; see its
    docstring for when the two caps coincide).  Ids
    must be disjoint across sides.  Both directions floor-quantized
    at 6 dp as in :func:`containment_pairs`."""
    from dbms_spark.llm.text import tokens_expr
    from dbms_spark.plans.parallelism import ensure_parallelism

    capdf = None
    if fp_cap == "auto":
        side = corpus_fps if corpus_fps is not None else corpus_df
        capdf = (new_df.agg(F.count(F.lit(1)).alias("__a"))
                 .crossJoin(side.agg(F.count(F.lit(1)).alias("__b")))
                 .select(_fp_cap_col(F.col("__a") + F.col("__b"))
                         .alias("__cap"))
                 .persist())   # 1 row; the occ broadcast feeds 2 anti-joins
    bf = winnowed_fingerprints(new_df, id_col, text_col, n, w).persist()
    cf = (corpus_fps if corpus_fps is not None
          else winnowed_fingerprints(corpus_df, id_col, text_col, n, w)
          ).persist()
    if fp_cap is not None:
        occ = (bf.select("fp").unionByName(cf.select("fp"))
               .groupBy("fp").agg(F.count(F.lit(1)).alias("_nd")))
        if capdf is not None:
            occ = (occ.crossJoin(F.broadcast(capdf))
                   .where(F.col("_nd") > F.col("__cap")).select("fp"))
        else:
            occ = occ.where(F.col("_nd") > fp_cap).select("fp")
        bf = bf.join(F.broadcast(occ), "fp", "left_anti")
        cf = cf.join(F.broadcast(occ), "fp", "left_anti")
    cands = (bf.select(F.col(id_col).alias("new_id"), "fp")
             .join(cf.select(F.col(id_col).alias("corpus_id"), "fp"), "fp")
             .select("new_id", "corpus_id").distinct()
             .persist())

    def _sh(df: DataFrame, keep: DataFrame, out_id: str,
            sh_col: str) -> DataFrame:
        return (ensure_parallelism(df)
                .join(keep.withColumnRenamed(out_id, id_col).distinct(),
                      id_col, "left_semi")
                .withColumn("toks", tokens_expr(text_col))
                .select(F.col(id_col).alias(out_id),
                        shingles_expr(n).alias(sh_col)))

    a = _sh(new_df, cands.select("new_id"), "new_id", "sh_a")
    b = _sh(corpus_df, cands.select("corpus_id"), "corpus_id", "sh_b")
    c_nc = F.expr(_CONTAIN.format(side="a")).alias("c_new_in_corpus")
    c_cn = F.expr(_CONTAIN.format(side="b")).alias("c_corpus_in_new")
    return (cands.join(a, "new_id").join(b, "corpus_id")
            .select("new_id", "corpus_id", c_nc, c_cn)
            .where(F.greatest("c_new_in_corpus", "c_corpus_in_new")
                   >= min_containment))


def containment_pairs_between_sql(new_sql: str, corpus_sql: str,
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  n: int = 5, w: int = 4,
                                  min_containment: float = 0.5,
                                  fp_cap: int | str | None = "auto") -> str:
    """DuckDB twin of :func:`containment_pairs_between` — including
    the COMBINED-occupancy cap.  ``"auto"`` derives the cap from the
    two sides' doc counts; note the operator derives from the LEDGER's
    fingerprint rows instead when ``corpus_fps`` is supplied (a
    slightly LOOSER cap — identical results whenever no fingerprint's
    occupancy falls between the two caps, which the floor guarantees
    at gate scale)."""
    bf = winnowed_fingerprints_sql(f"({new_sql})", id_col, text_col, n, w)
    cf = winnowed_fingerprints_sql(f"({corpus_sql})", id_col, text_col, n, w)
    if fp_cap == "auto":
        fp_cap = _fp_cap_sql_expr(
            f"SELECT (SELECT COUNT(*) FROM ({new_sql}))"
            f" + (SELECT COUNT(*) FROM ({corpus_sql}))")
    hot = (f"""
hot AS (
  SELECT fp FROM (
    SELECT fp, COUNT(*) AS _nd
    FROM (SELECT fp FROM bf0 UNION ALL SELECT fp FROM cf0)
    GROUP BY fp)
  WHERE _nd > ({fp_cap})
),
bf AS (SELECT * FROM bf0 WHERE fp NOT IN (SELECT fp FROM hot)),
cf AS (SELECT * FROM cf0 WHERE fp NOT IN (SELECT fp FROM hot)),"""
           if fp_cap is not None else """
bf AS (SELECT * FROM bf0),
cf AS (SELECT * FROM cf0),""")
    duck_c = ("floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) "
              "/ len({side}.sh) * 1000000) / 1000000")
    c_nc, c_cn = duck_c.format(side="a"), duck_c.format(side="b")
    return f"""
WITH bf0 AS ({bf}),
cf0 AS ({cf}),{hot}
cands AS (
  SELECT DISTINCT bf.{id_col} AS new_id, cf.{id_col} AS corpus_id
  FROM bf JOIN cf ON bf.fp = cf.fp
),
sh_new AS (
  SELECT {id_col}, {shingles_sql(n)} AS sh
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM ({new_sql}))
),
sh_corpus AS (
  SELECT {id_col}, {shingles_sql(n)} AS sh
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM ({corpus_sql}))
)
SELECT c.new_id, c.corpus_id,
       {c_nc} AS c_new_in_corpus, {c_cn} AS c_corpus_in_new
FROM cands c
JOIN sh_new a ON a.{id_col} = c.new_id
JOIN sh_corpus b ON b.{id_col} = c.corpus_id
WHERE greatest({c_nc}, {c_cn}) >= {min_containment}
"""


def drop_contained(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 5, w: int = 4,
                   min_containment: float = 0.9,
                   fp_cap: int | str | None = "auto") -> DataFrame:
    """The actionable form of :func:`containment_pairs`: remove docs
    whose shingles are >= ``min_containment`` contained in ANOTHER doc
    (the embedded copy adds no content the host lacks), keeping the
    host.  Mutually-contained pairs (near-identical docs) keep the
    smaller id, matching every other canonical-selection policy in
    this module.  Greedy pairwise policy: a doc is dropped if any pair
    says so, even if its host is itself dropped by a third doc —
    content is still covered at ~threshold² containment by the
    transitive host; document-exact retention needs the full group
    structure (dedup_groups) and is rarely worth it.  Returns the
    kept rows of ``df`` unchanged.
    """
    pairs = containment_pairs(df, id_col, text_col, n, w,
                              min_containment=0.0, fp_cap=fp_cap)
    thr = float(min_containment)
    both = (F.col("c_a_in_b") >= thr) & (F.col("c_b_in_a") >= thr)
    drops = (pairs.select(
        F.when(both, F.greatest("a_id", "b_id"))
        .when(F.col("c_a_in_b") >= thr, F.col("a_id"))
        .when(F.col("c_b_in_a") >= thr, F.col("b_id"))
        .alias("drop_id"))
        .where(F.col("drop_id").isNotNull()).distinct())
    return df.join(drops.withColumnRenamed("drop_id", id_col),
                   id_col, "left_anti")


def drop_contained_sql(table: str, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 5, w: int = 4,
                       min_containment: float = 0.9,
                       fp_cap: int | str | None = "auto") -> str:
    """DuckDB twin of :func:`drop_contained` — same derived-cap
    contract as :func:`containment_pairs_sql`."""
    thr = float(min_containment)
    pairs = containment_pairs_sql(table, id_col, text_col, n, w,
                                  min_containment=0.0, fp_cap=fp_cap)
    return f"""
WITH pairs AS ({pairs}),
drops AS (
  SELECT DISTINCT CASE
    WHEN c_a_in_b >= {thr} AND c_b_in_a >= {thr} THEN greatest(a_id, b_id)
    WHEN c_a_in_b >= {thr} THEN a_id
    WHEN c_b_in_a >= {thr} THEN b_id END AS drop_id
  FROM pairs
  WHERE c_a_in_b >= {thr} OR c_b_in_a >= {thr}
)
SELECT t.* FROM {table} t
WHERE t.{id_col} NOT IN (SELECT drop_id FROM drops)
"""


def dedup_keep_best(df: DataFrame, score_col: str, id_col: str = "doc_id",
                    text_col: str = "text", min_sim: float = 0.7,
                    bucket_cap: int | None = None) -> DataFrame:
    """Quality-aware canonical selection: the dedup pipeline (LSH
    proposes, exact Jaccard verifies, label propagation groups) with
    the keep policy "highest ``score_col`` wins, ties to the smaller
    id" instead of min-id — when near-duplicates differ (one crawl
    captured the full article, the mirror truncated it), min-id keeps
    whichever arrived first; a curation pipeline wants the BEST copy
    (longest, highest quality score, newest), and the winner choice
    is one window over the grouped members, nothing else changes.

    Scale shape identical to ``engine.dedup_pipeline`` (every stage
    bucketed/bounded); the extra work is one join of the duplicate
    MEMBERS (not the corpus) against their scores plus a per-group
    window over near-clique-sized groups.
    """
    from pyspark.sql.window import Window

    if bucket_cap is not None:
        sigs = minhash_signatures(df, id_col, text_col)
        pairs = lsh_candidate_pairs_capped(sigs, id_col, bucket_cap=bucket_cap)
    else:
        sigs = minhash_signatures(df, id_col, text_col, keep_shingles=True)
        pairs = lsh_candidate_pairs(sigs, id_col, carry=["sh"])
    verified = jaccard_on_pairs(df, pairs, id_col, text_col, min_sim=min_sim)
    groups = dedup_groups(verified)   # (doc_id, group_id)
    scored = groups.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("_s")),
        "doc_id")
    w = Window.partitionBy("group_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    drops = (scored.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") > 1)
             .select(F.col("doc_id").alias(id_col)))
    return df.join(drops, id_col, "left_anti")


def dedup_keep_best_sql(table: str, score_expr: str, id_col: str = "doc_id",
                        text_col: str = "text", min_sim: float = 0.7) -> str:
    """DuckDB twin of :func:`dedup_keep_best` (uncapped miner);
    ``score_expr`` is evaluated against ``table``'s columns."""
    verified = jaccard_on_lsh_sql(table, id_col, text_col, min_sim=min_sim)
    groups = dedup_groups_sql(f"SELECT a_id, b_id FROM ({verified})")
    return f"""
WITH g AS ({groups}),
scored AS (
  SELECT g.doc_id, g.group_id, {score_expr} AS _s
  FROM g JOIN {table} t ON t.{id_col} = g.doc_id
),
drops AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (
      PARTITION BY group_id ORDER BY _s DESC, doc_id ASC) AS rn
    FROM scored)
  WHERE rn > 1
)
SELECT t.* FROM {table} t
WHERE t.{id_col} NOT IN (SELECT doc_id FROM drops)
"""
