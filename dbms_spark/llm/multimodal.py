"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
functions over ``mapInPandas``.

The decode/feature kernels are STUBBED (this container ships no
image/audio libraries): ``decode_image_stub`` produces a deterministic
fake decode so the Spark-side plumbing — schema contract, partition
flow, UDF signature, Arrow batch shape — is real and testable.  Swap
``_decode_one`` for a PIL/libav call in production; nothing else
changes.

Scale notes: mapInPandas streams Arrow batches per partition — no
driver collection; binary payloads stay off the driver.  Partition
sizing should target batches of a few hundred MB of payload
(``spark.sql.files.maxPartitionBytes`` governs the scan side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset row (binary payload + typed metadata)
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("modality", T.StringType()),      # image | audio | video
    T.StructField("mime_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta_json", T.StringType()),
])

DECODED_SCHEMA = (
    "asset_id long, modality string, n_bytes long, "
    "width int, height int, n_frames int, sha_prefix string"
)


def synthesize_assets(df: DataFrame, id_col: str, payload_from: str) -> DataFrame:
    """Build an asset table from any string column (deterministic stand-
    in for real binary ingestion): payload = utf-8 bytes of the text."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video").alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode(F.col(payload_from), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.length(payload_from).alias("orig_len"))).alias("meta_json"),
    )


def _decode_one(payload: bytes, modality: str) -> dict:
    """STUB decode: deterministic fake dimensions derived from the
    payload hash.  Production: PIL.Image.open / soundfile / pyav here.
    Raises on empty payload like a real decoder would."""
    import hashlib

    if payload is None or len(payload) == 0:
        raise ValueError("empty payload — cannot decode")
    h = hashlib.md5(payload).hexdigest()
    w = int(h[:4], 16) % 1920 + 1
    ht = int(h[4:8], 16) % 1080 + 1
    frames = (int(h[8:12], 16) % 240 + 1) if modality == "video" else 1
    return {"n_bytes": len(payload), "width": w, "height": ht,
            "n_frames": frames, "sha_prefix": h[:8]}


def decode_assets(assets: DataFrame, on_error: str = "skip") -> DataFrame:
    """Arrow-batched decode over mapInPandas.  ``on_error``: 'skip'
    drops undecodable rows (corrupt files are routine at corpus scale);
    'fail' re-raises."""

    from dbms_spark.plans.parallelism import ensure_parallelism

    assets = ensure_parallelism(assets)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over columns, not iterrows — ~10x less per-row overhead
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                try:
                    d = _decode_one(payload, modality)
                except Exception:
                    if on_error == "fail":
                        raise
                    continue
                out.append({"asset_id": aid, "modality": modality, **d})
            yield pd.DataFrame(
                out,
                columns=["asset_id", "modality", "n_bytes", "width", "height",
                         "n_frames", "sha_prefix"],
            )

    return assets.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_images_stub(decoded: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning (pure arithmetic — the actual pixel work lives in
    the decode stub's production swap): target dims preserving aspect
    ratio, capped at max_side."""
    scale = F.expr(
        f"CASE WHEN greatest(width, height) <= {max_side} THEN 1.0 "
        f"ELSE CAST({max_side} AS DOUBLE) / greatest(width, height) END"
    )
    return decoded.withColumn("resize_scale", scale).withColumn(
        "target_width", F.expr("CAST(floor(width * resize_scale) AS INT)")
    ).withColumn(
        "target_height", F.expr("CAST(floor(height * resize_scale) AS INT)")
    )


def extract_features_stub(assets: DataFrame, dims: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``: one
    ``(asset_id, dim, value)`` row per feature component — the
    embedding-extraction stage of a multimodal pipeline (production
    swap: a vision/audio encoder producing real vectors; the Spark
    contract — schema, batching, partition flow — is identical).

    The stub kernel is md5-derived and therefore has an exact SQL twin
    (:func:`extract_features_stub_sql`): the differential gate then
    checks the Arrow/pandas plumbing itself, not just built-in
    expressions."""
    import hashlib

    from dbms_spark.plans.parallelism import ensure_parallelism

    assets = ensure_parallelism(assets)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for d in range(dims):
                    h = hashlib.md5(bytes(payload) + b"_" + str(d).encode()).hexdigest()
                    rows.append(
                        {"asset_id": aid, "dim": d, "value": int(h[:8], 16) % 2001 - 1000}
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "dim", "value"])

    return assets.mapInPandas(run, "asset_id long, dim int, value long")


def extract_features_stub_sql(table: str, id_col: str, text_col: str,
                              dims: int = 8) -> str:
    """DuckDB twin of :func:`extract_features_stub` over assets
    synthesized from a text column (payload = utf-8 bytes of text)."""
    comp = f"('0x' || substr(md5({text_col} || '_' || d), 1, 8))::BIGINT % 2001 - 1000"
    return f"""
SELECT {id_col} AS asset_id, CAST(d AS INTEGER) AS dim, CAST({comp} AS BIGINT) AS value
FROM {table}, range(0, {dims}) t(d)
"""


def frame_sample_plan(decoded: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling plan for video assets: which frame indices a
    downstream extractor would decode (sequence arithmetic, exploded)."""
    return (
        decoded.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(F.expr(f"sequence(0, n_frames - 1, {every_n})")).alias("frame_idx"),
        )
    )


def frame_sample_plan_sql(decoded_sql: str, every_n: int = 24) -> str:
    """DuckDB twin of :func:`frame_sample_plan` (range step = every_n;
    range() end is exclusive, matching sequence()'s inclusive end at
    step strides)."""
    return f"""
WITH d AS ({decoded_sql})
SELECT asset_id, unnest(range(0, n_frames, {every_n})) AS frame_idx
FROM d WHERE modality = 'video'
"""


# ---------------------------------------------------------------------------
# Geometry planning: pure-arithmetic tiling / segmentation plans over
# typed metadata — the part of multimodal preprocessing that is NOT a
# codec call, so it runs JVM-side and oracle-checks exactly.
# ---------------------------------------------------------------------------

def image_tile_plan(decoded: DataFrame, tile: int = 128) -> DataFrame:
    """Tile boxes covering each image on a ``tile``-px grid (edge
    tiles clamp to the image bounds) — the crop plan a vision
    preprocessor executes.  Pure arithmetic over (width, height)
    metadata: explodes ceil(w/t)*ceil(h/t) rows per image, all
    JVM-side."""
    n_x = F.ceil(F.col("width") / tile).cast("int")
    n_y = F.ceil(F.col("height") / tile).cast("int")
    return (
        decoded.filter("modality = 'image'")
        .select("asset_id", "width", "height",
                F.explode(F.sequence(F.lit(0), n_x - 1)).alias("tx"))
        .select("asset_id", "width", "height", "tx",
                F.explode(F.sequence(F.lit(0), n_y - 1)).alias("ty"))
        .select(
            "asset_id",
            F.col("tx").cast("int").alias("tx"), F.col("ty").cast("int").alias("ty"),
            (F.col("tx") * tile).cast("int").alias("x0"),
            (F.col("ty") * tile).cast("int").alias("y0"),
            F.least(F.col("tx") * tile + tile, F.col("width")).cast("int").alias("x1"),
            F.least(F.col("ty") * tile + tile, F.col("height")).cast("int").alias("y1"),
        )
    )


def image_tile_plan_sql(decoded_sql: str, tile: int = 128) -> str:
    return f"""
WITH d AS ({decoded_sql}),
tx AS (SELECT asset_id, width, height,
              unnest(range(CAST(ceil(CAST(width AS DOUBLE) / {tile}) AS BIGINT))) AS tx
       FROM d WHERE modality = 'image'),
txy AS (SELECT asset_id, width, height, tx,
               unnest(range(CAST(ceil(CAST(height AS DOUBLE) / {tile}) AS BIGINT))) AS ty
        FROM tx)
SELECT asset_id, CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty,
       CAST(tx * {tile} AS INT) AS x0, CAST(ty * {tile} AS INT) AS y0,
       CAST(least(tx * {tile} + {tile}, width) AS INT) AS x1,
       CAST(least(ty * {tile} + {tile}, height) AS INT) AS y1
FROM txy
"""


def audio_segment_plan(assets_meta: DataFrame, window_ms: int = 30000,
                       stride_ms: int = 20000) -> DataFrame:
    """Overlapping transcription windows per audio asset from a
    ``duration_ms`` metadata column: the segment plan an ASR stage
    executes.  Segment k covers [k*stride, min(k*stride + window,
    duration)); the last window starts strictly inside the clip."""
    n_seg = F.greatest(
        F.ceil((F.col("duration_ms") - window_ms) / stride_ms).cast("long") + 1,
        F.lit(1).cast("long"))
    return (
        assets_meta.filter("modality = 'audio'")
        .select("asset_id", "duration_ms",
                F.explode(F.sequence(F.lit(0).cast("long"), n_seg - 1)).alias("seg"))
        .select(
            "asset_id", F.col("seg").cast("bigint").alias("seg"),
            (F.col("seg") * stride_ms).cast("bigint").alias("start_ms"),
            F.least(F.col("seg") * stride_ms + window_ms, F.col("duration_ms"))
            .cast("bigint").alias("end_ms"),
        )
    )


def audio_segment_plan_sql(meta_sql: str, window_ms: int = 30000,
                           stride_ms: int = 20000) -> str:
    return f"""
WITH d AS ({meta_sql}),
s AS (SELECT asset_id, duration_ms,
             unnest(range(greatest(
               CAST(ceil(CAST(duration_ms - {window_ms} AS DOUBLE) / {stride_ms}) AS BIGINT) + 1,
               1))) AS seg
      FROM d WHERE modality = 'audio')
SELECT asset_id, CAST(seg AS BIGINT) AS seg,
       CAST(seg * {stride_ms} AS BIGINT) AS start_ms,
       CAST(least(seg * {stride_ms} + {window_ms}, duration_ms) AS BIGINT) AS end_ms
FROM s
"""


# ---------------------------------------------------------------------------
# Perceptual hash (dHash) — image near-dup dedup plumbing
# ---------------------------------------------------------------------------

def dhash_stub(assets: DataFrame, id_col: str = "asset_id",
               payload_col: str = "payload") -> DataFrame:
    """64-bit difference hash (dHash) per asset as two 32-bit halves
    (simhash_hi, simhash_lo) — THE standard perceptual image-dedup
    key: sample an 8x9 grayscale grid, bit k = grid[i][j] > grid[i][j+1];
    near-identical images differ in a few bits, so the downstream
    Hamming-ball search is :func:`dbms_spark.llm.dedup.
    simhash_hamming_pairs` unchanged (the output column names are its
    input contract — one banding/verify implementation serves text
    SimHash and image dHash alike).

    STUB pixel source, REAL plumbing: the container has no image
    codecs, so the "grayscale grid" is 72 bytes sampled at fixed
    relative offsets of the raw payload (position 1 + k*n/72 —
    deterministic integer math, cross-engine identical).  Production
    swap: decode the payload (PIL) to an 8x9 grayscale thumbnail and
    feed ITS bytes — every expression below is unchanged.  Unlike the
    mapInPandas decode stub this is a pure map-side codegen
    expression: byte extraction via substring/hex over the binary
    column, zero Python.  Empty/NULL payloads are dropped (nothing to
    hash).
    """
    n = f"length({payload_col})"
    # slice the ONE byte first, then hex it (the dhash_pgm fix, round
    # 10, guide §4): hex(substring(payload, p, 1)) ≡
    # substring(hex(payload), 2p-1, 2) byte-for-byte, but HOF bodies
    # are interpreted per element and loop-invariant subexpressions
    # are not hoisted, so the hex-the-whole-payload form re-hexed the
    # full binary 72× per row.  (DuckDB's substring rejects BLOBs, so
    # the SQL twin keeps whole-payload hex-string sampling — the
    # VALUES are identical either way.)
    # flat array(...) constructor, not transform(sequence(0, 71), ...):
    # k is a literal per element, so the whole projection stays in
    # whole-stage codegen instead of 72 interpreted lambda evaluations
    samples = "array(" + ", ".join(
        f"cast(conv(hex(substring({payload_col}, "
        f"cast(1 + ({k} * cast({n} as bigint)) div 72 as int), 1)), "
        f"16, 10) as bigint)" for k in range(72)) + ")"
    return (assets
            .where(F.expr(f"{payload_col} is not null and {n} > 0"))
            .select(F.col(id_col),
                    F.expr(samples).alias("s"))
            .select(id_col,
                    F.expr(_dhash_half_expr(0, 31)).alias("simhash_hi"),
                    F.expr(_dhash_half_expr(32, 63)).alias("simhash_lo")))


def _dhash_half_expr(lo: int, hi: int) -> str:
    """One 32-bit dHash half over the sampled grid array ``s`` as a
    FLAT shiftleft-sum: bit b compares grid[i][j] vs grid[i][j+1]
    (index = (b div 8) * 9 + b % 8).  The former ``aggregate(sequence
    (lo, hi), ...)`` fold computes the identical long sum, but
    higher-order-function bodies never enter whole-stage codegen and
    evaluate interpreted per element — 64 interpreted lambda
    evaluations per row across the two halves (the round-9 ANN-unroll
    discovery; round 10, guide §4).  Long addition over the same
    terms is associative, and a NULL sample yields the same 0 bit
    through CASE either way, so the value is bit-identical."""
    def bit(b: int) -> str:
        i = (b // 8) * 9 + b % 8
        return f"(case when s[{i}] > s[{i + 1}] then 1L else 0L end)"

    return " + ".join(
        f"shiftleft({bit(b)}, {b - lo})" for b in range(lo, hi + 1))


#: binary PGM (P5) header as HEX pairs: 'P5'=5035, '\n'=0A, digits
#: 3[0-9], ' '=20 — "P5\n<width> <height>\n<maxval>\n".  The strict
#: single-whitespace form every thumbnailer writes; comment lines
#: (#...) are out of scope and such rows are dropped, not mis-parsed.
_PGM_HDR_RE = r"^50350A((?:3[0-9])+)20((?:3[0-9])+)0A((?:3[0-9])+)0A"


def dhash_pgm(assets: DataFrame, id_col: str = "asset_id",
              payload_col: str = "payload") -> DataFrame:
    """64-bit dHash over REAL DECODED PIXELS of a binary PGM (P5)
    payload — the production form of :func:`dhash_stub`, with the
    decode done in pure byte arithmetic (PGM is uncompressed grayscale
    with an ASCII header: no codec, which is exactly why pre-
    thumbnailing corpora to PGM is the standard trick for codec-less
    compute clusters).  Same output contract (asset_id, simhash_hi,
    simhash_lo) feeding the SAME Hamming banding as text SimHash.

    Decode, all map-side codegen, zero Python:
    - header parse: the first 24 payload bytes hex-encoded, one
      anchored regex over ~48 chars — 'P5\\n{w} {h}\\n{maxval}\\n'
      as hex pairs; digit pairs 3X collapse to digits via
      regexp_replace('3(.)', '$1') and cast.
    - 8x9 grid: cell (gy, gx) samples the pixel at row (gy*h) div 8,
      col (gx*w) div 9 — nearest-pixel thumbnail (production dHash
      often block-averages; sampling keeps the expression integer-
      exact cross-engine and preserves the locality property: one
      changed pixel lands in at most one cell, each cell feeds at
      most 2 comparison bits, so a 1-px edit flips <= 2 bits —
      pinned in test_llm).
    - bit k = grid[gy][gx] > grid[gy][gx+1], folded into two 32-bit
      halves exactly as the stub.

    Rows whose payload is not strict P5 (wrong magic, comment lines,
    maxval > 255, truncated pixels) are DROPPED — a mis-parse must
    not hash garbage into the dedup index.  16-bit PGMs (maxval >
    255) are rejected, not down-converted."""
    pre = f"substring(hex(substring({payload_col}, 1, 24)), 1, 48)"
    grp = f"regexp_extract({pre}, '{_PGM_HDR_RE}', {{g}})"
    # try_cast: non-PGM rows regexp-extract to '' and the ANSI cast
    # would error the whole stage instead of yielding a filterable NULL
    num = f"try_cast(regexp_replace({grp}, '3(.)', '$1') as bigint)"
    parsed = (assets
              .where(F.expr(f"{payload_col} is not null"))
              .select(F.col(id_col), F.col(payload_col),
                      F.expr(num.format(g=1)).alias("w"),
                      F.expr(num.format(g=2)).alias("h"),
                      F.expr(num.format(g=3)).alias("mx"),
                      F.expr(
                          f"(length({grp.format(g=1)}) + length({grp.format(g=2)})"
                          f" + length({grp.format(g=3)})) div 2 + 6")
                      .alias("off"))
              .where("w is not null and w > 0 and h is not null and h > 0"
                     " and mx between 1 and 255"
                     f" and length({payload_col}) >= off + w * h"))
    # slice the ONE byte first, then hex it: hex(substring(payload,
    # p, 1)) ≡ substring(hex(payload), 2p-1, 2) byte-for-byte, but
    # the former hexes 1 byte per grid cell where the latter re-hexed
    # the WHOLE payload inside the 72-way lambda (HOF bodies are
    # interpreted per element and loop-invariant subexpressions are
    # not hoisted — round 10, guide §4/§1.2: q261 ~2.0 → ~0.9 s)
    samples = (
        f"transform(sequence(0, 71), k -> cast(conv(hex(substring("
        f"{payload_col}, cast(off + (((k div 9) * h) div 8) * w"
        f" + (((k % 9) * w) div 9) + 1 as int), 1)), 16, 10) as bigint))")
    # NOTE (round 10, measured): unlike dhash_stub, the pgm variant
    # REGRESSED with the unrolled grid/halves (q261 1.21 → 1.68 s,
    # q262 1.83 → 2.79 s same-window A/B) — its sampling expression
    # depends on the regexp-derived off/h/w columns, and the flat
    # 72-element projection re-evaluates them per element after
    # projection collapse where the HOF form reads them once per row.
    # The interpreted fold is the cheaper form here; keep it.
    bit = ("case when s[(b div 8) * 9 + b % 8] "
           "> s[(b div 8) * 9 + b % 8 + 1] then 1L else 0L end")
    half = (f"aggregate(sequence({{lo}}, {{hi}}), 0L, "
            f"(acc, b) -> acc + shiftleft({bit}, b - {{lo}}))")
    return (parsed.select(id_col, F.expr(samples).alias("s"))
            .select(id_col,
                    F.expr(half.format(lo=0, hi=31)).alias("simhash_hi"),
                    F.expr(half.format(lo=32, hi=63)).alias("simhash_lo")))


def dhash_pgm_sql(assets_sql: str, id_col: str = "asset_id",
                  payload_col: str = "payload") -> str:
    """DuckDB twin of :func:`dhash_pgm` (hex-string byte access —
    DuckDB substring rejects BLOBs; RE2 backrefs spelled \\1)."""
    pre = f"substring(hex({payload_col}), 1, 48)"
    grp = f"regexp_extract({pre}, '{_PGM_HDR_RE}', {{g}})"
    # TRY_CAST: non-PGM rows regexp-extract to '' and DuckDB's strict
    # CAST would error where Spark's non-ANSI cast yields NULL
    num = f"TRY_CAST(regexp_replace({grp}, '3(.)', '\\1', 'g') AS BIGINT)"
    samples = (
        f"[('0x' || substring(hex({payload_col}), "
        f"CAST(2 * (off + (((k // 9) * h) // 8) * w"
        f" + (((k % 9) * w) // 9) + 1) - 1 AS INT), 2))::BIGINT "
        f"for k in range(0, 72)]")
    bit = ("CASE WHEN s[(b // 8) * 9 + b % 8 + 1] "
           "> s[(b // 8) * 9 + b % 8 + 2] THEN 1::BIGINT ELSE 0::BIGINT END")
    half_hi = f"list_sum([({bit}) << b for b in range(0, 32)])"
    half_lo = f"list_sum([({bit}) << (b - 32) for b in range(32, 64)])"
    return f"""
WITH src AS ({assets_sql}),
parsed AS (
  SELECT {id_col}, {payload_col},
         {num.format(g=1)} AS w, {num.format(g=2)} AS h,
         {num.format(g=3)} AS mx,
         (length({grp.format(g=1)}) + length({grp.format(g=2)})
          + length({grp.format(g=3)})) // 2 + 6 AS off
  FROM src WHERE {payload_col} IS NOT NULL
),
smp AS (
  SELECT {id_col}, {samples} AS s
  FROM parsed
  WHERE w IS NOT NULL AND w > 0 AND h IS NOT NULL AND h > 0
    AND mx BETWEEN 1 AND 255
    AND octet_length({payload_col}) >= off + w * h
)
SELECT {id_col}, CAST({half_hi} AS BIGINT) AS simhash_hi,
       CAST({half_lo} AS BIGINT) AS simhash_lo
FROM smp
"""


def dhash_stub_sql(assets_sql: str, id_col: str = "asset_id",
                   payload_col: str = "payload") -> str:
    """DuckDB twin of :func:`dhash_stub` (1-based list indexing like
    Spark's element_at; blob byte via substring+hex)."""
    n = f"octet_length({payload_col})"
    samples = (
        f"[('0x' || substring(hex({payload_col}), "
        f"CAST(2 * (1 + k * {n} // 72) - 1 AS INT), 2))::BIGINT "
        f"for k in range(0, 72)]"
    )
    bit = ("CASE WHEN s[(b // 8) * 9 + b % 8 + 1] "
           "> s[(b // 8) * 9 + b % 8 + 2] THEN 1::BIGINT ELSE 0::BIGINT END")
    half_lo = (f"list_sum([({bit}) << b for b in range(0, 32)])")
    half_hi = (f"list_sum([({bit}) << (b - 32) for b in range(32, 64)])")
    return f"""
WITH src AS ({assets_sql}),
smp AS (
  SELECT {id_col}, {samples} AS s
  FROM src WHERE {payload_col} IS NOT NULL AND {n} > 0
)
SELECT {id_col}, CAST({half_lo} AS BIGINT) AS simhash_hi,
       CAST({half_hi} AS BIGINT) AS simhash_lo
FROM smp
"""
