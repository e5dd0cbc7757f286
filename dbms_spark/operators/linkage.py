"""Record linkage (entity resolution): blocked fuzzy matching between
two record sets that lack a shared key — the MDM half of a migration
platform (the reference compares rows that share a PK; linkage is the
step when the key itself is unreliable, e.g. merging customer masters
from two systems).

Scale shape: candidate generation is a BLOCKED equi-join — records
only meet inside a block (coarse key: e.g. nation + name suffix), the
same O(block²)-not-O(n²) trick as LSH banding, with the block key as
the shuffle key.  Scoring is per-pair map-side arithmetic
(levenshtein + numeric deltas — both engines implement plain
Levenshtein identically, so the gate hash-matches).

Block-key choice is load-bearing: a key sharing a common constant
across the corpus (e.g. a name PREFIX over "Customer#…" data)
silently degenerates to one giant block per coarse group and the join
goes quadratic (docs/SCALE.md "Blocking-key degeneracy").  Before
shipping a block key, measure its candidate-pair count with the
per-key cardinality-product estimate (the q136_join_size_estimate
machinery): sum over blocks of |L_b|*|R_b| IS the exact pair count
the verify stage will score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    name_col: str,
    max_edit: int = 2,
    numeric_col: str | None = None,
    max_numeric_delta: int = 0,
    id_col: str = "id",
) -> DataFrame:
    """(left_id, right_id, edit_distance[, numeric_delta]) for record
    pairs in the same block whose names are within ``max_edit`` edits
    (and numeric values within ``max_numeric_delta``, if given).
    Self-pairs are NOT excluded — callers matching a set against
    itself should filter ``left_id < right_id``."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(id_col).alias(f"{tag}_id"),
                F.col(name_col).alias(f"{tag}_name"),
                *[F.col(c) for c in block_cols]]
        if numeric_col:
            cols.append(F.col(numeric_col).alias(f"{tag}_num"))
        return df.select(*cols)

    j = side(left, "l").join(side(right, "r"), block_cols)
    dist = F.levenshtein(F.col("l_name"), F.col("r_name"))
    out = j.select(
        "l_id", "r_id", dist.cast("bigint").alias("edit_distance"),
        *( [F.abs(F.col("l_num") - F.col("r_num")).cast("bigint").alias("numeric_delta")]
           if numeric_col else [] ),
    ).filter(F.col("edit_distance") <= max_edit)
    if numeric_col:
        out = out.filter(F.col("numeric_delta") <= max_numeric_delta)
    return out
