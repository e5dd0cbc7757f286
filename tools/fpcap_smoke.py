#!/usr/bin/env python3
"""Hot-fingerprint smoke for the containment family's derived fp_cap
(round-9 judge ask #1).

    python tools/fpcap_smoke.py [n_docs]

Synthesizes ``n_docs`` documents that ALL open with the same
boilerplate sentence — one winnowed fingerprint shared corpus-wide,
the occupancy hazard the cap exists for — plus one true subset pair
(doc 0 embedded in doc 1) that shares only NON-boilerplate
fingerprints.  Prints the candidate pair volume the fingerprint
self-join would propose uncapped vs under :func:`derive_fp_cap`'s
auto default, and the wall time + result of the capped run.  The
uncapped volume grows as n²/2 per boilerplate fingerprint (6.2·10⁸
at 2·10⁴ docs); the capped run must still recall the true pair.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402
from dbms_spark.llm.dedup import (containment_pairs, derive_fp_cap,  # noqa: E402
                                  winnowed_fingerprints)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("fpcap_smoke")
    boiler = " ".join(f"tok{i}" for i in range(12))
    docs = spark.range(2, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(boiler + " "),
                 F.concat_ws(" ", *[F.concat(F.lit(f"w{j}u"), F.col("id"))
                                    for j in range(10)])).alias("text"))
    extra = spark.createDataFrame(
        [(0, "special alpha beta gamma delta epsilon zeta eta"),
         (1, "special alpha beta gamma delta epsilon zeta eta"
             " plus a much longer host document body here")],
        "doc_id long, text string")
    docs = docs.unionByName(extra).persist()
    ndocs = docs.count()
    cap = derive_fp_cap(ndocs)
    fps = winnowed_fingerprints(docs).persist()
    fps.count()
    occ = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    unc = occ.agg(F.sum(F.expr("c * (c - 1) / 2"))).collect()[0][0]
    capd = (occ.filter(F.col("c") <= cap)
            .agg(F.sum(F.expr("c * (c - 1) / 2"))).collect()[0][0])
    print(json.dumps({"docs": ndocs, "auto_cap": cap,
                      "proposed_pairs_uncapped": int(unc),
                      "proposed_pairs_capped": int(capd or 0)}), flush=True)
    t0 = time.perf_counter()
    n_pairs = containment_pairs(docs, min_containment=0.9).count()
    print(json.dumps({"case": "containment_auto_cap",
                      "sec": round(time.perf_counter() - t0, 2),
                      "pairs": n_pairs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
