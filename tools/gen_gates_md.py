#!/usr/bin/env python3
"""Generate docs/GATES.md — an index of every registered differential
gate with its description scraped from the comment banner above each
registration in dbms_spark/queries.py."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    src = open(os.path.join(REPO, "dbms_spark", "queries.py")).read()
    blocks = re.findall(r"^# (q\d+[^\n]*(?:\n# [^\n]*)*)", src, re.M)
    desc_by_q: dict[str, str] = {}
    for b in blocks:
        text = " ".join(l.lstrip("# ").strip() for l in b.split("\n"))
        text = re.sub(r"-{5,}", "", text).strip()
        # heads: "q12 —", "q12/q13 —", "q181-q184 —" (range expands)
        m = re.match(r"(q\d+(?:/q\d+)*(?:-q\d+)?)\s*[—-]\s*(.*)", text)
        if m:
            head, desc = m.group(1), m.group(2).strip()
            qs: list[str] = []
            for part in head.split("/"):
                if "-q" in part:
                    lo, hi = (int(x[1:]) for x in part.split("-"))
                    qs += [f"q{n:02d}" if n < 100 else f"q{n}"
                           for n in range(lo, hi + 1)]
                else:
                    qs.append(part)
            for q in qs:
                desc_by_q[q] = desc
    regs = re.findall(r'@register\("(q\d+)_(\w+)"', src)
    lines = [
        f"# GATES — the {len(regs)}-query differential registry",
        "",
        "Every entry runs as BOTH a Spark plan and a DuckDB oracle on the",
        "same parquet; the driver hash-compares results at sf0.01",
        "(`__spark_entry__.queries()` / `oracle_sql()`).  Generated from",
        "`dbms_spark/queries.py` by `python tools/gen_gates_md.py`.",
        "",
        "| gate | description |",
        "|---|---|",
    ]
    for num, name in regs:
        d = desc_by_q.get(num, name.replace("_", " ")).replace("|", "\\|")
        if len(d) > 240:
            d = d[:237] + "..."
        lines.append(f"| {num}_{name} | {d} |")
    out = os.path.join(REPO, "docs", "GATES.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"{len(regs)} gates -> {out}")


if __name__ == "__main__":
    main()
