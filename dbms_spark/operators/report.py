"""Report sinks: fix-SQL files and the assessment report.

The reference renders repair SQL files per table (reference:
database/processor/data_compare_file.go:66-215) and an AWR-like HTML
compatibility report from go:embed templates (reference:
database/oracle/taskflow/assess_report.go:44-62, templates under
database/oracle/taskflow/template/).  Both are driver-side renders of
small collected results — the heavy lifting happened in the
aggregation plans that produced them.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame


def write_fix_sql_file(statements: list[str], path: str, table: str = "") -> str:
    """S12: land repair SQL as a file, one statement per line with a
    header comment (mirrors the reference's `dbms-ctl compare gen`
    output shape)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"-- fix SQL for {table or 'table'} ({len(statements)} statements)\n")
        for s in statements:
            f.write(s + "\n")
    return path


def _df_to_html_table(df: DataFrame, max_rows: int = 100) -> str:
    rows = df.limit(max_rows).collect()
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def render_assess_report(sections: dict[str, DataFrame], title: str = "Assessment report") -> str:
    """S12/A5: single-file HTML assessment report from the aggregation
    pack's DataFrames (each section is one small result)."""
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}"
        "td,th{border:1px solid #999;padding:4px 8px}th{background:#eee}</style>",
        f"</head><body><h1>{html.escape(title)}</h1>",
    ]
    for name, df in sections.items():
        parts.append(f"<h2>{html.escape(name)}</h2>")
        parts.append(_df_to_html_table(df))
    parts.append("</body></html>")
    return "".join(parts)


def write_assess_report(sections: dict[str, DataFrame], path: str,
                        title: str = "Assessment report") -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(render_assess_report(sections, title))
    return path
