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


# ---------------------------------------------------------------------------
# Reference-shaped AWR-style report (assess_report.go:44-62 renders
# header/body + overview/summary/detail/compatible/check/related from
# embedded templates; template/index.html & report_*.html define the
# section grammar).  Re-expressed as a Python renderer with the same
# SECTION SEMANTICS — overview key/values, one-row summary totals, an
# anchor navigation table, per-section comments, [Top] backlinks —
# with original styling (the structure is the behavioral parity, the
# CSS is not).
# ---------------------------------------------------------------------------

_REPORT_CSS = (
    "body{font:10pt/1.5 Arial,Helvetica,sans-serif;color:#1a1a1a;margin:2em}"
    "h1{font-size:15pt;color:#1f4e79;border-bottom:2px solid #1f4e79;"
    "padding-bottom:4px}"
    ".section-head{text-align:center;font-size:13pt;color:#1f4e79;"
    "font-weight:bold;margin-top:1.6em}"
    ".section-rule{width:460px;margin:2px auto 10px}"
    ".comment{font-size:8pt;color:#555;margin:2px 0 6px}"
    "table{border-collapse:collapse;width:90%;margin-bottom:8px}"
    "td,th{border:1px solid #9ab;padding:3px 8px;font-size:10pt}"
    "th{background:#1f66b0;color:#fff;text-align:left}"
    "td{background:#fffbe8}"
    ".nav td{text-align:center;background:#fff}"
    ".top{text-align:center;font-size:8pt;margin-bottom:8px}"
)


def _anchor(name: str) -> str:
    """HTML-id-safe anchor: lowercase alphanumerics and underscores
    only (attribute-injection-proof by construction — no escaping
    needed because nothing else survives)."""
    import re
    return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_") or "section"


def _section_heading(name: str, comment: str | None) -> str:
    a = _anchor(name)
    parts = [
        f"<a id='{a}'></a>",
        f"<div class='section-head'>{html.escape(name.upper())}</div>",
        "<hr class='section-rule'>",
    ]
    if comment:
        parts.append(f"<div class='comment'>{html.escape(comment)}</div>")
    return "".join(parts)


def render_assess_report_structured(
    overview: dict[str, str],
    summary: dict[str, int],
    sections: dict[str, tuple[str, DataFrame]],
    title: str = "MIGRATE ASSESS",
) -> str:
    """The reference's full report grammar:

    - ``overview``: environment key/values (report name, user, host,
      database ... — ReportOverview's field block) as a 2-column table;
    - ``summary``: the assess totals row — ``assess_total``,
      ``compatible``, ``incompatible``, ``convertible``,
      ``inconvertible`` (ReportSummary);
    - a DETAIL navigation table linking every section anchor
      (report_detail.html's link grid);
    - ``sections``: name -> (comment, result DataFrame), each rendered
      with its anchor, comment line, and a [Top] backlink
      (report_compatible/check/related).
    """
    anchors = [_anchor(n) for n in sections]
    reserved = {"top", "report_overview", "report_summary", "report_detail"}
    clash = reserved.intersection(anchors)
    if len(set(anchors)) != len(anchors) or clash:
        raise ValueError(
            f"section names collide after anchor normalization"
            f"{' (with built-in anchors ' + str(sorted(clash)) + ')' if clash else ''}: "
            f"{sorted(anchors)}")
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        f"<style>{_REPORT_CSS}</style></head><body><a id='top'></a>",
        f"<h1>{html.escape(title)}</h1>",
        _section_heading("report overview", None),
        "<table>",
        *(f"<tr><th style='width:25%'>{html.escape(k.upper())}</th>"
          f"<td><tt>{html.escape(str(v))}</tt></td></tr>"
          for k, v in overview.items()),
        "</table>",
        _section_heading(
            "report summary",
            "Struct object migrate cost assess summary."),
        "<table><tr>",
        *(f"<th>{html.escape(k.upper())}</th>" for k in summary),
        "</tr><tr>",
        *(f"<td style='text-align:center'>{int(v)}</td>" for v in summary.values()),
        "</tr></table>",
        _section_heading("report detail", None),
        "<table class='nav'><tr>",
    ]
    names = list(sections)
    for i, name in enumerate(names):
        if i and i % 4 == 0:
            parts.append("</tr><tr>")
        parts.append(f"<td><a href='#{_anchor(name)}'>{html.escape(name)}</a></td>")
    parts.append("</tr></table>")
    for name, (comment, df) in sections.items():
        parts.append(_section_heading(name, comment))
        parts.append(_df_to_html_table(df))
        parts.append("<div class='top'>[<a href='#top'>Top</a>]</div>")
    parts.append("</body></html>")
    return "".join(parts)


def write_assess_report_structured(
    overview: dict[str, str],
    summary: dict[str, int],
    sections: dict[str, tuple[str, DataFrame]],
    path: str,
    title: str = "MIGRATE ASSESS",
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(render_assess_report_structured(overview, summary, sections, title))
    return path
