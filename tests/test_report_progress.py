"""Report sinks (S12) and progress counters (A8)."""

import os

from dbms_spark.functions.progress import batch_progress
from dbms_spark.operators import report as R
from dbms_spark.operators.assess import table_overview, top_tables_by_rows


def test_write_fix_sql_file(tmp_path):
    path = str(tmp_path / "fix" / "orders.sql")
    out = R.write_fix_sql_file(
        ["INSERT INTO t VALUES (1);", "DELETE FROM t WHERE id = 2 LIMIT 1;"], path, "orders"
    )
    content = open(out).read()
    assert content.startswith("-- fix SQL for orders (2 statements)")
    assert content.count(";\n") == 2


def test_assess_report_html(spark, sf_dir, tmp_path):
    sections = {
        "Table overview": table_overview(spark, sf_dir),
        "Top tables by rows": top_tables_by_rows(spark, sf_dir),
    }
    path = R.write_assess_report(sections, str(tmp_path / "assess.html"))
    html_text = open(path).read()
    assert "<h2>Table overview</h2>" in html_text
    assert "lineitem" in html_text
    assert html_text.count("<table>") == 2


def test_assess_report_escapes_html(spark):
    df = spark.createDataFrame([("<script>alert(1)</script>",)], "v string")
    out = R.render_assess_report({"x<y": df})
    assert "<script>alert" not in out
    assert "&lt;script&gt;" in out
    assert "x&lt;y" in out


def test_assess_report_structured_reference_grammar(spark, sf_dir, tmp_path):
    """Reference report grammar (assess_report.go:44-62 +
    template/report_*.html): overview key/values, one-row summary
    totals, a detail NAV table whose links resolve to real section
    anchors, per-section comment lines, and [Top] backlinks."""
    overview = {"report name": "assess_demo", "report user": "tester",
                "host name": "local", "database name": "TPCH"}
    summary = {"assess_total": 10, "compatible": 7, "incompatible": 1,
               "convertible": 2, "inconvertible": 0}
    sections = {
        "table type compatible": ("Schema table type compatible overview.",
                                  table_overview(spark, sf_dir)),
        "top tables": ("Largest tables by rows.",
                       top_tables_by_rows(spark, sf_dir)),
    }
    path = R.write_assess_report_structured(
        overview, summary, sections, str(tmp_path / "r.html"))
    out = open(path).read()
    assert "REPORT OVERVIEW" in out and "REPORT SUMMARY" in out \
        and "REPORT DETAIL" in out
    assert "<tt>assess_demo</tt>" in out
    # summary totals render as one header row + one value row
    assert "ASSESS_TOTAL" in out and "INCONVERTIBLE" in out
    # nav links resolve: every href has a matching anchor id
    import re
    hrefs = set(re.findall(r"href='#([^']+)'", out)) - {"top"}
    ids = set(re.findall(r"id='([^']+)'", out))
    assert hrefs and hrefs <= ids
    assert out.count("[<a href='#top'>Top</a>]") == len(sections)
    assert "lineitem" in out


def test_batch_progress_snapshot(spark):
    p = batch_progress(spark)   # idle session: zeros, but shape is valid
    assert p.active_jobs >= 0 and p.num_tasks >= 0


def test_gates_md_in_sync():
    """docs/GATES.md must match a fresh regeneration — a new @register
    without running tools/gen_gates_md.py fails here."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    before = open(os.path.join(repo, "docs", "GATES.md")).read()
    subprocess.run([sys.executable, os.path.join(repo, "tools", "gen_gates_md.py")],
                   check=True, capture_output=True)
    after = open(os.path.join(repo, "docs", "GATES.md")).read()
    assert before == after, "docs/GATES.md is stale — run tools/gen_gates_md.py"


def test_assess_report_reserved_anchor_collision(spark, sf_dir, tmp_path):
    """A section whose normalized anchor collides with a built-in
    (report_overview/report_summary/report_detail/top) must be
    rejected — duplicate HTML ids would hijack the nav links."""
    import pytest

    with pytest.raises(ValueError, match="built-in"):
        R.render_assess_report_structured(
            {"k": "v"}, {"assess_total": 0},
            {"Report Summary": ("boom", table_overview(spark, sf_dir))})


def test_compatibility_families_render_in_report(spark, tmp_path):
    """The broadened 73-entry matrix flows through the HTML report: an
    inventory hitting the new families (code types, composite
    partitions, charset, temp tables) renders with its verdicts."""
    from dbms_spark.operators.assess import (
        O2M_COMPATIBLE_RULES, compatibility_report)

    assert len(O2M_COMPATIBLE_RULES) == 73
    inv = spark.createDataFrame(
        [("object_type", "JAVA CLASS", 3), ("object_type", "LOB", 9),
         ("partition_type", "RANGE-RANGE", 2), ("charset", "AL32UTF8", 1),
         ("temp_table_type", "SYS$SESSION", 4),
         ("object_type", "NOT A THING", 1)],
        "category string, object_name string, n_objects long")
    rep = compatibility_report(inv)
    rows = {(r["category"], r["object_name"]):
            (r["is_compatible"], r["is_convertible"]) for r in rep.collect()}
    assert rows[("object_type", "JAVA CLASS")] == (False, False)
    assert rows[("object_type", "LOB")] == (True, False)
    assert rows[("partition_type", "RANGE-RANGE")] == (False, False)
    assert rows[("charset", "AL32UTF8")] == (True, True)
    assert rows[("object_type", "NOT A THING")] == (None, None)  # manual review

    path = R.write_assess_report_structured(
        {"report name": "compat"}, {"assess_total": 6},
        {"object compatible": ("Built-in compatibility verdicts.", rep)},
        str(tmp_path / "c.html"))
    out = open(path).read()
    assert "JAVA CLASS" in out and "RANGE-RANGE" in out \
        and "SYS$SESSION" in out and "OBJECT COMPATIBLE" in out
