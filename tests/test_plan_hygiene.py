"""Plan-hygiene gate over EVERY registered query: physical plans must
stay inside the scale envelope — no row-at-a-time Python UDFs, no
unintended cartesian products.  This is the automated version of the
manual `.explain` audit, so a future operator can't silently regress
the 100 TB shape."""

import pytest

from dbms_spark import queries as Q

#: queries whose crossJoin is a deliberate broadcast of a 1-row (or
#: tiny literal) relation — the documented exceptions
_BROADCAST_ONE_ROW_OK = {
    "q26_ngram_jaccard",       # broadcast 1-row (half, min, max) limits
    "q27_cosine_topk",         # broadcast query-vector set
    "q50_collated_diff",       # crossJoin of two 1-row count aggregates
}


@pytest.mark.parametrize("name", sorted(Q.queries()))
def test_plan_hygiene(spark, sf_dir, name):
    df = Q.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    if name not in _BROADCAST_ONE_ROW_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    # cartesians that ARE allowed must at least be broadcast-driven
    if "CartesianProduct" in plan:
        assert "Broadcast" in plan or name in _BROADCAST_ONE_ROW_OK
