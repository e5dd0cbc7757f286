"""Property-based invariants for the event-analytics family
(hypothesis): each operator is re-implemented as a brute-force Python
model and must agree EXACTLY on arbitrary event sets — the
engine-symmetric-bug backstop the differential gates cannot provide
(a wrong formula twinned into the oracle passes the hash compare;
it cannot pass an independent model).
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbms_spark.operators import events as E
from dbms_spark.operators.validate import sequence_gaps

BASE = dt.datetime(2024, 1, 1)

# small keyspaces on purpose: collisions (same user, same second,
# duplicate ids) are where window/join semantics break
event_sets = st.lists(
    st.tuples(st.integers(0, 3),                # user
              st.integers(0, 500_000),          # offset seconds
              st.sampled_from(["a", "b", "c"]),  # type
              st.integers(0, 400)),             # value cents/... small
    min_size=1, max_size=60, unique=True)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), t, v / 4.0, i)
         for i, (u, s, t, v) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, value double,"
        " event_id long")


def _funnel_model(rows, steps):
    by_user: dict[int, list] = {}
    for i, (u, s, t, v) in enumerate(rows):
        by_user.setdefault(u, []).append((s, t))
    counts = []
    reached = None  # user -> anchor seconds
    for step_i, step in enumerate(steps):
        cur = {}
        for u, evs in by_user.items():
            cands = [s for s, t in evs if t == step
                     and (step_i == 0 or (u in reached and s > reached[u]))]
            if step_i > 0 and u not in reached:
                continue
            if cands:
                cur[u] = min(cands)
        reached = cur
        counts.append(len(cur))
    return counts


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, steps=st.sampled_from(
    [["a", "b"], ["b", "a", "c"], ["c", "c"]]))
def test_funnel_matches_model(spark, rows, steps):
    got = {r.step: r.n_users
           for r in E.funnel(_df(spark, rows), steps).collect()}
    want = _funnel_model(rows, steps)
    assert [got[i] for i in range(len(steps))] == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, days=st.sampled_from([1, 3]))
def test_rolling_agg_matches_model(spark, rows, days):
    got = {r.event_id: (r.n_events_win, r.sum_cents_win)
           for r in E.rolling_agg(_df(spark, rows), days=days,
                                  id_cols=["event_id"]).collect()}
    win = days * 86400
    for i, (u, s, t, v) in enumerate(rows):
        in_win = [(u2, s2, t2, v2) for (u2, s2, t2, v2) in rows
                  if u2 == u and s - win + 1 <= s2 <= s]
        cents = sum(round(v2 / 4.0 * 100) for (_, _, _, v2) in in_win)
        assert got[i] == (len(in_win), cents), f"event {i}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ids=st.lists(st.integers(-50, 50), min_size=1, max_size=40))
def test_sequence_gaps_matches_model(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = sorted((r.gap_lo, r.gap_hi, r.n_missing)
                 for r in sequence_gaps(df, "id").collect())
    present = sorted(set(ids))
    want = []
    for a, b in zip(present, present[1:]):
        if b - a > 1:
            want.append((a + 1, b - 1, b - a - 1))
    assert got == want
    # invariant: gap mass + present count spans exactly [min, max]
    assert sum(n for _, _, n in got) + len(present) == \
        present[-1] - present[0] + 1


# --- BM25: same backstop for the retrieval scorer (lives here with
# the other model-vs-engine property suites) ------------------------------

words = st.sampled_from(["x", "y", "z", "rare", "common"])
corpora = st.lists(st.lists(words, min_size=0, max_size=8),
                   min_size=1, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpora, terms=st.sampled_from(
    [["rare"], ["rare", "common"], ["x", "y", "z"]]))
def test_bm25_matches_model(spark, docs, terms):
    from tests.test_llm import _bm25_model
    from dbms_spark.llm.text import bm25_rank

    corpus = {i: " ".join(toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(sorted(corpus.items()),
                               "doc_id long, text string")
    got = [(r.doc_id, r.score_x1e6, r.rank)
           for r in bm25_rank(df, terms, k=20).orderBy("rank").collect()]
    assert got == _bm25_model(corpus, terms, 20)
