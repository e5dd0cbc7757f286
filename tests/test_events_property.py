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


# --- round-7 judge ask #4: extend the model backstop to the rest of
# the family (retention, paths, rolling actives/stickiness,
# co-occurrence) — their oracle twins share authorship with the
# engine code, so only an independent model catches a symmetric bug.


def _week(t: dt.datetime) -> dt.datetime:
    """Monday-truncated midnight (date_trunc('week'))."""
    d = t.date() - dt.timedelta(days=t.weekday())
    return dt.datetime(d.year, d.month, d.day)


def _day(t: dt.datetime) -> dt.datetime:
    return dt.datetime(t.year, t.month, t.day)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets)
def test_retention_matches_model(spark, rows):
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in E.retention_cohorts(_df(spark, rows)).collect()}
    first: dict[int, dt.datetime] = {}
    acts: set[tuple[int, dt.datetime]] = set()
    for u, s, t, v in rows:
        ts = BASE + dt.timedelta(seconds=s)
        first[u] = min(first.get(u, ts), ts)
        acts.add((u, _week(ts)))
    want: dict[tuple, int] = {}
    for u, w in acts:
        cw = _week(first[u])
        key = (cw, (w - cw).days // 7)
        want[key] = want.get(key, 0) + 1
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, n=st.sampled_from([2, 3]))
def test_top_paths_matches_model(spark, rows, n):
    got = [(r.path, r.n_paths, r.rank)
           for r in E.top_event_paths(_df(spark, rows), n=n, k=50,
                                      tiebreak=["event_id"])
           .orderBy("rank").collect()]
    by_user: dict[int, list] = {}
    for i, (u, s, t, v) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, t))
    counts: dict[str, int] = {}
    for evs in by_user.values():
        types = [t for _, _, t in sorted(evs)]
        for j in range(len(types) - n + 1):
            p = "->".join(types[j:j + n])
            counts[p] = counts.get(p, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    want = [(p, c, r + 1) for r, (p, c) in enumerate(ranked)]
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, days=st.sampled_from([1, 3, 7]))
def test_rolling_active_matches_model(spark, rows, days):
    got = {r.day: r.n_active
           for r in E.rolling_active(_df(spark, rows), days=days).collect()}
    ad = {(u, _day(BASE + dt.timedelta(seconds=s))) for u, s, t, v in rows}
    days_seen = sorted({d for _, d in ad})
    want = {}
    d = days_seen[0]
    while d <= days_seen[-1]:
        n = len({u for u, du in ad
                 if d - dt.timedelta(days=days - 1) <= du <= d})
        if n:
            want[d] = n
        d += dt.timedelta(days=1)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets)
def test_stickiness_matches_model(spark, rows):
    """The q280 composition (DAU join WAU + integer-ppm ratio)
    against a from-scratch model of both windows and the ratio."""
    from pyspark.sql import functions as F

    ev = _df(spark, rows)
    dau = E.rolling_active(ev, days=1).withColumnRenamed("n_active", "dau")
    wau = E.rolling_active(ev, days=7).withColumnRenamed("n_active", "wau")
    got = {r.day: (r.dau, r.wau, r.ppm)
           for r in dau.join(wau, "day")
           .select("day", "dau", "wau",
                   F.expr("(CAST(1000000 AS BIGINT) * dau) DIV wau")
                   .alias("ppm")).collect()}
    ad = {(u, _day(BASE + dt.timedelta(seconds=s))) for u, s, t, v in rows}
    want = {}
    for d in {du for _, du in ad}:   # DAU days are exactly active days
        ndau = len({u for u, du in ad if du == d})
        nwau = len({u for u, du in ad
                    if d - dt.timedelta(days=6) <= du <= d})
        want[d] = (ndau, nwau, 1000000 * ndau // nwau)
    assert got == want


# --- token co-occurrence: model in tests/test_llm.py style ---------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["p", "q", "r", "s", "t"]),
             min_size=0, max_size=6),
    min_size=1, max_size=10)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy, min_df=st.sampled_from([1, 2]),
       max_df=st.sampled_from([None, 3]),
       per_doc_cap=st.sampled_from([None, 2]))
def test_token_cooccurrence_matches_model(spark, docs, min_df, max_df,
                                          per_doc_cap):
    import hashlib
    from itertools import combinations

    from dbms_spark.llm.text import token_cooccurrence

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    got = [(r.tok_a, r.tok_b, r.n_pair, r.df_a, r.df_b, int(r.lift_ppm),
            r.rank)
           for r in token_cooccurrence(df, min_df=min_df, max_df=max_df,
                                       min_pair=1, per_doc_cap=per_doc_cap,
                                       k=50).orderBy("rank").collect()]
    dfreq: dict[str, int] = {}
    tsets = [sorted(set(t)) for t in docs]
    for s in tsets:
        for t in s:
            dfreq[t] = dfreq.get(t, 0) + 1
    keep = {t for t, c in dfreq.items()
            if c >= min_df and (max_df is None or c <= max_df)}
    pair_n: dict[tuple, int] = {}
    for s in tsets:
        kept = [t for t in s if t in keep]
        if per_doc_cap is not None:
            kept = sorted(
                kept, key=lambda t: hashlib.md5(t.encode()).hexdigest()
            )[:per_doc_cap]
        for a, b in combinations(sorted(kept), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    n_docs = len(docs)
    scored = [(a, b, c, dfreq[a], dfreq[b],
               1000000 * c * n_docs // (dfreq[a] * dfreq[b]))
              for (a, b), c in pair_n.items()]
    ranked = sorted(scored, key=lambda x: (-x[5], x[0], x[1]))[:50]
    want = [(*row, r + 1) for r, row in enumerate(ranked)]
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, days=st.sampled_from([1, 3]))
def test_rolling_agg_prefix_matches_model(spark, rows, days):
    """The hot-key-proof prefix rewrite against the same brute-force
    model as the sliding form — the rewrite must be undetectable."""
    got = {r.event_id: (r.n_events_win, r.sum_cents_win)
           for r in E.rolling_agg_prefix(_df(spark, rows), days=days,
                                         id_cols=["event_id"]).collect()}
    win = days * 86400
    for i, (u, s, t, v) in enumerate(rows):
        in_win = [(u2, s2) for (u2, s2, t2, v2) in rows
                  if u2 == u and s - win + 1 <= s2 <= s]
        cents = sum(round(v2 / 4.0 * 100) for (u2, s2, t2, v2) in rows
                    if u2 == u and s - win + 1 <= s2 <= s)
        assert got[i] == (len(in_win), cents), f"event {i}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, days=st.sampled_from([1, 3]))
def test_rolling_anomaly_prefix_identity(spark, rows, days):
    """Prefix anomaly screen field-identical to the sliding form on
    arbitrary tie-heavy event sets (min_n=1 so the flag logic runs
    on tiny baselines too)."""
    df = _df(spark, rows)
    a = sorted(tuple(r) for r in E.rolling_anomaly(
        df, days=days, id_cols=["event_id"], min_n=1).collect())
    b = sorted(tuple(r) for r in E.rolling_anomaly_prefix(
        df, days=days, id_cols=["event_id"], min_n=1).collect())
    assert a == b


# --- round-8 additions: attribution, heartbeat gaps, drop-off -------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, lookback=st.sampled_from([None, 86400]))
def test_attribution_matches_model(spark, rows, lookback):
    df = _df(spark, rows)
    got = {r.event_id: (r.touch_type,
                        None if r.touch_ts is None else r.lag_seconds)
           for r in E.attribute_conversions(
               df, "c", ["a", "b"], lookback_seconds=lookback,
               tiebreak=["event_id"]).collect()}
    want = {}
    for i, (u, s, t, v) in enumerate(rows):
        if t != "c":
            continue
        pre = [(s2, j, t2) for j, (u2, s2, t2, v2) in enumerate(rows)
               if u2 == u and t2 in ("a", "b") and (s2, j) < (s, i)]
        if not pre:
            want[i] = (None, None)
            continue
        s2, j, t2 = max(pre)
        if lookback is not None and s2 < s - lookback:
            want[i] = (None, None)
        else:
            want[i] = (t2, s - s2)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, cap=st.sampled_from([None, 2]))
def test_multi_touch_matches_model(spark, rows, cap):
    df = _df(spark, rows)
    got = {}
    for r in E.attribution_multi_touch(df, "c", ["a", "b"],
                                       lookback_seconds=86400,
                                       max_touches=cap).collect():
        got.setdefault(r.conv_id, {})[r.touch_id] = (r.n_touches,
                                                     r.weight_ppm)
    want = {}
    for i, (u, s, t, v) in enumerate(rows):
        if t != "c":
            continue
        pre = [(s2, j) for j, (u2, s2, t2, v2) in enumerate(rows)
               if u2 == u and t2 in ("a", "b") and (s2, j) < (s, i)
               and s2 >= s - 86400]
        pre.sort(reverse=True)          # most recent first
        if cap is not None:
            pre = pre[:cap]
        if not pre:
            continue
        n = len(pre)
        w = {}
        for rank, (s2, j) in enumerate(pre):
            w[j] = (n, 1000000 // n + (1000000 % n if rank == 0 else 0))
        want[i] = w
    assert got == want
    # invariant: every conversion's ppm sums to exactly 1e6
    for conv, ws in got.items():
        assert sum(p for _, p in ws.values()) == 1_000_000


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets, gap=st.sampled_from([3600, 86400]))
def test_heartbeat_gaps_matches_model(spark, rows, gap):
    got = sorted((r.user_id, r.gap_seconds)
                 for r in E.heartbeat_gaps(_df(spark, rows),
                                           max_gap_seconds=gap,
                                           tiebreak=["event_id"]).collect())
    by_user: dict[int, list] = {}
    for i, (u, s, t, v) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i))
    want = []
    for u, evs in by_user.items():
        ss = [s for s, _ in sorted(evs)]
        for a, b in zip(ss, ss[1:]):
            if b - a > gap:
                want.append((u, b - a))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets)
def test_funnel_conversion_matches_model(spark, rows):
    steps = ["a", "b", "c"]
    got = {r.step: (r.n_users, r.conv_from_prev_ppm, r.conv_from_first_ppm)
           for r in E.funnel_conversion(_df(spark, rows), steps).collect()}
    counts = _funnel_model(rows, steps)
    want = {}
    for i, n in enumerate(counts):
        prev = counts[i - 1] if i else None
        want[i] = (n,
                   1000000 * n // prev if prev else None,
                   1000000 * n // counts[0] if counts[0] else None)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets)
def test_funnel_trend_matches_model(spark, rows):
    """Per-(period, step) counts against the funnel model extended
    with step-0 anchor weeks; marginals must equal the global
    funnel."""
    steps = ["a", "b"]
    got = {}
    for r in E.funnel_trend(_df(spark, rows), steps).collect():
        got[(r.period, r.step)] = r.n_users
    # model: reuse _funnel_model's anchor logic but track anchors
    by_user: dict[int, list] = {}
    for u, s, t, v in rows:
        by_user.setdefault(u, []).append((s, t))
    reached = None
    cohort: dict[int, object] = {}
    want: dict[tuple, int] = {}
    for step_i, step in enumerate(steps):
        cur = {}
        for u, evs in by_user.items():
            if step_i > 0 and u not in reached:
                continue
            cands = [s for s, t in evs if t == step
                     and (step_i == 0 or s > reached[u])]
            if cands:
                cur[u] = min(cands)
                if step_i == 0:
                    cohort[u] = _week(BASE + dt.timedelta(seconds=cur[u]))
                want_key = (cohort[u], step_i)
                want[want_key] = want.get(want_key, 0) + 1
        reached = cur
    assert got == want


# --- streaming fold stores: fold over event-time batches must equal
# the one-shot operator on the concatenation, for ARBITRARY event
# sets and ARBITRARY cut points (the class of invariant that caught
# the session-span re-split defect at gate scale) --------------------------

fold_sets = st.lists(
    st.tuples(st.integers(0, 3),                 # user
              st.integers(0, 10_000),            # offset seconds
              st.sampled_from(["a", "b", "c"])),  # type
    min_size=1, max_size=40, unique=True)
cut_pairs = st.tuples(st.integers(1, 9_999), st.integers(1, 9_999))


def _fold(spark, store, rows, cuts):
    lo, hi = min(cuts), max(cuts)
    bounds = [float("-inf"), lo, hi, float("inf")]
    for i, (a, b) in enumerate(zip(bounds, bounds[1:])):
        batch = [r for r in rows if a <= r[1] < b]
        bdf = spark.createDataFrame(
            [(u, BASE + dt.timedelta(seconds=s), t, j)
             for j, (u, s, t) in enumerate(batch)] or
            [(None, None, None, None)],
            "user_id long, ts timestamp, event_type string,"
            " event_id long")
        if not batch:
            bdf = bdf.filter("user_id IS NOT NULL")
        store.apply_batch(bdf, batch_id=i)
        store.apply_batch(bdf, batch_id=i)       # redelivery no-op


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=fold_sets, cuts=cut_pairs)
def test_session_store_fold_matches_one_shot(spark, rows, cuts):
    import tempfile

    from pyspark.sql import functions as F

    from dbms_spark.operators.joins import sessionize
    from dbms_spark.streaming import events as SE

    store = SE.session_store(spark, tempfile.mkdtemp() + "/s",
                             gap_minutes=10)          # 600 s: splits often
    _fold(spark, store, rows, cuts)
    got = sorted(tuple(r) for r in
                 SE.session_stats_from_store(store).collect())
    df = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), t, j)
         for j, (u, s, t) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, event_id long")
    ep = F.col("ts").cast("timestamp").cast("long")
    want = sorted(tuple(r) for r in
                  sessionize(df, "user_id", "ts", gap_minutes=10,
                             tiebreak=["event_id"])
                  .groupBy("user_id", "session_id")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                       (F.max(ep) - F.min(ep)).cast("bigint")
                       .alias("duration_seconds")).collect())
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=fold_sets, cuts=cut_pairs)
def test_attribution_store_fold_matches_one_shot(spark, rows, cuts):
    import tempfile

    from pyspark.sql import functions as F

    from dbms_spark.streaming import events as SE

    store = SE.attribution_store(
        spark, tempfile.mkdtemp() + "/a", "c", ["a", "b"],
        lookback_seconds=3_000, tiebreak=["event_id"])
    _fold(spark, store, rows, cuts)
    got = {r.touch_type: r.n for r in
           SE.attribution_counts_from_store(store).collect()}
    df = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), t, j)
         for j, (u, s, t) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, event_id long")
    want = {r.touch_type: r.n for r in
            E.attribute_conversions(df, "c", ["a", "b"],
                                    lookback_seconds=3_000,
                                    tiebreak=["event_id"])
            .groupBy("touch_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")).collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets)
def test_activity_curve_matches_model(spark, rows):
    days = 7
    got = {r.n_active_days: r.n_users
           for r in E.activity_curve(_df(spark, rows), days=days).collect()}
    daysets: dict[int, set] = {}
    for u, s, t, v in rows:
        daysets.setdefault(u, set()).add(s // 86400)
    mx = max(d for ds in daysets.values() for d in ds)
    want = {n: 0 for n in range(1, days + 1)}
    for u, ds in daysets.items():
        nd = len([d for d in ds if d > mx - days])
        if nd:
            want[nd] = want.get(nd, 0) + 1
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_sets)
def test_cohort_value_matches_model(spark, rows):
    bucket = 7
    got = {(r.cohort_day, r.age_bucket):
           (r.n_active_keys, r.cum_value_cents)
           for r in E.cohort_value(_df(spark, rows),
                                   bucket_days=bucket).collect()}
    first: dict[int, int] = {}
    for u, s, t, v in rows:
        d = s // 86400
        first[u] = min(first.get(u, d), d)
    cells: dict[tuple, dict] = {}
    for u, s, t, v in rows:
        cd, age = first[u], (s // 86400 - first[u]) // bucket
        c = cells.setdefault((cd, age), {"users": set(), "v": 0})
        c["users"].add(u)
        c["v"] += round(v / 4.0 * 100)  # value = v/4.0 -> cents = 25v exact
    want = {}
    for (cd, age) in sorted(cells):
        cum = sum(c["v"] for (cd2, a2), c in cells.items()
                  if cd2 == cd and a2 <= age)
        want[(BASE + dt.timedelta(days=cd), age)] = (
            len(cells[(cd, age)]["users"]), cum)
    assert got == want
