"""Event-sequence analytics semantics: funnel ordering, retention
cohorts, common paths."""

import datetime

from dbms_spark.operators import events as E


def ts(minute, day=1):
    return datetime.datetime(2024, 1, day, 0, minute)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")


def test_funnel_order_semantics(spark):
    """Co-occurrence is not progression: steps must occur strictly
    after the previous step's FIRST occurrence."""
    ev = _ev(spark, [
        # u1: view -> click -> purchase in order (full funnel)
        (1, ts(1), "view", 1), (1, ts(2), "click", 2), (1, ts(3), "purchase", 3),
        # u2: click BEFORE view — has both types but never advances past view
        (2, ts(1), "click", 4), (2, ts(2), "view", 5),
        # u3: view then click at the SAME timestamp — strictly-after fails
        (3, ts(1), "view", 6), (3, ts(1), "click", 7),
        # u4: view only
        (4, ts(1), "view", 8),
    ])
    got = {r.step: (r.event_type, r.n_users)
           for r in E.funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {0: ("view", 4), 1: ("click", 1), 2: ("purchase", 1)}


def test_funnel_first_touch_anchor(spark):
    """Steps anchor on the FIRST qualifying occurrence: a later re-view
    does not reopen the funnel, but a click after the first view counts
    even with an earlier pre-view click."""
    ev = _ev(spark, [
        (1, ts(1), "click", 1),   # pre-view click: ignored
        (1, ts(2), "view", 2),    # funnel anchor
        (1, ts(3), "click", 3),   # qualifies (after first view)
    ])
    got = {r.step: r.n_users for r in E.funnel(ev, ["view", "click"]).collect()}
    assert got == {0: 1, 1: 1}


def test_funnel_absent_step_zero(spark):
    ev = _ev(spark, [(1, ts(1), "view", 1)])
    got = {r.step: r.n_users
           for r in E.funnel(ev, ["view", "zzmissing"]).collect()}
    assert got == {0: 1, 1: 0}


def test_funnel_duplicate_step_types(spark):
    """A type listed at several step positions participates at each
    (regression pin for the single-pass fold: events must be tagged
    multi-hot, not first-match)."""
    ev = _ev(spark, [
        (1, ts(1), "c", 1), (1, ts(2), "c", 2),   # c -> c advances both steps
        (2, ts(1), "c", 3),                        # single c: step 0 only
        (3, ts(1), "v", 4), (3, ts(2), "c", 5), (3, ts(3), "v", 6),
    ])
    got = {r.step: r.n_users for r in E.funnel(ev, ["c", "c"]).collect()}
    assert got == {0: 3, 1: 1}   # u1 (c->c), u2, u3 have a c; only u1 repeats
    got = {r.step: r.n_users
           for r in E.funnel(ev, ["v", "c", "v"]).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_retention_cohorts_hand_values(spark):
    """Two cohorts; u1 retained in weeks 0 and 1, u2 only week 0;
    ISO weeks are Monday-aligned (2024-01-01 IS a Monday)."""
    ev = _ev(spark, [
        (1, ts(0, day=1), "view", 1),    # cohort wk of Jan 1
        (1, ts(0, day=3), "view", 2),    # same week -> offset 0 (dedup)
        (1, ts(0, day=9), "view", 3),    # next week -> offset 1
        (2, ts(0, day=2), "view", 4),    # same cohort, week 0 only
        (3, ts(0, day=10), "view", 5),   # second cohort, week 0
    ])
    got = {(r.cohort_week.date().isoformat(), r.week_offset): r.n_users
           for r in E.retention_cohorts(ev).collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1}


def test_top_event_paths_hand_values(spark):
    ev = _ev(spark, [
        (1, ts(1), "a", 1), (1, ts(2), "b", 2), (1, ts(3), "c", 3),
        (2, ts(1), "a", 4), (2, ts(2), "b", 5),
        (3, ts(1), "a", 6), (3, ts(2), "b", 7), (3, ts(3), "c", 8),
    ])
    got = [(r.path, r.n_paths, r.rank)
           for r in E.top_event_paths(ev, n=2, k=5, tiebreak=["event_id"])
           .collect()]
    # a->b appears for all 3 users; b->c for u1 and u3; nothing bridges users
    assert got == [("a->b", 3, 1), ("b->c", 2, 2)]


def test_top_event_paths_session_boundary(spark):
    """With session_col, paths never bridge a session gap."""
    ev = spark.createDataFrame(
        [(1, ts(1), "a", 1, 1), (1, ts(2), "b", 2, 1),
         (1, ts(40), "a", 3, 2), (1, ts(41), "b", 4, 2)],
        "user_id long, ts timestamp, event_type string, event_id long,"
        " session_id long")
    with_sess = [(r.path, r.n_paths) for r in E.top_event_paths(
        ev, n=2, k=5, session_col="session_id", tiebreak=["event_id"])
        .collect()]
    assert with_sess == [("a->b", 2)]   # no b->a bridging the gap
    without = {r.path: r.n_paths for r in E.top_event_paths(
        ev, n=2, k=5, tiebreak=["event_id"]).collect()}
    assert without["b->a"] == 1          # the bridge the session form removes


def test_rolling_agg_hand_values(spark):
    """Trailing 7-day RANGE frame: an event exactly 7*86400-1 seconds
    earlier is IN the window, one second earlier is OUT; counts and
    cent-sums are per-key."""
    import datetime as dt

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    week = 7 * 86400
    rows = [
        (1, base - dt.timedelta(seconds=week), 10.0, 1),      # out by 1 s
        (1, base - dt.timedelta(seconds=week - 1), 20.0, 2),  # boundary: in
        (1, base - dt.timedelta(days=1), 30.0, 3),
        (1, base, 40.25, 4),
        (2, base, 99.0, 5),                                    # other key
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long")
    got = {r.event_id: (r.n_events_win, r.sum_cents_win)
           for r in E.rolling_agg(ev, days=7, id_cols=["event_id"]).collect()}
    assert got[1] == (1, 1000)
    assert got[2] == (2, 3000)          # sees event 1 (within 7d of it)
    assert got[3] == (3, 6000)          # events 1,2,3 within ITS window
    assert got[4] == (3, 9025)          # event 1 out by 1 s; 2,3,4 in
    assert got[5] == (1, 9900)          # key isolation


def test_rolling_anomaly_hand_values(spark):
    """Planted spike against a stable baseline flags; the spike never
    contaminates its own baseline (frame ends 1 s before); min_n
    withholds judgment on thin baselines."""
    import datetime as dt

    base = dt.datetime(2024, 1, 10)
    rows = []
    # u1: 8 stable readings 10.00 +/- 0.02, then a 50.00 spike
    for i in range(8):
        rows.append((1, base + dt.timedelta(hours=i), 10.0 + 0.01 * (i % 3), i))
    rows.append((1, base + dt.timedelta(hours=9), 50.0, 99))
    # u2: only 2 readings then a spike: baseline too thin to judge
    rows.append((2, base, 10.0, 201))
    rows.append((2, base + dt.timedelta(hours=1), 10.0, 202))
    rows.append((2, base + dt.timedelta(hours=2), 50.0, 203))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long")
    got = {r.event_id: (r.baseline_n, r.is_anomaly)
           for r in E.rolling_anomaly(ev, id_cols=["event_id"]).collect()}
    assert got[99] == (8, True)          # the spike flags
    assert got[0] == (0, False)          # first event: no baseline
    assert all(not got[i][1] for i in range(8))   # stable run clean
    assert got[203] == (2, False)        # thin baseline: withheld
    # zero-variance baseline: ANY deviation flags (dev^2 > k^2 * 0)
    flat = [(3, base + dt.timedelta(hours=i), 10.0, 300 + i)
            for i in range(6)] + [(3, base + dt.timedelta(hours=7), 10.01, 399)]
    got3 = {r.event_id: r.is_anomaly for r in E.rolling_anomaly(
        spark.createDataFrame(flat,
        "user_id long, ts timestamp, value double, event_id long"),
        id_cols=["event_id"]).collect()}
    assert got3[399] is True


def test_funnel_lag_hand_values(spark):
    """Completers only; lag measured from the FIRST step-0 anchor to
    the completion time; semantics identical to funnel."""
    ev = _ev(spark, [
        (1, ts(1), "view", 1), (1, ts(5), "click", 2), (1, ts(30), "purchase", 3),
        (2, ts(1), "view", 4), (2, ts(2), "click", 5),   # never purchases
        (3, ts(2), "purchase", 6), (3, ts(3), "view", 7),  # wrong order
        (4, ts(0), "view", 8), (4, ts(10), "view", 9),     # re-view ignored
        (4, ts(20), "click", 10), (4, ts(21), "purchase", 11),
    ])
    got = {r.user_id: r.lag_seconds for r in
           E.funnel_lag(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 29 * 60, 4: 21 * 60}   # anchored at the FIRST view


def test_funnel_conversion_window(spark):
    """max_gap_seconds: a step past the deadline does not convert; at
    exactly the deadline it does (inclusive)."""
    ev = _ev(spark, [
        (1, ts(0), "view", 1), (1, ts(10), "click", 2),     # within 10 min
        (2, ts(0), "view", 3), (2, ts(11), "click", 4),     # 1 min late
        (3, ts(0), "view", 5), (3, ts(10), "click", 6),
    ])
    got = {r.step: r.n_users for r in E.funnel(
        ev, ["view", "click"], max_gap_seconds=600).collect()}
    assert got == {0: 3, 1: 2}       # u2 misses the 10-minute window
    unbounded = {r.step: r.n_users
                 for r in E.funnel(ev, ["view", "click"]).collect()}
    assert unbounded == {0: 3, 1: 3}


def test_funnel_hot_key_guard_matches_fold(spark):
    """hot_key_events=0 forces EVERY key through the spill-safe
    chained-window path (and exercises the broadcast split); results
    must equal the unguarded fold on ordering, ties, conversion
    window, and duplicate-step semantics."""
    ev = _ev(spark, [
        (1, ts(1), "view", 1), (1, ts(2), "click", 2),
        (1, ts(3), "purchase", 3),
        (2, ts(1), "click", 4), (2, ts(2), "view", 5),
        (3, ts(1), "view", 6), (3, ts(1), "click", 7),   # ts tie
        (4, ts(1), "view", 8),
        (5, ts(0), "view", 9), (5, ts(11), "click", 10),  # gap-late
    ])
    for steps, gap in ([("view", "click", "purchase"), None],
                       [("view", "click"), 600],
                       [("v", "c", "v"), None]):
        steps = list(steps)
        want = sorted(map(tuple, E.funnel(
            ev, steps, max_gap_seconds=gap,
            hot_key_events=None).collect()))
        got = sorted(map(tuple, E.funnel(
            ev, steps, max_gap_seconds=gap,
            hot_key_events=0).collect()))
        assert got == want, (steps, gap)
    # mixed split: only user 1 is hot (3 events > 2)
    want = sorted(map(tuple, E.funnel(
        ev, ["view", "click"], hot_key_events=None).collect()))
    got = sorted(map(tuple, E.funnel(
        ev, ["view", "click"], hot_key_events=2).collect()))
    assert got == want


def test_rolling_active_hand_values(spark):
    """WAU semantics: a user active on day d counts toward days
    d..d+6 (clipped at the observed max); multiple events one day
    count once; window days beyond max never appear."""
    import datetime as dt

    d0 = dt.datetime(2024, 1, 1)
    ev = _ev(spark, [
        (1, d0, "view", 1), (1, d0 + dt.timedelta(hours=2), "view", 2),
        (2, d0 + dt.timedelta(days=3), "view", 3),
        (1, d0 + dt.timedelta(days=8), "view", 4),
    ])
    got = {r.day.date().isoformat(): r.n_active
           for r in E.rolling_active(ev, days=7).collect()}
    assert got == {
        "2024-01-01": 1, "2024-01-02": 1, "2024-01-03": 1,
        "2024-01-04": 2, "2024-01-05": 2, "2024-01-06": 2,
        "2024-01-07": 2,                       # u1's window ends Jan 7
        "2024-01-08": 1,                       # only u2's Jan 4 remains
        "2024-01-09": 2,                       # u2 (Jan 4..10) + u1's return
    }


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_active_days_merge_idempotent_and_late(spark):
    """Re-merging the same batch adds nothing (the (key, day) probe
    sees the rows it appended last time); a LATE batch for an old day
    lands exactly once too."""
    hist = _ev(spark, [(1, ts(0, day=1), "view", 1),
                       (2, ts(0, day=2), "view", 2)])
    batch = _ev(spark, [(1, ts(5, day=2), "view", 3),   # new (key, day)
                        (1, ts(9, day=1), "click", 4),  # late, dup day
                        (3, ts(0, day=1), "view", 5)])  # late, new key
    ledger = E.active_days(hist)
    once = E.active_days_merge(ledger, batch)
    twice = E.active_days_merge(once, batch)
    want = _rows(E.active_days(hist.unionByName(batch)))
    assert _rows(once) == want
    assert _rows(twice) == want


def test_rolling_active_incremental_identity(spark):
    """The incremental suffix equals the full recompute on the
    affected range — including a batch carrying LATE mid-range data
    (affected range starts at the batch's EARLIEST day)."""
    hist = _ev(spark, [(u, ts(u, day=d), "view", u * 100 + d)
                       for u in range(1, 6) for d in (1, 3, 8, 12)])
    batch = _ev(spark, [(9, ts(0, day=5), "view", 9005),   # late day-5
                        (1, ts(0, day=13), "view", 1013),
                        (7, ts(0, day=14), "view", 7014)])
    ledger = E.active_days(hist)
    inc = E.rolling_active_incremental(ledger, batch, days=7)
    full = E.rolling_active(hist.unionByName(batch), days=7)
    lo = min(r.day for r in E.active_days(batch).collect())
    assert _rows(inc) == _rows(full.filter(full.day >= lo))
    # every emitted day is in the affected range
    assert all(r.day >= lo for r in inc.collect())


def test_retention_merge_late_data_moves_cohort_back(spark):
    """A late batch event EARLIER than a key's recorded first touch
    re-minimizes the cohort; untouched keys pass through; the merged
    triangle equals the full recompute."""
    hist = _ev(spark, [(1, ts(0, day=8), "view", 1),    # wk of Jan 8
                       (2, ts(0, day=1), "view", 2),
                       (2, ts(0, day=15), "view", 3)])
    batch = _ev(spark, [(1, ts(0, day=1), "view", 4),   # moves u1 back
                        (3, ts(0, day=15), "view", 5)])  # brand-new key
    first, acts = E.retention_state(hist)
    mf, ma = E.retention_merge(first, acts, batch)
    got_first = {r.user_id: r.cohort_week for r in mf.collect()}
    wf, _ = E.retention_state(hist.unionByName(batch))
    assert got_first == {r.user_id: r.cohort_week for r in wf.collect()}
    assert _rows(E.retention_from_state(mf, ma)) == \
        _rows(E.retention_cohorts(hist.unionByName(batch)))


def test_retention_merge_idempotent(spark):
    hist = _ev(spark, [(1, ts(0, day=1), "view", 1)])
    batch = _ev(spark, [(1, ts(0, day=9), "view", 2),
                        (2, ts(0, day=9), "view", 3)])
    f1, a1 = E.retention_merge(*E.retention_state(hist), batch)
    f2, a2 = E.retention_merge(f1, a1, batch)
    assert _rows(f1) == _rows(f2)
    assert _rows(a1) == _rows(a2)


def test_top_event_paths_null_type_dropped(spark):
    """A NULL event_type mid-sequence neither nulls the path (SQL ||)
    nor silently bridges its neighbours into a fake consecutive pair
    wearing the shortened label — NULL rows are dropped up front, so
    the remaining events ARE consecutive by construction."""
    ev = _ev(spark, [(1, ts(1), "a", 1), (1, ts(2), None, 2),
                     (1, ts(3), "c", 3), (1, ts(4), "d", 4)])
    got = {r.path: r.n_paths
           for r in E.top_event_paths(ev, n=2, k=10).collect()}
    assert got == {"a->c": 1, "c->d": 1}


def test_rolling_agg_prefix_boundaries(spark):
    """Frame is [t-w+1, t]: an event EXACTLY w seconds earlier is
    out, w-1 in; simultaneous events (ties) count each other both
    ways; all pinned on the prefix form whose as-of probe has to get
    the <=/< boundaries right without a frame evaluator."""
    w = 86400  # days=1
    rows = [
        (1, ts(0), "a", 1),                                    # anchor
        (1, ts(0) + datetime.timedelta(seconds=w - 1), "a", 2),  # in
        (1, ts(0) + datetime.timedelta(seconds=w), "a", 3),      # t=w
        (2, ts(5), "a", 4), (2, ts(5), "a", 5),                  # ties
    ]
    ev = spark.createDataFrame(
        [(u, t, ty, 1.0, i) for u, t, ty, i in rows],
        "user_id long, ts timestamp, event_type string, value double,"
        " event_id long")
    got = {r.event_id: r.n_events_win
           for r in E.rolling_agg_prefix(ev, days=1,
                                         id_cols=["event_id"]).collect()}
    # event 2 at w-1 sees the anchor; event 3 at w does NOT see the
    # anchor (exactly w back) but sees event 2; ties see each other
    assert got == {1: 1, 2: 2, 3: 2, 4: 2, 5: 2}
    # and the sliding form agrees row-for-row
    want = {r.event_id: r.n_events_win
            for r in E.rolling_agg(ev, days=1,
                                   id_cols=["event_id"]).collect()}
    assert got == want


def test_rolling_anomaly_prefix_tie_exclusion(spark):
    """The baseline ends 1 s before the event: a simultaneous burst
    must not vouch for itself — the prefix form excludes the row's
    whole same-epoch tie block from the upper bound."""
    base = [(1, ts(0) + datetime.timedelta(seconds=i * 60), "a", i)
            for i in range(8)]                       # steady baseline
    burst_t = ts(0) + datetime.timedelta(seconds=9 * 60)
    burst = [(1, burst_t, "a", 100), (1, burst_t, "a", 101)]
    rows = [(u, t, ty, i) for u, t, ty, i in base + burst]
    ev = spark.createDataFrame(
        [(u, t, ty, 1.0 if i < 100 else 500.0, i)
         for u, t, ty, i in rows],
        "user_id long, ts timestamp, event_type string, value double,"
        " event_id long")
    got = {r.event_id: (r.baseline_n, r.is_anomaly)
           for r in E.rolling_anomaly_prefix(
               ev, days=1, id_cols=["event_id"], min_n=5).collect()}
    # both burst rows: baseline_n = 8 (the OTHER burst row excluded),
    # flagged against the steady baseline
    assert got[100] == (8, True) and got[101] == (8, True)
    want = {r.event_id: (r.baseline_n, r.is_anomaly)
            for r in E.rolling_anomaly(
                ev, days=1, id_cols=["event_id"], min_n=5).collect()}
    assert got == want


def test_rolling_active_hll_accuracy_and_state_bound(spark):
    """The sketch WAU tracks the exact WAU within the m=64 error
    regime on a few-thousand-key stream, and per-day sketch state is
    <= 64 rows no matter how many keys were active."""
    import datetime as dt

    rows = [(u * 7919 % 3000, ts(0) + dt.timedelta(
        seconds=(u * 104729) % (10 * 86400)), "view", u)
        for u in range(6000)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")
    exact = {r.day: r.n_active
             for r in E.rolling_active(ev, days=7).collect()}
    est = {r.day: r.n_active_est
           for r in E.rolling_active_hll(ev, days=7).collect()}
    assert set(est) == set(exact)   # same covered days
    for d, n in exact.items():
        if n >= 200:   # raw estimator regime (no linear counting)
            assert abs(est[d] - n) / n < 0.40, (d, n, est[d])
    # state bound: the per-day register relation never exceeds m rows
    from dbms_spark.operators.sketch import _HLL_M, _hll_parts_expr
    from pyspark.sql import functions as F
    bucket, rho = _hll_parts_expr(F.col("user_id"))
    daily = (ev.select(F.date_trunc("day", "ts").alias("day"),
                       bucket.alias("b"), rho.alias("r"))
             .groupBy("day", "b").count())
    per_day = daily.groupBy("day").count().agg(F.max("count")).first()[0]
    assert per_day <= _HLL_M


def test_attribute_conversions_hand_values(spark):
    """Last touch wins; lookback clips to organic; a conversion with
    no preceding touch is organic; later touches never attribute
    backward; simultaneous touch+conversion (same ts) resolves by
    event_id order (strictly preceding rows only)."""
    import datetime as dt

    b = dt.datetime(2024, 1, 10)
    rows = [
        (1, b, "view", 1),
        (1, b + dt.timedelta(hours=1), "click", 2),
        (1, b + dt.timedelta(hours=2), "purchase", 3),   # -> click
        (2, b, "purchase", 4),                            # organic
        (2, b + dt.timedelta(hours=1), "view", 5),        # later touch
        (3, b, "view", 6),
        (3, b + dt.timedelta(days=9), "purchase", 7),     # stale -> organic
        (4, b, "view", 8), (4, b, "purchase", 9),         # same ts: 8 < 9
    ]
    ev = _ev(spark, rows)
    got = {r.event_id: (r.touch_type, r.lag_seconds)
           for r in E.attribute_conversions(
               ev, "purchase", ["view", "click"],
               lookback_seconds=7 * 86400,
               tiebreak=["event_id"]).collect()}
    assert got[3] == ("click", 3600)
    assert got[4] == (None, None)
    assert got[7] == (None, None)
    assert got[9] == ("view", 0)
    # without the lookback, the 9-day-old view attributes
    got_all = {r.event_id: r.touch_type
               for r in E.attribute_conversions(
                   ev, "purchase", ["view", "click"],
                   tiebreak=["event_id"]).collect()}
    assert got_all[7] == "view"


def test_heartbeat_gaps_hand_values(spark):
    """Silence strictly longer than the threshold reports; the first
    event has no predecessor (no phantom gap); keys are isolated."""
    import datetime as dt

    b = dt.datetime(2024, 1, 10)
    ev = _ev(spark, [
        (1, b, "a", 1),
        (1, b + dt.timedelta(seconds=3600), "a", 2),      # exactly 1h: not >
        (1, b + dt.timedelta(seconds=3600 + 7200), "a", 3),  # 2h gap
        (2, b + dt.timedelta(days=5), "a", 4),            # other key, alone
    ])
    got = [(r.user_id, r.gap_seconds)
           for r in E.heartbeat_gaps(ev, max_gap_seconds=3600,
                                     tiebreak=["event_id"]).collect()]
    assert got == [(1, 7200)]


def test_multi_touch_weights_sum_to_million(spark):
    """Every conversion's weights sum to exactly 1e6 (remainder to the
    most recent touch); the cap keeps the N most recent and
    renormalizes; strictly-preceding tiebreak on equal timestamps."""
    import datetime as dt

    b = dt.datetime(2024, 1, 10)
    ev = _ev(spark, [
        (1, b, "view", 1),
        (1, b + dt.timedelta(hours=1), "click", 2),
        (1, b + dt.timedelta(hours=2), "view", 3),
        (1, b + dt.timedelta(hours=3), "purchase", 4),    # 3 touches
        (2, b, "view", 5), (2, b, "purchase", 6),          # same ts, 5 < 6
    ])
    rows = E.attribution_multi_touch(
        ev, "purchase", ["view", "click"]).collect()
    by_conv: dict[int, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert sum(r.weight_ppm for r in by_conv[4]) == 1_000_000
    # 1e6 DIV 3 = 333333; most recent touch (event 3) takes +1
    w = {r.touch_id: r.weight_ppm for r in by_conv[4]}
    assert w == {1: 333333, 2: 333333, 3: 333334}
    assert [r.weight_ppm for r in by_conv[6]] == [1_000_000]
    # cap at 2: only the two most recent touches, renormalized
    capped = {r.touch_id: r.weight_ppm
              for r in E.attribution_multi_touch(
                  ev, "purchase", ["view", "click"],
                  max_touches=2).collect() if r.conv_id == 4}
    assert capped == {2: 500000, 3: 500000}


def test_funnel_conversion_hand_values(spark):
    """Drop-off ppm: 4 viewers -> 2 clickers -> 1 buyer; absent step
    reports 0 with 0-ppm rates; rate after a zero count is NULL."""
    ev = _ev(spark, [
        (1, ts(1), "view", 1), (1, ts(2), "click", 2), (1, ts(3), "purchase", 3),
        (2, ts(1), "view", 4), (2, ts(2), "click", 5),
        (3, ts(1), "view", 6), (4, ts(1), "view", 7),
    ])
    got = {r.step: (r.n_users, r.conv_from_prev_ppm, r.conv_from_first_ppm)
           for r in E.funnel_conversion(
               ev, ["view", "click", "purchase", "zzgone", "zzafter"])
           .collect()}
    assert got[0] == (4, None, 1_000_000)
    assert got[1] == (2, 500_000, 500_000)
    assert got[2] == (1, 500_000, 250_000)
    assert got[3] == (0, 0, 0)
    assert got[4] == (0, None, 0)      # 0/0: unreported, not fake-100%


def test_funnel_trend_hand_values(spark):
    """Cohort pinned at step 0: a user advancing in a LATER week still
    counts in their anchor week's cell; per-period counts are
    non-increasing down the steps; the sum over periods equals the
    global funnel."""
    ev = _ev(spark, [
        # u1 anchors wk of Jan 1, clicks in wk of Jan 8: still wk-1 cohort
        (1, ts(0, day=1), "view", 1), (1, ts(0, day=9), "click", 2),
        # u2 anchors + clicks in wk of Jan 8
        (2, ts(0, day=9), "view", 3), (2, ts(1, day=9), "click", 4),
        # u3 anchors wk of Jan 1, never clicks
        (3, ts(0, day=2), "view", 5),
    ])
    got = {(r.period.date().isoformat(), r.step): r.n_users
           for r in E.funnel_trend(ev, ["view", "click"]).collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1, ("2024-01-08", 1): 1}
    glob = {r.step: r.n_users
            for r in E.funnel(ev, ["view", "click"]).collect()}
    by_step = {}
    for (p, s), n in got.items():
        by_step[s] = by_step.get(s, 0) + n
    assert by_step == glob


def test_active_days_merge_prunes_day_partitions(spark, tmp_path):
    """The O(batch) intake claim, machine-checked: with the ledger
    persisted day-partitioned, the merge's day-probe reaches the scan
    as a PARTITION filter (static IN-list via the broadcast semi
    join's DPP, or dynamicpruning) — the untouched days' files are
    never read.  Also re-checks merge correctness through the real
    parquet roundtrip."""
    import datetime as dt

    hist = _ev(spark, [(u, ts(0, day=d), "view", u * 100 + d)
                       for u in range(1, 5) for d in range(1, 11)])
    led_path = str(tmp_path / "ledger")
    E.active_days(hist).write.partitionBy("day").parquet(led_path)
    ledger = spark.read.parquet(led_path)
    batch = _ev(spark, [(9, ts(0, day=10), "view", 9010),
                        (1, ts(0, day=11), "view", 1011)])
    merged = E.active_days_merge(ledger, batch)
    want = _rows(E.active_days(hist.unionByName(batch)))
    assert _rows(merged) == want
    # the probe leg's literal day IN-list must reach the partitioned
    # scan as a STATIC partition filter: exactly one scan carries
    # day IN (...) — the untouched days' files are never read.  (A
    # broadcast-semi probe would need DPP, which measurably declines
    # to fire on builds this small.)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("day" in ln and " IN " in ln.upper() for ln in pf), pf


def test_activity_curve_hand_values(spark):
    """u1 active 3 distinct days (dups collapse), u2 active 1 day, u3
    active only BEFORE the trailing window -> excluded; spine
    zero-fills the missing bands."""
    import datetime as dt

    from dbms_spark.operators.events import activity_curve

    _TS0 = dt.datetime(2024, 3, 1)

    rows = [(1, 0, "a", 1), (1, 0, "b", 2), (1, 86400, "a", 3),
            (1, 2 * 86400, "a", 4), (2, 2 * 86400, "a", 5),
            (3, -30 * 86400, "a", 6)]
    df = spark.createDataFrame(
        [(u, _TS0 + dt.timedelta(seconds=s), t, i)
         for u, s, t, i in rows],
        "user_id long, ts timestamp, event_type string, event_id long")
    got = {r.n_active_days: r.n_users
           for r in activity_curve(df, days=7).collect()}
    assert got == {1: 1, 2: 0, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def test_cohort_value_hand_values(spark):
    """Two cohorts; cumulative carries across a missing age bucket;
    active-key counts are per bucket; cents are exact."""
    import datetime as dt

    from dbms_spark.operators.events import cohort_value

    _TS0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, 0, 10.00), (1, 1 * 86400, 2.50),          # cohort d0, age 0
        (1, 15 * 86400, 5.00),                        # age 2 (skip age 1)
        (2, 0, 1.00),                                 # cohort d0, age 0
        (3, 7 * 86400, 4.00), (3, 8 * 86400, 4.00),   # cohort d7, age 0
    ]
    df = spark.createDataFrame(
        [(u, _TS0 + dt.timedelta(seconds=s), "a", v, i)
         for i, (u, s, v) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, value double,"
        " event_id long")
    got = {(r.cohort_day, r.age_bucket):
           (r.n_active_keys, r.cum_value_cents)
           for r in cohort_value(df, bucket_days=7).collect()}
    d0, d7 = _TS0, _TS0 + dt.timedelta(days=7)
    assert got == {(d0, 0): (2, 1350),    # 10.00+2.50+1.00, users 1+2
                   (d0, 2): (1, 1850),    # +5.00, only user 1 active
                   (d7, 0): (1, 800)}     # cohort d7: 4.00+4.00
