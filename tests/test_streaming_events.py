"""Streaming event analytics over the SketchStore ledger
(streaming/events.py): WAU and funnel counters maintained across
micro-batches, redeliveries, and injected crashes must CONVERGE TO
THE BATCH ANSWER — the q233 exactly-once contract extended to the
event family."""

import datetime

from pyspark.sql import functions as F

from dbms_spark.operators import events as E
from dbms_spark.streaming import events as SE
from dbms_spark.streaming import incremental_agg as IA

BASE = datetime.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, BASE + datetime.timedelta(seconds=s), t, i)
         for i, (u, s, t) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, event_id long")


def _time_batches(rows, cuts):
    """Split rows into time-ordered batches at the cut offsets —
    the resolvedTs flush contract the funnel store requires."""
    bounds = [float("-inf"), *cuts, float("inf")]
    return [[r for r in rows if lo <= r[1] < hi]
            for lo, hi in zip(bounds, bounds[1:])]


ROWS = [
    # u1 full funnel spread across batches (cascade ACROSS batches)
    (1, 10, "view"), (1, 40_000, "click"), (1, 90_000, "purchase"),
    # u2 full funnel inside one batch (cascade WITHIN a batch)
    (2, 40_100, "view"), (2, 40_200, "click"), (2, 40_300, "purchase"),
    # u3 wrong order: click before view — never advances past view
    (3, 20, "click"), (3, 30, "view"),
    # u4 view only, active on two days
    (4, 50, "view"), (4, 100_000, "view"),
    # u5 late-night activity in the last batch only
    (5, 170_000, "click"),
]
CUTS = [30_000, 120_000]
STEPS = ["view", "click", "purchase", "zzabsent"]


def test_wau_store_converges_with_redelivery(spark, tmp_path):
    store = SE.active_days_store(spark, str(tmp_path / "wau"))
    for i, batch in enumerate(_time_batches(ROWS, CUTS)):
        store.apply_batch(_ev(spark, batch), batch_id=i)
        if i == 1:  # crash-and-redeliver: must be a no-op
            store.apply_batch(_ev(spark, batch), batch_id=i)
    got = sorted(tuple(r) for r in SE.wau_from_store(store, days=7).collect())
    want = sorted(tuple(r)
                  for r in E.rolling_active(_ev(spark, ROWS),
                                            days=7).collect())
    assert got == want


def test_wau_store_exact_under_out_of_order_batches(spark, tmp_path):
    """Set-union state: REVERSED batch order still converges (the
    active-days ledger needs no ordering contract)."""
    store = SE.active_days_store(spark, str(tmp_path / "wau_ooo"))
    for i, batch in enumerate(reversed(_time_batches(ROWS, CUTS))):
        store.apply_batch(_ev(spark, batch), batch_id=i)
    got = sorted(tuple(r) for r in SE.wau_from_store(store, days=7).collect())
    want = sorted(tuple(r)
                  for r in E.rolling_active(_ev(spark, ROWS),
                                            days=7).collect())
    assert got == want


def test_funnel_store_converges_to_batch_funnel(spark, tmp_path):
    store = SE.funnel_store(spark, str(tmp_path / "fun"), STEPS)
    for i, batch in enumerate(_time_batches(ROWS, CUTS)):
        store.apply_batch(_ev(spark, batch), batch_id=i)
    got = sorted(tuple(r) for r in
                 SE.funnel_counts_from_store(store, STEPS).collect())
    want = sorted(tuple(r) for r in
                  E.funnel(_ev(spark, ROWS), STEPS).collect())
    assert got == want
    # zero row for the absent step survives the store roundtrip
    assert (3, "zzabsent", 0) in got
    # state is key-bounded: one row per key per reached step
    state = store.read().collect()
    assert len(state) == len({(r.user_id, r.step) for r in state})


def test_funnel_store_crash_soak(spark, tmp_path, monkeypatch):
    """Injected crash between snapshot write and pointer commit on
    EVERY batch, followed by redelivery: state must converge to the
    batch funnel anyway (the pointer rename is the single atomic
    commit point, so each crashed apply leaves the previous state
    intact and the retry applies exactly once)."""
    import os as _os

    store = SE.funnel_store(spark, str(tmp_path / "soak"), STEPS)
    real_rename = _os.rename

    def crashing_rename(src, dst):
        if dst.endswith(IA.AggStore._POINTER):
            raise OSError("simulated crash before pointer commit")
        return real_rename(src, dst)

    for i, batch in enumerate(_time_batches(ROWS, CUTS)):
        bdf = _ev(spark, batch)
        monkeypatch.setattr(IA.os, "rename", crashing_rename)
        try:
            store.apply_batch(bdf, batch_id=i)
        except OSError:
            pass
        monkeypatch.setattr(IA.os, "rename", real_rename)
        assert store.last_batch_id() == i - 1  # crash left old marker
        store.apply_batch(bdf, batch_id=i)     # redelivery commits
        assert store.last_batch_id() == i
    got = sorted(tuple(r) for r in
                 SE.funnel_counts_from_store(store, STEPS).collect())
    want = sorted(tuple(r) for r in
                  E.funnel(_ev(spark, ROWS), STEPS).collect())
    assert got == want


def test_funnel_store_anchor_times_match_batch(spark, tmp_path):
    """Beyond counts: the per-key ANCHOR CHAIN equals the batch
    funnel's intermediate anchors (pinning first-touch semantics
    through the store, not just cardinalities)."""
    store = SE.funnel_store(spark, str(tmp_path / "anchors"),
                            ["view", "click"])
    for i, batch in enumerate(_time_batches(ROWS, CUTS)):
        store.apply_batch(_ev(spark, batch), batch_id=i)
    got = {(r.user_id, r.step): r.anchor for r in store.read().collect()}
    # batch model: step-0 anchor = first view; step-1 = first click
    # strictly after it
    df = _ev(spark, ROWS)
    v = {r.user_id: r.a for r in
         df.filter("event_type = 'view'").groupBy("user_id")
         .agg(F.min("ts").alias("a")).collect()}
    c = {r.user_id: r.a for r in
         df.filter("event_type = 'click'").join(
             spark.createDataFrame([(k, a) for k, a in v.items()],
                                   "user_id long, anchor timestamp"),
             "user_id")
         .filter("ts > anchor").groupBy("user_id")
         .agg(F.min("ts").alias("a")).collect()}
    want = {(u, 0): a for u, a in v.items()}
    want.update({(u, 1): a for u, a in c.items()})
    assert got == want


def test_last_seen_store_out_of_order_and_redelivery(spark, tmp_path):
    """Max-merge liveness ledger: REVERSED batches + a redelivered
    batch converge to the one-shot grouped max; offline screen flags
    exactly the stale keys with whole-second ages."""
    store = SE.last_seen_store(spark, str(tmp_path / "seen"))
    for i, batch in enumerate(reversed(_time_batches(ROWS, CUTS))):
        store.apply_batch(_ev(spark, batch), batch_id=i)
        if i == 0:
            store.apply_batch(_ev(spark, batch), batch_id=i)  # redelivery
    got = {r.user_id: r.last_seen for r in store.read().collect()}
    want = {r.user_id: r.m for r in
            _ev(spark, ROWS).groupBy("user_id")
            .agg(F.max("ts").alias("m")).collect()}
    assert got == want
    from dbms_spark.operators.events import offline_keys
    off = {r.user_id: r.silent_seconds for r in offline_keys(
        store.read(), "2024-01-03 00:00:00",
        threshold_seconds=86400).collect()}
    # offline = last event before Jan 2 00:00 (86400 s): u2 (40300)
    # and u3 (30); u1 (90000), u4 (100000), u5 (170000) are within
    # the trailing day
    assert set(off) == {2, 3}
    for u, s in off.items():
        assert s == 2 * 86400 - max(
            sec for uu, sec, _ in ROWS if uu == u)
