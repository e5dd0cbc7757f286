#!/usr/bin/env python3
"""Event-family skew + x100 smokes (round-7 judge asks #3 and #6).

    python tools/event_skew_smoke.py skew  [n_rows]
    python tools/event_skew_smoke.py x100  [n_rows]

``skew``: rolling_agg / rolling_anomaly / funnel over a stream where
ONE user (a bot account) owns half the events, vs the same volume
uniform over 10k users.  All three partition or group by user, so
this is the classic event-stream hot key: a window partition cannot
be split across tasks (unlike AQE skew-join splitting), meaning the
hot user's rows land in ONE task's sort + linear RangeFrame scan.
The metric that matters is max-task-time — wall time hides a
straggler behind parallel neighbours.

``x100``: funnel and rolling_active at 10⁸ events / 10⁶ users — the
x100 point of the SCALE.md round-7 x10 table, same deterministic
synthetic stream.

Prints one JSON line per case.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import functions as F  # noqa: E402

from dbms_spark import get_spark  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "skew_smoke_mod", os.path.join(HERE, "skew_smoke.py"))
_sm = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sm)


def synth_events(spark, n: int, n_users: int, hot_frac: float = 0.0):
    """Deterministic synthetic stream over 30 days; ``hot_frac`` of
    the rows land on user 0 (the bot), the rest hash-uniform.  The
    source gets ~1.5M-row slices (a real table has block-sized input
    splits, not one per core) so scan-stage max-task reflects the
    operator, not an artificially coarse source."""
    uid = F.pmod(F.hash("id"), n_users)
    if hot_frac:
        uid = F.when(F.col("id") < int(n * hot_frac), F.lit(0)).otherwise(uid)
    types = F.array(F.lit("view"), F.lit("click"),
                    F.lit("purchase"), F.lit("other"))
    return spark.range(0, n, 1, max(32, n // 1_500_000)).select(
        uid.cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.col("id") * 7919, 30 * 86400))
        .alias("ts"),
        F.element_at(types, (F.pmod(F.col("id"), 4) + 1).cast("int"))
        .alias("event_type"),
        (F.pmod(F.col("id"), 997) / 4.0).alias("value"),
        F.col("id").alias("event_id"))


def timed(spark, name: str, df, extra: dict | None = None) -> None:
    before = _sm._completed_stages(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    out = {"case": name, "sec": wall,
           "max_task_ms": _sm._max_task_ms(spark, before)}
    out.update(extra or {})
    print(json.dumps(out), flush=True)


def run_skew(spark, n: int) -> None:
    from dbms_spark.operators.events import (funnel, rolling_agg,
                                             rolling_agg_prefix,
                                             rolling_anomaly,
                                             rolling_anomaly_prefix)

    # the sliding frame is quadratic in the hot key's row count (it
    # re-aggregates the buffer per slide), so measure IT on a doubling
    # ladder of small hot keys — the full hot key would run ~1 h in
    # one task — and the linear prefix forms + funnel at full size.
    for hot in (50_000, 100_000, 200_000):
        ev = synth_events(spark, hot * 2, 10_000, hot_frac=0.5).persist()
        ev.count()
        meta = {"shape": "hot_key_sliding_ladder", "hot_rows": hot}
        timed(spark, "rolling_agg_sliding",
              rolling_agg(ev, days=7, id_cols=["event_id"]), meta)
        ev.unpersist()

    for label, hot in (("uniform", 0.0), ("hot_key", 0.5)):
        ev = synth_events(spark, n, 10_000, hot_frac=hot).persist()
        ev.count()
        meta = {"shape": label, "rows": n, "hot_rows": int(n * hot)}
        if not hot:  # sliding forms only on the uniform shape
            timed(spark, f"rolling_agg_sliding_{label}",
                  rolling_agg(ev, days=7, id_cols=["event_id"]), meta)
            timed(spark, f"rolling_anomaly_sliding_{label}",
                  rolling_anomaly(ev, days=7, id_cols=["event_id"]), meta)
        timed(spark, f"rolling_agg_prefix_{label}",
              rolling_agg_prefix(ev, days=7, id_cols=["event_id"]), meta)
        timed(spark, f"rolling_anomaly_prefix_{label}",
              rolling_anomaly_prefix(ev, days=7, id_cols=["event_id"]),
              meta)
        timed(spark, f"funnel_{label}",
              funnel(ev, ["view", "click", "purchase"]), meta)
        ev.unpersist()


def run_x100(spark, n: int) -> None:
    from dbms_spark.operators.events import funnel, rolling_active

    ev = synth_events(spark, n, max(n // 100, 1)).persist()
    ev.count()
    meta = {"rows": n, "users": max(n // 100, 1)}
    timed(spark, "funnel_x100", funnel(ev, ["view", "click", "purchase"]),
          meta)
    timed(spark, "rolling_active_wau_x100", rolling_active(ev, days=7), meta)
    ev.unpersist()


def run_round8(spark, n: int) -> None:
    """x10 shape check for the round-8 operators.  Users FIXED at
    10^4 while events grow, so per-user touch density grows with n —
    the regime where uncapped multi-touch pair volume is
    convs x density (superlinear in n) and the cap keeps it at
    convs x cap."""
    from dbms_spark.operators.events import (attribute_conversions,
                                             attribution_multi_touch,
                                             heartbeat_gaps)
    from dbms_spark.operators.joins import sessionize

    for scale in (1, 10):
        ev = synth_events(spark, n * scale, 10_000).persist()
        ev.count()
        meta = {"rows": n * scale}
        timed(spark, f"attribution_last_touch_x{scale}",
              attribute_conversions(ev, "purchase", ["view", "click"],
                                    lookback_seconds=7 * 86400,
                                    tiebreak=["event_id"]), meta)
        timed(spark, f"multi_touch_capped8_x{scale}",
              attribution_multi_touch(ev, "purchase", ["view", "click"],
                                      max_touches=8), meta)
        timed(spark, f"multi_touch_uncapped_x{scale}",
              attribution_multi_touch(ev, "purchase", ["view", "click"]),
              meta)
        timed(spark, f"heartbeat_gaps_x{scale}",
              heartbeat_gaps(ev, max_gap_seconds=3600,
                             tiebreak=["event_id"]), meta)
        timed(spark, f"sessionize_x{scale}",
              sessionize(ev, "user_id", "ts", gap_minutes=30,
                         tiebreak=["event_id"]), meta)
        ev.unpersist()


def run_gaps(spark, n: int) -> None:
    """Global sequence_gaps at 10⁷ present ids (round-9 ask #3): a
    run-dense id space (~n/3 runs — every third id absent) pushes the
    starts/ends pairing itself to 10⁶·3 rows, the regime where the old
    unpartitioned row_number window was ONE task however many cores.
    The distributed form's max task should be a balanced bucket."""
    from dbms_spark.operators.validate import sequence_gaps

    # keep ids where id mod 3 != 2 -> runs of length 2, one-gap runs:
    # ~n/3 runs and ~n/3 single-id gaps, plus a sparse far tail
    ids = (spark.range(int(n * 1.5))
           .filter(F.pmod("id", F.lit(3)) != 2)
           .select(F.col("id").alias("id"))
           .union(spark.range(100).select(
               (F.lit(10_000_000_000) + F.col("id") * 5).alias("id")))
           .persist())
    n_ids = ids.count()
    timed(spark, "sequence_gaps_global", sequence_gaps(ids, "id"),
          {"present_ids": n_ids})
    # HOT GROUP: one tenant owns the whole run-dense id space above
    # plus 10k one-run tenants — a per-group window would put the hot
    # tenant's ~n/3 runs through ONE task; the bucketed form spreads
    hot = ids.select(F.lit(0).alias("g"), "id")
    small = (spark.range(10_000).select(
        (F.col("id") + 1).alias("g"),
        (F.lit(20_000_000_000) + F.col("id") * 100).alias("id")))
    gids = hot.unionByName(small).persist()
    n_g = gids.count()
    timed(spark, "sequence_gaps_hot_group",
          sequence_gaps(gids, "id", group_col="g"),
          {"present_ids": n_g, "hot_group_ids": n_ids})
    gids.unpersist()
    ids.unpersist()


def run_ledger(spark, n: int) -> None:
    """Growing-state ledger commit cost (round-9): fold ``n`` events
    per day for 30 daily batches into (a) the full-snapshot
    SketchStore active-days store and (b) the day-bucketed ledger.
    The snapshot store rewrites ALL accumulated state each batch —
    its per-batch wall grows with history; the day ledger rewrites
    only the batch's day bucket — flat.  Prints first/last-batch wall
    for both."""
    import tempfile

    from dbms_spark.streaming.events import (ActiveDaysDayLedger,
                                             active_days_store)

    for name, mk in (("snapshot_store", lambda p: active_days_store(
            spark, p)), ("day_ledger", lambda p: ActiveDaysDayLedger(
            spark, p))):
        store = mk(tempfile.mkdtemp(prefix=f"ledger_{name}_") + "/s")
        walls = []
        for day in range(30):
            ev = spark.range(n).select(
                F.pmod(F.hash("id"), n).cast("long").alias("user_id"),
                F.timestamp_seconds(F.lit(1704067200 + day * 86400)
                                    + F.pmod(F.col("id") * 7919, 86400))
                .alias("ts"))
            t0 = time.perf_counter()
            store.apply_batch(ev, batch_id=day)
            walls.append(round(time.perf_counter() - t0, 2))
        print(json.dumps({"case": f"ledger_{name}", "events_per_day": n,
                          "batches": 30, "first_batch_s": walls[0],
                          "batch10_s": walls[10], "batch20_s": walls[20],
                          "last_batch_s": walls[-1],
                          "total_s": round(sum(walls), 1)}), flush=True)


def _peak_mem_mb(spark, before: set[tuple[int, int]]) -> int:
    """Max per-task peakExecutionMemory (MB) across stages completed
    since ``before`` — the §5 metric the funnel hot-key guard must
    bound: the fold's collect_list array is charged here."""
    worst = 0
    for sid, att in _sm._completed_stages(spark) - before:
        try:
            d = _sm._stage_api(
                spark, f"stages/{sid}/{att}/taskSummary?quantiles=1.0")
            worst = max(worst, int(d["peakExecutionMemory"][0]))
        except Exception:
            pass
    return worst // (1024 * 1024)


def run_funnel_hot(spark, n: int) -> None:
    """Round-11 judge ask #1: ONE key with ``n`` distinct-ts step
    events (default 10^6) over a uniform background; the guarded
    funnel (threshold n//10 so the hot key trips) must pass at
    bounded max-task memory — the hot key rides the spill-safe
    window path — and match the unguarded fold's counts exactly.
    Both batch funnel and the streaming funnel store are driven."""
    import tempfile

    from dbms_spark.operators.events import funnel
    from dbms_spark.streaming.events import (funnel_counts_from_store,
                                             funnel_store)

    steps = ["view", "click", "purchase"]
    types = F.array(*[F.lit(s) for s in steps])
    hot = spark.range(n).select(
        F.lit(0).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        F.element_at(types, (F.pmod(F.col("id"), 3) + 1).cast("int"))
        .alias("event_type"))
    bg = synth_events(spark, n, 10_000).select(
        "user_id", "ts", "event_type")
    ev = hot.unionByName(bg).persist()
    ev.count()
    thr = max(1, n // 10)
    for label, kw in (("guarded", {"hot_key_events": thr}),
                      ("unguarded_fold", {"hot_key_events": None})):
        before = _sm._completed_stages(spark)
        t0 = time.perf_counter()
        rows = sorted(map(tuple, funnel(ev, steps, **kw).collect()))
        print(json.dumps({
            "case": f"funnel_hot_{label}", "hot_rows": n,
            "threshold": kw["hot_key_events"],
            "sec": round(time.perf_counter() - t0, 2),
            "max_task_ms": _sm._max_task_ms(spark, before),
            "peak_task_mem_mb": _peak_mem_mb(spark, before),
            "rows": [list(map(str, r)) for r in rows]}), flush=True)
    # streaming twin: same hot key split over 2 batches
    before = _sm._completed_stages(spark)
    t0 = time.perf_counter()
    store = funnel_store(spark, tempfile.mkdtemp(prefix="fhot_") + "/st",
                         steps, hot_key_events=thr)
    cut = 1704067200 + n // 2
    store.apply_batch(ev.where(F.col("ts") < F.timestamp_seconds(
        F.lit(cut))), batch_id=0)
    store.apply_batch(ev.where(F.col("ts") >= F.timestamp_seconds(
        F.lit(cut))), batch_id=1)
    rows = sorted(map(tuple, funnel_counts_from_store(store,
                                                      steps).collect()))
    print(json.dumps({
        "case": "funnel_hot_store_guarded", "hot_rows": n,
        "threshold": thr, "sec": round(time.perf_counter() - t0, 2),
        "max_task_ms": _sm._max_task_ms(spark, before),
        "peak_task_mem_mb": _peak_mem_mb(spark, before),
        "rows": [list(map(str, r)) for r in rows]}), flush=True)
    ev.unpersist()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "skew"
    defaults = {"skew": 2_000_000, "round8": 500_000, "gaps": 10_000_000,
                "ledger": 200_000, "funnel_hot": 1_000_000}
    n = int(sys.argv[2]) if len(sys.argv) > 2 else defaults.get(
        mode, 100_000_000)
    spark = get_spark("event_skew_smoke",
                      extra_conf={"spark.ui.enabled": "true"})
    if mode == "skew":
        run_skew(spark, n)
    elif mode == "round8":
        run_round8(spark, n)
    elif mode == "gaps":
        run_gaps(spark, n)
    elif mode == "ledger":
        run_ledger(spark, n)
    elif mode == "funnel_hot":
        run_funnel_hot(spark, n)
    else:
        run_x100(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
