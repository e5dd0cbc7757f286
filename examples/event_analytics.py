#!/usr/bin/env python3
"""Event-stream analytics walkthrough: the round-7 operator family
driven end-to-end over the events table —

    sessionize     gap-based sessions (batch form of session_window)
    funnel         ordered view -> click -> purchase progression
    retention      weekly first-touch retention triangle
    top_paths      most common 3-step event sequences
    rolling        trailing 7-day per-user activity/spend window
    actives        rolling 7-day distinct actives (WAU)
    anomalies      per-user rolling z-score screen
    actives_incremental   the nightly form: persisted (key, day)
                   ledger + O(batch) merge + affected-suffix recompute

Every stage is one or two partial-aggregated shuffles over
fixed-width keys (users, weeks, path strings); nothing collects a
user's history into an array, which is what carries the shapes to a
100 TB stream.  Run:

    python examples/event_analytics.py [sf_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_spark import get_spark  # noqa: E402


def main(sf_dir: str | None = None, spark=None) -> list[dict]:
    """Runs the event-analytics flow; returns the stage dicts it
    prints.  Pass an existing ``spark`` to reuse a session — the
    function only stops sessions it created."""
    from pyspark.sql import functions as F

    from dbms_spark.engine import DbmsEngine
    from dbms_spark.operators.events import rolling_agg
    from dbms_spark.operators.joins import sessionize
    from dbms_spark.sources.catalog import load_table

    sf_dir = sf_dir or "/root/testdata/sf0.001"
    owned = spark is None
    if owned:
        spark = get_spark("event_analytics")
    stages: list[dict] = []

    def emit(d: dict) -> None:
        stages.append(d)
        print(json.dumps(d))

    try:
        eng = DbmsEngine(spark)
        ev = load_table(spark, sf_dir, "events")

        sessions = sessionize(ev, "user_id", "ts", gap_minutes=30,
                              tiebreak=["event_id"])
        emit({"stage": "sessionize", "n_events": ev.count(),
              "n_sessions": sessions.select("user_id", "session_id")
              .distinct().count()})

        fn = {r.event_type: r.n_users
              for r in eng.funnel(ev, ["view", "click", "purchase"])
              .collect()}
        emit({"stage": "funnel", **fn})

        ret = eng.retention(ev)
        emit({"stage": "retention",
              "n_cohort_weeks": ret.select("cohort_week").distinct().count(),
              "max_offset": ret.agg(F.max("week_offset")).first()[0]})

        paths = eng.top_paths(ev, n=3, k=5, tiebreak=["event_id"]).collect()
        emit({"stage": "top_paths",
              "top": [[r.path, r.n_paths] for r in paths]})

        roll = rolling_agg(ev, days=7, id_cols=["event_id"])
        emit({"stage": "rolling", "rows": roll.count(),
              "peak_7d_events": roll.agg(F.max("n_events_win")).first()[0]})

        wau = eng.active_users(ev, days=7)
        emit({"stage": "actives",
              "days": wau.count(),
              "peak_wau": wau.agg(F.max("n_active")).first()[0]})

        emit({"stage": "anomalies",
              "n_flagged": eng.anomaly_screen(ev, id_cols=["event_id"])
              .filter("is_anomaly").count()})

        # the nightly-pipeline lifecycle: persistable ledger state +
        # O(batch) intake, identical on the affected range to the
        # one-shot recompute above
        from dbms_spark.operators.events import active_days
        cut = F.lit("2024-01-24").cast("timestamp")
        ledger = active_days(ev.filter(F.col("ts") < cut))
        inc = eng.active_users_incremental(
            ledger, ev.filter(F.col("ts") >= cut), days=7)
        full_tail = {r.day: r.n_active for r in inc.collect()}
        want = {r.day: r.n_active for r in wau.collect()
                if r.day in full_tail}
        emit({"stage": "actives_incremental",
              "ledger_rows": ledger.count(),
              "affected_days": len(full_tail),
              "matches_full_recompute": full_tail == want})

        att = eng.attribute(ev, "purchase", ["view", "click"],
                            lookback_seconds=7 * 86400,
                            tiebreak=["event_id"])
        shares = {(r.touch_type or "organic"): r.n for r in
                  att.groupBy("touch_type")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        emit({"stage": "attribution", **shares})

        from dbms_spark.operators.events import funnel_conversion
        drop = {r.step: r.conv_from_first_ppm for r in funnel_conversion(
            ev, ["view", "click", "purchase"]).collect()}
        emit({"stage": "dropoff",
              "from_top_ppm": {str(k): v for k, v in drop.items()}})
    finally:
        if owned:
            spark.stop()
    return stages


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
