"""Event-sequence analytics: funnels, retention cohorts, common paths.

The reference engine has no event analytics of its own (SURVEY §2.3
scopes its workload to migration/compare) — these are headroom
operators a Spark-native analytics engine should provide over an
event stream, built strictly from Catalyst primitives, and they
compose with :func:`dbms_spark.operators.joins.sessionize` (batch) or
the streaming session/window operators.

Scale notes baked into each shape:

- :func:`funnel` is ONE groupBy(key) fold (round 10) with a hot-key
  guard (round 11): per-key step events fold left-to-right in one
  exchange; keys whose event count exceeds ``hot_key_events`` are
  split to a spill-safe chained-window form so a bot account with
  10^8 events is a straggler, never an unspillable array buffer.
- :func:`retention_cohorts` is two partial-aggregated passes (first
  touch, distinct activity periods) joined on the user key.
- :func:`top_event_paths` windows within (user, session) partitions —
  bounded by the session gap, not the user's lifetime history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from dbms_spark.plans.parallelism import literal_df


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _maybe_hot(events: DataFrame, hot_key_events: int | None) -> bool:
    """Could ``events`` hold a key with more than ``hot_key_events``
    rows?  Two gates, cheapest first: (1) the Catalyst plan-size
    estimate (no job) — below 8 bytes x threshold even pathological
    RLE parquet (~1 byte/row floor) cannot hide more than ~8x
    threshold rows total, which the fold absorbs; (2) the exact total
    row count (one bounded count job) — total >= any per-key count.
    Only when both say "possible" does the caller pay the split."""
    if hot_key_events is None:
        return False
    from dbms_spark.plans.parallelism import estimate_bytes

    est = estimate_bytes(events)
    if 0 < est < int(hot_key_events) * 8:
        return False
    return events.count() > int(hot_key_events)


def _funnel_event_rows(events: DataFrame, steps: list[str], key: str,
                       ts_col: str, type_col: str) -> DataFrame:
    """(key, __i, __ts): one row per (event, matched step position).
    An event type listed at several step positions contributes one
    row per position (explode arm); the common all-distinct case is
    a single CASE projection."""
    k = len(steps)
    if len(set(steps)) == k:
        step_idx = F.when(F.col(type_col) == steps[0], 0)
        for i in range(1, k):
            step_idx = step_idx.when(F.col(type_col) == steps[i], i)
        return (events.select(F.col(key), step_idx.cast("int").alias("__i"),
                              F.col(ts_col).alias("__ts"))
                .where(F.col("__i").isNotNull()))
    idx_arr = F.array_compact(F.array(*[
        F.when(F.col(type_col) == s, F.lit(i).cast("int"))
        for i, s in enumerate(steps)]))
    return events.select(F.col(key), F.explode(idx_arr).alias("__i"),
                         F.col(ts_col).alias("__ts"))


def _funnel_fold_totals(ev: DataFrame, k: int, key: str,
                        max_gap_seconds: int | None) -> DataFrame:
    """One-row (__n0..__n{k-1}) step totals via the per-key fold —
    ONE exchange, but per-key memory O(events of the key): the
    collect_list array lives in a single aggregation buffer.  The
    normal path; :func:`funnel` bounds it with a hot-key guard."""
    ts_type = ev.schema["__ts"].dataType
    g = ev.groupBy(key).agg(
        F.max(F.when(F.col("__i") == 0, 1).otherwise(0)).alias("__h0"),
        F.sort_array(F.collect_list(
            F.when(F.col("__ts").isNotNull(),
                   F.struct(F.col("__ts").alias("t"),
                            F.col("__i").alias("i"))))).alias("__evs"))
    gap = ("" if max_gap_seconds is None else
           f" AND CAST(CAST(e.t AS TIMESTAMP) AS LONG) <= "
           f"CAST(CAST(acc[j - 1] AS TIMESTAMP) AS LONG)"
           f" + {int(max_gap_seconds)}")
    # nested CASE keeps acc[j - 1] inside a branch only reachable for
    # j >= 1 (AND/OR operands are not guaranteed lazy under ANSI)
    fold = (f"aggregate(__evs, __seeds, (acc, e) -> "
            f"transform(acc, (a, j) -> CASE WHEN j != e.i THEN a "
            f"WHEN e.i = 0 THEN least(a, e.t) "
            f"WHEN acc[j - 1] IS NOT NULL AND e.t > acc[j - 1]{gap} "
            f"THEN least(a, e.t) ELSE a END))")
    folded = (g.withColumn("__seeds", F.array(
        *[F.lit(None).cast(ts_type) for _ in range(k)]))
        .withColumn("__acc", F.expr(fold)))
    reached = [F.col("__h0") == 1 if i == 0
               else F.col("__acc")[i].isNotNull() for i in range(k)]
    return folded.agg(*[
        F.coalesce(F.sum(F.when(r, 1).otherwise(0)), F.lit(0))
        .cast("bigint").alias(f"__n{i}") for i, r in enumerate(reached)])


def _funnel_window_totals(ev: DataFrame, k: int, key: str,
                          max_gap_seconds: int | None) -> DataFrame:
    """One-row (__n0..__n{k-1}) step totals via chained running-min
    windows — the BOUNDED-MEMORY form of the fold, used for hot keys:
    WindowExec buffers spill to disk, so a key with 10^8 events is a
    straggler, never an OOM (the collect_list fold builds that key's
    whole event array in one unspillable aggregation buffer).

    Equivalence with the fold (prototyped + oracle-checked, round
    11): events are evaluated in ascending (ts, step) order; the
    running anchor column ``__a{{i}}`` at any row equals the fold's
    ``acc[i]`` after all events <= that row folded — same recursion
    (anchors move by least() over qualifying events; a step-i event
    qualifies iff the running step-(i-1) anchor is non-NULL and
    strictly earlier, plus the conversion-window bound), evaluated at
    every prefix instead of once at the end.  Tie rows (equal ts)
    are order-independent under the strict inequality: a same-ts
    step-(i-1) event entering the frame can only set the anchor TO
    ts, which strictly-greater excludes either way.  Same exchange
    count: one hash(key) exchange feeds the windows AND the per-key
    flag groupBy (same partitioning, no re-shuffle)."""
    w_run = (Window.partitionBy(key)
             .orderBy(F.col("__ts").asc_nulls_first(), F.col("__i"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cur = ev
    for i in range(k):
        if i == 0:
            cond = (F.col("__i") == 0) & F.col("__ts").isNotNull()
        else:
            prev = F.col(f"__a{i - 1}")
            cond = ((F.col("__i") == i) & prev.isNotNull()
                    & (F.col("__ts") > prev))
            if max_gap_seconds is not None:
                cond = cond & (
                    F.col("__ts").cast("timestamp").cast("long")
                    <= prev.cast("timestamp").cast("long")
                    + int(max_gap_seconds))
        cur = cur.withColumn(
            f"__a{i}", F.min(F.when(cond, F.col("__ts"))).over(w_run))
    flags = cur.groupBy(key).agg(
        F.max(F.when(F.col("__i") == 0, 1).otherwise(0)).alias("__f0"),
        *[F.max(F.when(F.col(f"__a{i}").isNotNull(), 1).otherwise(0))
          .alias(f"__f{i}") for i in range(1, k)])
    return flags.agg(*[
        F.coalesce(F.sum(f"__f{i}"), F.lit(0)).cast("bigint")
        .alias(f"__n{i}") for i in range(k)])


def funnel(events: DataFrame, steps: list[str], key: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           max_gap_seconds: int | None = None,
           hot_key_events: int | None = 1_000_000) -> DataFrame:
    """Ordered-progression funnel: for each step i, the number of
    distinct ``key`` values that performed ``steps[0..i]`` IN
    TIMESTAMP ORDER (each step strictly after the previous one's
    FIRST qualifying occurrence — the standard first-touch funnel;
    simultaneous timestamps do not advance the funnel).
    ``max_gap_seconds`` adds the CONVERSION WINDOW: each step must
    also occur within that many seconds of the previous step's
    anchor, the "counts only if they purchase within 48 h" semantic
    — without it a click three years after the view still converts.

    Returns (step BIGINT, event_type STRING, n_users BIGINT), one row
    per step, n_users non-increasing.

    Shape (round 10, guide §2.4 — ONE exchange): a single
    groupBy(key) collects each key's time-sorted step events, a
    per-key left-to-right fold computes every step's first-touch
    anchor in one pass, and one global aggregation sums the per-key
    reached flags into the per-step counts.  (The previous shape ran
    per STEP: a join against the previous step's survivors + a
    groupBy + an eager localCheckpoint — ~2 exchanges and a
    standalone job per step.)  Equivalence: events fold in ascending
    (ts, step) order; a step-i event qualifies iff the running
    step-(i-1) anchor is non-NULL and strictly earlier (plus the
    conversion-window bound), and anchors fold by least() — the
    running anchor at time t equals the min over seed-free step-(i-1)
    qualifiers ≤ t, which is exactly what the per-step join compared
    against; strict inequality makes ts ties order-independent.
    Step 0 counts keys with ANY step-0 event (even NULL-ts), like the
    old unconditioned groupBy; for i>0 NULL ts can never pass the
    strict qualifier in either form.  An event type listed at SEVERAL
    step positions contributes one fold row per position (the old
    per-step filters each matched it independently).

    HOT-KEY GUARD (round 11, guide §2.5/§5): the fold's collect_list
    builds each key's whole event array in ONE unspillable
    aggregation buffer — a key with 10^8 step events is an executor
    OOM, not a straggler.  ``hot_key_events`` bounds it: when the
    INPUT's total row count exceeds the threshold (a cheap, often
    metadata-only count; total >= any per-key count, so a smaller
    input proves no key can be hot and the plan is EXACTLY the
    unguarded fold — one exchange, zero extra work at gate scale),
    keys whose step-event count exceeds the threshold are split out
    by a broadcast anti/semi join and computed through the
    spill-safe chained-window form (:func:`_funnel_window_totals`,
    equivalence documented there); both one-row totals add.  Every
    key takes exactly one path, so the split is exact for any
    threshold.  ``None`` disables the guard (pure lazy plan).

    The count itself is gated by a NO-JOB Catalyst size estimate
    (:func:`_maybe_hot`): an input whose compressed plan bytes sit
    under 8 x threshold cannot hide a hot key beyond the same order
    of magnitude as the threshold (parquet bottoms out around
    ~1 byte/row under extreme RLE, so the worst slip-through is ~8x
    threshold rows — a tens-of-MB fold buffer, not an OOM), so gate
    scale pays literally nothing and the one bounded count job runs
    only where a hot key is physically possible."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    ev = _funnel_event_rows(events, steps, key, ts_col, type_col)
    totals = None
    if _maybe_hot(events, hot_key_events):
        hot = (ev.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
               .where(F.col("__n") > int(hot_key_events)).select(key))
        tn = _funnel_fold_totals(
            ev.join(F.broadcast(hot), key, "left_anti"),
            k, key, max_gap_seconds)
        th = _funnel_window_totals(
            ev.join(F.broadcast(hot), key, "left_semi"),
            k, key, max_gap_seconds)
        totals = tn.crossJoin(th.select(
            *[F.col(f"__n{i}").alias(f"__m{i}") for i in range(k)]))
        totals = totals.select(
            *[(F.col(f"__n{i}") + F.col(f"__m{i}")).cast("bigint")
              .alias(f"__n{i}") for i in range(k)])
    if totals is None:
        totals = _funnel_fold_totals(ev, k, key, max_gap_seconds)
    arms = ", ".join(
        f"CAST({i} AS BIGINT), {_q(s)}, __n{i}" for i, s in enumerate(steps))
    return totals.selectExpr(
        f"stack({k}, {arms}) AS (step, event_type, n_users)")


def funnel_sql(table: str, steps: list[str], key: str = "user_id",
               ts_col: str = "ts", type_col: str = "event_type",
               max_gap_seconds: int | None = None) -> str:
    """DuckDB twin of :func:`funnel` (CTE chain; ts cast to
    TIMESTAMP mirrors the nanosecond-parquet load path).

    The conversion-window predicate compares WHOLE-SECOND epochs via
    floor(epoch(...)) because the Spark side compares cast-to-long
    values (truncation); a bare ``epoch()`` returns a fractional
    DOUBLE, so a microsecond-precision event landing inside the
    boundary second would qualify in one engine and not the other."""
    ctes, selects = [], []
    for i, step in enumerate(steps):
        gap = ("" if max_gap_seconds is None else
               f" AND CAST(floor(epoch(CAST(e.{ts_col} AS TIMESTAMP)))"
               f" AS BIGINT)"
               f" <= CAST(floor(epoch(s{i - 1}.t)) AS BIGINT)"
               f" + {max_gap_seconds}")
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {key}, MIN(CAST({ts_col} AS TIMESTAMP)) AS t"
                f" FROM {table} WHERE {type_col} = {_q(step)} GROUP BY 1)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{key}, MIN(CAST(e.{ts_col} AS TIMESTAMP)) AS t"
                f" FROM {table} e JOIN s{i - 1} USING ({key})"
                f" WHERE e.{type_col} = {_q(step)}"
                f" AND CAST(e.{ts_col} AS TIMESTAMP) > s{i - 1}.t{gap} GROUP BY 1)")
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS step, {_q(step)} AS event_type,"
            f" CAST((SELECT COUNT(*) FROM s{i}) AS BIGINT) AS n_users")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def funnel_lag(events: DataFrame, steps: list[str], key: str = "user_id",
               ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Per-key conversion detail for completers of the full funnel:
    (key, t_first, t_complete, lag_seconds) — the time-to-convert
    relation behind "median hours from view to purchase", the number
    the funnel's counts cannot give.  Semantics match :func:`funnel`
    exactly (first-touch anchors, each step strictly after the
    previous); only keys that completed EVERY step appear.

    Same chained key-bounded shape as funnel plus one final join of
    the last step's survivors back to the step-0 anchor times."""
    if len(steps) < 2:
        raise ValueError("funnel_lag needs at least two steps")
    reached: DataFrame | None = None
    first: DataFrame | None = None
    for i, step in enumerate(steps):
        ev_i = (events.filter(F.col(type_col) == step)
                .select(F.col(key), F.col(ts_col).alias("__ts")))
        if reached is None:
            cur = ev_i.groupBy(key).agg(F.min("__ts").alias("__t"))
            first = cur.localCheckpoint()
            reached = first
        else:
            reached = (ev_i.join(reached.select(key, "__t"), key)
                       .filter(F.col("__ts") > F.col("__t"))
                       .groupBy(key).agg(F.min("__ts").alias("__t"))
                       .localCheckpoint())
    return (reached.select(key, F.col("__t").alias("t_complete"))
            .join(first.select(key, F.col("__t").alias("t_first")), key)
            .select(key,
                    F.col("t_first").cast("timestamp").alias("t_first"),
                    F.col("t_complete").cast("timestamp").alias("t_complete"),
                    (F.col("t_complete").cast("timestamp").cast("long")
                     - F.col("t_first").cast("timestamp").cast("long"))
                    .cast("bigint").alias("lag_seconds")))


def funnel_lag_sql(table: str, steps: list[str], key: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type") -> str:
    """DuckDB twin of :func:`funnel_lag` (same CTE chain as
    funnel_sql, selecting the completers' anchor times)."""
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {key}, MIN(CAST({ts_col} AS TIMESTAMP)) AS t"
                f" FROM {table} WHERE {type_col} = {_q(step)} GROUP BY 1)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{key}, MIN(CAST(e.{ts_col} AS TIMESTAMP)) AS t"
                f" FROM {table} e JOIN s{i - 1} USING ({key})"
                f" WHERE e.{type_col} = {_q(step)}"
                f" AND CAST(e.{ts_col} AS TIMESTAMP) > s{i - 1}.t GROUP BY 1)")
    last = len(steps) - 1
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT s0.{key}, s0.t AS t_first, s{last}.t AS t_complete,
       CAST(date_diff('second', s0.t, s{last}.t) AS BIGINT) AS lag_seconds
FROM s{last} JOIN s0 USING ({key})
""")


def active_days(events: DataFrame, key: str = "user_id",
                ts_col: str = "ts") -> DataFrame:
    """The deduped (key, day TIMESTAMP) relation — one partial-
    aggregated shuffle whose volume is activity-bounded (a key
    contributes one row per active day, never per event).  This IS
    :func:`rolling_active`'s mergeable state: persist it (partitioned
    by day) and nightly batches fold in via :func:`active_days_merge`
    without ever re-reading the event history."""
    return (events.select(F.col(key),
                          F.date_trunc("day", F.col(ts_col).cast("timestamp"))
                          .alias("day"))
            .distinct())


def active_days_merge(ledger: DataFrame, new_events: DataFrame,
                      key: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """O(new-batch) intake of an event batch into a persisted
    :func:`active_days` ledger: the batch dedupes to its own (key,
    day) rows, the ledger is probed ONLY on the batch's days, and
    only genuinely new rows append.  Works for late/out-of-order
    data: a replayed or historical day simply probes that day's
    partition.

    The day probe is a LITERAL IN-list: a batch's distinct days are
    driver-bounded (a nightly batch covers a handful of calendar
    days), and a literal filter reaches a day-partitioned parquet
    ledger as a STATIC partition filter — guaranteed pruning,
    machine-checked in tests, where a broadcast-semi-join probe
    would depend on dynamic-partition-pruning heuristics that
    measurably decline to fire on small builds.  A pathological
    batch spanning > 1000 distinct days falls back to the semi-join
    (correct either way; only the pruning strategy differs)."""
    batch = active_days(new_events, key, ts_col)
    return _merge_day_rows(ledger, batch, key)


def _merge_day_rows(ledger: DataFrame, batch: DataFrame,
                    key: str = "user_id") -> DataFrame:
    """Fold already-deduped (key, day) batch rows into the ledger —
    the shared probe/append kernel of :func:`active_days_merge` and
    the streaming active-days store (see its pruning note).

    EAGER AT CONSTRUCTION: the literal day IN-list requires the
    batch's distinct days on the driver, so building this plan runs
    one Spark job over the batch immediately (the price of the
    machine-checked static partition filter — the same
    collect-at-build trade the localCheckpoint sites document).  The
    batch is localCheckpointed first so the day probe and the
    subsequent anti-join/union read ONE materialization instead of
    re-deriving the batch lineage twice."""
    batch = batch.localCheckpoint()
    days = [r[0] for r in batch.select("day").distinct().limit(1001)
            .collect()]
    if len(days) > 1000:
        probe_days = batch.select("day").distinct()
        existing = ledger.join(F.broadcast(probe_days), "day", "left_semi")
    else:
        existing = ledger.filter(F.col("day").isin(days))
    fresh = batch.join(existing, [key, "day"], "left_anti")
    return ledger.unionByName(fresh)


def rolling_active_from_days(daily: DataFrame, key: str = "user_id",
                             days: int = 7) -> DataFrame:
    """The rolling WAU/MAU count over an already-deduped (key, day)
    relation (see :func:`rolling_active` for the contract).  Factored
    out so the incremental form can feed it a window-clipped ledger
    slice instead of re-deriving state from raw events.

    INTERVAL SWEEP, not offset expansion: a key active on day d is
    "covered" on d..d+days-1, and consecutive active days ≤ days-1
    apart merge into one coverage run — so per key, one ordered pass
    (lag + running sum, hot-key-linear) folds its active days into
    disjoint [start, stop] runs, each run emits a +1/−1 delta at its
    boundaries, and a prefix sum over the DAY SPINE (calendar-bounded:
    ≤ a few thousand rows for years of data — the one unpartitioned
    window here, on that spine only) yields every day's distinct-key
    count without ever materializing (key, covering-day) pairs.

    Why not the obvious expansions: exploding each active day into
    the ``days`` window ends it touches shuffles days × ledger rows
    (×30 for MAU — measured 59 s map tasks at the x100 smoke), and a
    ``count_distinct`` per day shuffles on the day alone, so ~30
    day-groups bound reduce fan-in however many executors exist
    (measured 74 s straggler).  The sweep shuffles the ledger ONCE by
    key (balanced), then ≤ 2·runs one-byte deltas whose day-keyed
    shuffle is partial-SUM-aggregated to ≤ n_days rows per map task —
    no stage carries more than the ledger itself.  Day arithmetic
    runs on epoch-day BIGINTs (non-negative epochs assumed, the
    repo-wide floor-epoch contract) — timezone-aware timestamp
    intrinsics measured 2× slower per row at 10⁸ rows.

    EAGER AT CONSTRUCTION: the day bounds collect as ONE driver row
    so the spine is a distributed ``spark.range`` — a single corrupt
    far-future timestamp then costs spine rows, not a multi-megabyte
    ``sequence`` array materialized inside one row (the
    _merge_day_rows collect-at-build trade)."""
    dl = daily.select(F.col(key),
                      F.expr("CAST(day AS LONG) DIV 86400").alias("__d"))
    b = dl.agg(F.min("__d").alias("__lo"),
               F.max("__d").alias("__hi")).collect()[0]
    spark = daily.sparkSession
    if b["__lo"] is None:
        return literal_df(spark, [], "day timestamp, n_active bigint")
    w = Window.partitionBy(key).orderBy("__d")
    runs = (dl
            .withColumn("__prev", F.lag("__d").over(w))
            .withColumn("__new", (F.col("__prev").isNull()
                                  | (F.col("__d") - F.col("__prev")
                                     > days - 1)).cast("int"))
            .withColumn("__run", F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy(key, "__run")
            .agg(F.min("__d").alias("__start"), F.max("__d").alias("__end")))
    hi = int(b["__hi"])
    deltas = (runs
              .select(F.explode(F.array(
                  F.struct(F.col("__start").alias("__d"),
                           F.lit(1).alias("__c")),
                  F.struct((F.least(F.col("__end") + F.lit(days - 1),
                                    F.lit(hi)) + 1).alias("__d"),
                           F.lit(-1).alias("__c")))).alias("__e"))
              .select("__e.__d", "__e.__c")
              .groupBy("__d").agg(F.sum("__c").alias("__net")))
    spine = spark.range(int(b["__lo"]), hi + 1).select(
        F.col("id").alias("__d"))
    return (spine.join(deltas, "__d", "left")
            .withColumn("n_active", F.sum(F.coalesce(F.col("__net"),
                                                     F.lit(0)))
                        .over(Window.orderBy("__d")
                              .rowsBetween(Window.unboundedPreceding, 0)))
            .filter(F.col("n_active") > 0)
            .select(F.timestamp_seconds(F.col("__d") * 86400).alias("day"),
                    F.col("n_active").cast("bigint").alias("n_active")))


def rolling_active_incremental(ledger: DataFrame, new_events: DataFrame,
                               key: str = "user_id", ts_col: str = "ts",
                               days: int = 7) -> DataFrame:
    """Nightly-pipeline WAU/MAU: fold an event batch into a persisted
    :func:`active_days` ledger and recompute the rolling count ONLY
    for days the batch can affect — every day from the batch's first
    activity day onward (a batch day lands in the trailing windows of
    the following ``days`` days; recomputing the whole suffix keeps
    the contract simple and is identical on that range to the full
    recompute, the q271 index-vs-oneshot identity contract).

    Cost is O(batch + ledger rows in the affected trailing window):
    the merge probes only the batch's days, and the expansion scans
    ledger rows from ``days - 1`` days before the first affected day
    — with a day-partitioned ledger both are partition-pruned scans;
    the event history is never re-read.  Late/out-of-order batches
    work (the affected range starts at the EARLIEST batch day).

    Returns (day TIMESTAMP, n_active BIGINT) for affected days only;
    callers overwrite exactly those days of the serving table."""
    merged = active_days_merge(ledger, new_events, key, ts_col)
    lo = (active_days(new_events, key, ts_col)
          .agg(F.min("day").alias("__lo")))
    clipped = (merged.crossJoin(F.broadcast(lo))
               .filter(F.col("day") >=
                       F.col("__lo") - F.make_interval(days=F.lit(days - 1)))
               .select(key, "day"))
    return (rolling_active_from_days(clipped, key, days)
            .crossJoin(F.broadcast(lo))
            .filter(F.col("day") >= F.col("__lo"))
            .select("day", "n_active"))


def rolling_active_incremental_sql(table: str, cutoff: str,
                                   key: str = "user_id", ts_col: str = "ts",
                                   days: int = 7) -> str:
    """DuckDB twin of :func:`rolling_active_incremental` for a ledger
    built from ``ts < cutoff`` and a batch of ``ts >= cutoff``: the
    incremental answer must equal the FULL-table rolling count
    restricted to days >= the batch's first activity day — the
    identity is the point, so the oracle is deliberately the full
    recompute, not a re-derivation of the ledger algebra."""
    full = rolling_active_sql(table, key, ts_col, days)
    return f"""
WITH full_roll AS ({full}),
lo AS (SELECT MIN(date_trunc('day', CAST({ts_col} AS TIMESTAMP))) AS lo
       FROM {table} WHERE CAST({ts_col} AS TIMESTAMP) >= TIMESTAMP '{cutoff}')
SELECT day, n_active FROM full_roll, lo WHERE day >= lo.lo
"""


def rolling_active(events: DataFrame, key: str = "user_id",
                   ts_col: str = "ts", days: int = 7) -> DataFrame:
    """Rolling ``days``-day DISTINCT active keys per day (WAU for
    days=7, MAU for 30): for every day in the observed range, how many
    distinct keys had at least one event in the trailing window ending
    that day.

    Sliding DISTINCT cannot ride a window frame (distinct state is not
    mergeable across frame slides), and per-key history arrays are the
    anti-pattern; the scalable idiom is dedup to (key, day) — one
    partial-aggregated shuffle whose volume is activity-bounded — then
    the INTERVAL SWEEP of :func:`rolling_active_from_days`: per-key
    coverage runs, ±1 boundary deltas, prefix sum over the calendar
    day spine.  Days beyond the observed max are clipped, so the tail
    day never reports a phantom window.

    Returns (day TIMESTAMP, n_active BIGINT) for every day from the
    first observed activity day to the last — days with no activity in
    their whole trailing window are absent (no zero rows)."""
    return rolling_active_from_days(active_days(events, key, ts_col),
                                    key, days)


def rolling_active_sql(table: str, key: str = "user_id",
                       ts_col: str = "ts", days: int = 7) -> str:
    """DuckDB twin of :func:`rolling_active`."""
    return f"""
WITH daily AS (
  SELECT DISTINCT {key},
         date_trunc('day', CAST({ts_col} AS TIMESTAMP)) AS d
  FROM {table}
),
mx AS (SELECT MAX(d) AS max_d FROM daily),
covering AS (
  SELECT {key}, d + to_days(CAST(o AS INTEGER)) AS day
  FROM daily, range(0, {days}) r(o), mx
  WHERE d + to_days(CAST(o AS INTEGER)) <= mx.max_d
)
SELECT day, CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_active
FROM covering GROUP BY day
"""


def rolling_active_hll(events: DataFrame, key: str = "user_id",
                       ts_col: str = "ts", days: int = 7) -> DataFrame:
    """APPROXIMATE rolling actives from per-day HLL sketches — the
    100 TB form of :func:`rolling_active`: per-day state is m=64
    registers REGARDLESS of key cardinality, where the exact form's
    (key, day) relation grows with activity (10⁹ users × 30 days =
    3·10¹⁰ ledger rows; this is 30 × 64).

    Shape: one partial-aggregated groupBy builds (day, bucket,
    register); the OFFSET EXPANSION then fans out the ≤ days×64-row
    REGISTER relation (not the stream, not the ledger) and merges
    trailing windows by elementwise register MAX — HLL's lossless
    combine — so each day's estimate is exactly the sketch of its
    trailing window.  The estimator is the repo's integer-exact raw
    HLL (alpha = 709/1000, no libm, empty-bucket term folded into the
    final aggregate: operators/sketch.py banner), deterministic and
    bit-identical cross-engine — gate q287 hash-compares it.

    Returns (day TIMESTAMP, n_active_est BIGINT), ±~13% (1.04/√64)
    standard error; use the exact form when activity volume is
    manageable, this one when the ledger itself is the bottleneck."""
    from dbms_spark.operators.sketch import (_HLL_M, _HLL_WBITS,
                                             _hll_parts_expr)

    bucket, rho = _hll_parts_expr(F.col(key))
    daily = (events.select(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")).alias("day"),
        bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("day", "bucket").agg(F.max("rho").alias("register")))
    max_day = daily.agg(F.max("day").alias("__max"))
    cov = (daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(days - 1))).alias("__o"),
        "day", "bucket", "register")
        .select((F.col("day") + F.make_interval(days=F.col("__o")))
                .alias("day"), "bucket", "register")
        .crossJoin(F.broadcast(max_day))
        .filter(F.col("day") <= F.col("__max"))
        .groupBy("day", "bucket").agg(F.max("register").alias("register")))
    scale = 1 << (_HLL_WBITS + 1)
    num = 709 * _HLL_M * _HLL_M * scale
    return cov.groupBy("day").agg(F.expr(
        f"CAST({num} DIV (1000 * ("
        f"SUM(CAST(POW(2, {_HLL_WBITS + 1} - register) AS BIGINT))"
        f" + ({_HLL_M} - COUNT(*)) * {scale})) AS BIGINT)")
        .alias("n_active_est"))


def rolling_active_hll_sql(table: str, key: str = "user_id",
                           ts_col: str = "ts", days: int = 7) -> str:
    """DuckDB twin of :func:`rolling_active_hll` (same md5 bucket/rho
    split and rational estimator as hll_ndv_by_sql)."""
    from dbms_spark.operators.sketch import (_HLL_M, _HLL_WBITS,
                                             _hll_parts_sql)

    bucket, rho = _hll_parts_sql(key)
    scale = 1 << (_HLL_WBITS + 1)
    num = 709 * _HLL_M * _HLL_M * scale
    return f"""
WITH daily AS (
  SELECT date_trunc('day', CAST({ts_col} AS TIMESTAMP)) AS day,
         {bucket} AS bucket, MAX({rho}) AS register
  FROM {table} GROUP BY 1, 2
),
mx AS (SELECT MAX(day) AS max_d FROM daily),
cov AS (
  SELECT day + to_days(CAST(o AS INTEGER)) AS day, bucket,
         MAX(register) AS register
  FROM daily, range(0, {days}) r(o), mx
  WHERE day + to_days(CAST(o AS INTEGER)) <= mx.max_d
  GROUP BY 1, 2
)
SELECT day,
       CAST({num} // (1000 * (
         SUM(CAST(2 ** ({_HLL_WBITS + 1} - register) AS BIGINT))
         + ({_HLL_M} - COUNT(*)) * {scale})) AS BIGINT) AS n_active_est
FROM cov GROUP BY day
"""


def retention_state(events: DataFrame, key: str = "user_id",
                    ts_col: str = "ts") -> tuple[DataFrame, DataFrame]:
    """:func:`retention_cohorts`'s mergeable state, as two key-bounded
    relations: ``first`` = (key, cohort_week TIMESTAMP) first-touch
    map (one row per ever-seen key) and ``acts`` = (key, week
    TIMESTAMP) distinct activity (one row per key-week).  Persist both
    (acts partitioned by week) and nightly batches fold in via
    :func:`retention_merge` — the event history is never re-read."""
    ts = F.col(ts_col).cast("timestamp")
    first = (events.groupBy(key)
             .agg(F.date_trunc("week", F.min(ts)).alias("cohort_week")))
    acts = (events.select(F.col(key), F.date_trunc("week", ts).alias("week"))
            .distinct())
    return first, acts


def retention_merge(first: DataFrame, acts: DataFrame,
                    new_events: DataFrame, key: str = "user_id",
                    ts_col: str = "ts") -> tuple[DataFrame, DataFrame]:
    """O(new-batch) intake of an event batch into persisted
    :func:`retention_state` relations.

    First-touch merge: the batch's own first-touch rows broadcast as
    the touched-key set; untouched ledger keys pass through with NO
    shuffle (broadcast anti-join is map-side), touched keys re-minimize
    over ledger row + batch row — an O(batch-keys) groupBy.  Handles
    late data: a batch event earlier than a key's recorded first touch
    moves the cohort back, exactly as a full recompute would.

    Activity merge: same day-probed append as
    :func:`active_days_merge`, on ISO weeks — the ledger is probed
    only on the batch's weeks (partition-pruned when week-partitioned).

    The broadcast assumes a batch's distinct keys fit in executor
    memory (a day's active users); for a backfill-sized batch drop
    the hint and let AQE pick the join."""
    bfirst, bacts = retention_state(new_events, key, ts_col)
    touched = F.broadcast(bfirst.select(key))
    upd = (first.join(touched, key, "left_semi").unionByName(bfirst)
           .groupBy(key).agg(F.min("cohort_week").alias("cohort_week")))
    merged_first = first.join(touched, key, "left_anti").unionByName(upd)
    batch_weeks = bacts.select("week").distinct()
    existing = acts.join(F.broadcast(batch_weeks), "week", "left_semi")
    fresh = bacts.join(existing, [key, "week"], "left_anti")
    return merged_first, acts.unionByName(fresh)


def retention_from_state(first: DataFrame, acts: DataFrame,
                         key: str = "user_id") -> DataFrame:
    """The retention triangle from :func:`retention_state` relations —
    one keyed join + one partial-aggregated groupBy, O(activity
    ledger), never touching raw events.  Output contract identical to
    :func:`retention_cohorts`."""
    return (acts.join(first, key)
            .select("cohort_week",
                    (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
                    .cast("bigint").alias("week_offset"),
                    F.col(key))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))


def retention_cohorts(events: DataFrame, key: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention triangle: users bucketed by first-touch week
    (cohort), counted in each later week they were active.

    Returns (cohort_week TIMESTAMP, week_offset BIGINT,
    n_users BIGINT): of the users whose first event fell in
    cohort_week, n_users were active week_offset weeks later
    (offset 0 is the cohort size itself).

    Shape: first-touch is one partial-aggregated groupBy (key-bounded
    output); activity weeks are one distinct over (key, week); the
    join back is keyed on ``key`` and the final count partial-
    aggregates on (cohort, offset) — nothing is ever per-event wide.
    Weeks are date_trunc ISO weeks (Monday) in both engines, so the
    day difference is always an exact multiple of 7."""
    return retention_from_state(*retention_state(events, key, ts_col),
                                key=key)


def retention_cohorts_sql(table: str, key: str = "user_id",
                          ts_col: str = "ts") -> str:
    """DuckDB twin of :func:`retention_cohorts`."""
    return f"""
WITH first AS (
  SELECT {key}, date_trunc('week', MIN(CAST({ts_col} AS TIMESTAMP))) AS cohort_week
  FROM {table} GROUP BY 1
),
acts AS (
  SELECT DISTINCT {key}, date_trunc('week', CAST({ts_col} AS TIMESTAMP)) AS w
  FROM {table}
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, w) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM acts JOIN first USING ({key})
GROUP BY 1, 2
"""


def activity_curve(events: DataFrame, key: str = "user_id",
                   ts_col: str = "ts", days: int = 28) -> DataFrame:
    """POWER-USER CURVE (the L28 shape): over the trailing ``days``
    window ending at the last observed activity day, how many keys
    were active on exactly 1, 2, …, ``days`` distinct days — the
    engagement-quality histogram behind "what fraction of our MAU is
    daily-habit users".  Returns the FULL 1..days spine
    (n_active_days, n_users), zero rows included, so a missing
    engagement band is visible rather than absent.

    Shape: the activity dedup (one partial-aggregated shuffle,
    activity-bounded — the same ledger rolling_active reads), a
    per-key count, and a ≤ days-row histogram; nothing touches raw
    events twice.  Day arithmetic on epoch-day BIGINTs (non-negative
    epochs, the repo floor-epoch contract)."""
    dl = (events.select(
        F.col(key),
        F.expr(f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) DIV 86400")
        .alias("__d")).distinct())
    mx = dl.agg(F.max("__d").alias("__mx"))
    counts = (dl.crossJoin(F.broadcast(mx))
              .filter(F.col("__d") > F.col("__mx") - days)
              .groupBy(key).agg(F.count(F.lit(1)).alias("n_active_days")))
    hist = (counts.groupBy("n_active_days")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))
    spine = events.sparkSession.range(1, days + 1).select(
        F.col("id").alias("n_active_days"))
    return (spine.join(hist, "n_active_days", "left")
            .select(F.col("n_active_days").cast("bigint")
                    .alias("n_active_days"),
                    F.coalesce("n_users", F.lit(0)).cast("bigint")
                    .alias("n_users")))


def activity_curve_sql(table: str, key: str = "user_id",
                       ts_col: str = "ts", days: int = 28) -> str:
    """DuckDB twin of :func:`activity_curve` (same truncated epoch
    days; ``//`` floors = DIV truncates on the non-negative epochs)."""
    d = (f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)"
         f" // 86400")
    return f"""
WITH dl AS (SELECT DISTINCT {key}, {d} AS d FROM {table}),
mx AS (SELECT MAX(d) AS mx FROM dl),
counts AS (
  SELECT {key}, COUNT(*) AS nd FROM dl, mx
  WHERE d > mx - {days} GROUP BY {key}
),
hist AS (SELECT nd, CAST(COUNT(*) AS BIGINT) AS n_users
         FROM counts GROUP BY nd)
SELECT CAST(r.n AS BIGINT) AS n_active_days,
       CAST(COALESCE(h.n_users, 0) AS BIGINT) AS n_users
FROM range(1, {days + 1}) r(n) LEFT JOIN hist h ON h.nd = r.n
"""


def cohort_value(events: DataFrame, key: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 bucket_days: int = 7) -> DataFrame:
    """COHORT LTV: cumulative value per acquisition cohort by age —
    the revenue sibling of :func:`retention_cohorts` ("the March
    cohort has produced X cents per ... by week N").  Cohort = the
    key's first activity day; age = whole ``bucket_days`` buckets
    since.  Returns (cohort_day TIMESTAMP, age_bucket, n_active_keys,
    cum_value_cents) — ages with no activity are absent (the
    cumulative value carries forward implicitly in the next present
    age), active-key counts are per age bucket, values fix-point to
    cents (integer-exact, the repo discipline).

    Shape: one (key) agg for cohort days, a key-join back (both sides
    key-partitioned), then a (cohort, age, key) partial-aggregated
    dedup+sum — the per-user pass that makes the following distinct
    count a PLAIN count (the rolling_active two-phase lesson: a
    grouped count_distinct would shuffle on the small (cohort, age)
    key and bottleneck on its few reduce groups) — and a per-cohort
    cumulative window over ≤ span/bucket_days rows per cohort."""
    ep_day = F.expr(f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG)"
                    " DIV 86400")
    base = events.select(
        F.col(key), ep_day.alias("__d"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("__c"))
    first = base.groupBy(key).agg(F.min("__d").alias("__cd"))
    aged = (base.join(first, key)
            .select(F.col(key), F.col("__cd"),
                    F.expr(f"(__d - __cd) DIV {bucket_days}")
                    .alias("__age"), F.col("__c")))
    per_user = (aged.groupBy("__cd", "__age", key)
                .agg(F.sum("__c").alias("__uc")))
    per = (per_user.groupBy("__cd", "__age")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_keys"),
                F.sum("__uc").alias("__v")))
    w = (Window.partitionBy("__cd").orderBy("__age")
         .rowsBetween(Window.unboundedPreceding, 0))
    return per.select(
        F.timestamp_seconds(F.col("__cd") * 86400).alias("cohort_day"),
        F.col("__age").cast("bigint").alias("age_bucket"),
        "n_active_keys",
        F.sum("__v").over(w).cast("bigint").alias("cum_value_cents"))


def cohort_value_sql(table: str, key: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     bucket_days: int = 7) -> str:
    """DuckDB twin of :func:`cohort_value` (same truncated epoch days
    and cent rounding; all DIV operands non-negative)."""
    d = (f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)"
         f" // 86400")
    return f"""
WITH base AS (
  SELECT {key}, {d} AS d,
         CAST(round({value_col} * 100) AS BIGINT) AS c
  FROM {table}
),
first AS (SELECT {key}, MIN(d) AS cd FROM base GROUP BY {key}),
aged AS (
  SELECT b.{key}, f.cd, (b.d - f.cd) // {bucket_days} AS age, b.c
  FROM base b JOIN first f USING ({key})
),
per_user AS (
  SELECT cd, age, {key}, SUM(c) AS uc FROM aged GROUP BY 1, 2, 3
),
per AS (
  SELECT cd, age, CAST(COUNT(*) AS BIGINT) AS n_active_keys,
         SUM(uc) AS v
  FROM per_user GROUP BY 1, 2
)
SELECT CAST(to_timestamp(cd * 86400) AS TIMESTAMP) AS cohort_day,
       CAST(age AS BIGINT) AS age_bucket, n_active_keys,
       CAST(SUM(v) OVER (PARTITION BY cd ORDER BY age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_value_cents
FROM per
"""


def rolling_agg(events: DataFrame, key: str = "user_id",
                ts_col: str = "ts", value_col: str = "value",
                days: int = 7, id_cols: list[str] | None = None) -> DataFrame:
    """Trailing time-RANGE window per key: for every event, the count
    of the key's events and the fixed-point sum of ``value_col`` over
    the ``days`` ending at (and including) that event — the rolling
    activity/spend feature block behind rate limits, churn features,
    and anomaly baselines.

    Returns the key, ``id_cols`` (pass the event id for a
    deterministic per-row identity), the timestamp, n_events_win
    BIGINT and sum_cents_win BIGINT (value summed as round(v*100)
    BIGINT — integer addition is order-free, so the window sum is
    bit-identical cross-engine where a double sum would depend on
    accumulation order).

    Shape: ONE sort-shuffle on (key, ts) and a linear range-frame scan
    per partition — Spark's RangeFrame keeps a sliding bound, state is
    the in-window rows, never the key's full history; a hot key costs
    its rows in one partition's sort, not an array cell.  The frame is
    epoch-second RANGE [now - days*86400 + 1, now]: a calendar-day
    frame would need session-zone day boundaries (DST-dependent);
    fixed seconds are engine- and zone-free."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    w = (Window.partitionBy(key).orderBy(epoch)
         .rangeBetween(-(days * 86400 - 1), 0))
    return events.select(
        F.col(key), *[F.col(c) for c in (id_cols or [])], F.col(ts_col),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_events_win"),
        F.sum(cents).over(w).cast("bigint").alias("sum_cents_win"))


def rolling_agg_sql(table: str, key: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", days: int = 7,
                    id_cols: list[str] | None = None) -> str:
    """DuckDB twin of :func:`rolling_agg`.  The RANGE frame orders by
    CAST(floor(epoch(...)) AS BIGINT) — the same WHOLE-SECOND integer
    key Spark's cast-to-long produces.  A bare ``epoch()`` would order
    by a fractional DOUBLE, and with microsecond-precision timestamps
    the frame membership diverges at window boundaries (an event
    86399.7 s back is inside a truncated-second frame but outside the
    fractional one); ``floor`` (not CAST of the double, which rounds)
    matches truncation for the positive epochs the tables carry."""
    ids = "".join(f"{c}, " for c in (id_cols or []))
    return f"""
SELECT {key}, {ids}CAST({ts_col} AS TIMESTAMP) AS {ts_col},
       CAST(COUNT(*) OVER w AS BIGINT) AS n_events_win,
       CAST(SUM(CAST(round({value_col} * 100) AS BIGINT)) OVER w AS BIGINT)
         AS sum_cents_win
FROM {table}
WINDOW w AS (PARTITION BY {key}
             ORDER BY CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)
             RANGE BETWEEN {days * 86400 - 1} PRECEDING AND CURRENT ROW)
"""


def rolling_agg_prefix(events: DataFrame, key: str = "user_id",
                       ts_col: str = "ts", value_col: str = "value",
                       days: int = 7,
                       id_cols: list[str] | None = None) -> DataFrame:
    """HOT-KEY-PROOF :func:`rolling_agg`: identical output contract,
    different physical shape.  Spark evaluates a bounded sliding RANGE
    frame by RE-AGGREGATING the buffer every time the lower bound
    moves, and a window partition cannot be split across tasks — so a
    bot account with 10⁶ events and a ~2·10⁵-row average frame costs
    ~10¹¹ operations in ONE task (measured quadratic:
    tools/event_skew_smoke.py, 50k→200k hot rows = 12.6→151.9 s).

    This form never slides: trailing(t) = prefix(t) − prefix(t − w),
    in three linear passes —

    1. cumulative count/sum per key ordered by epoch, RANGE unbounded
       → current row (Spark's growing-frame evaluator accumulates
       incrementally, O(rows), and ties at one epoch share the value);
    2. each event emits one PROBE row at position ``epoch − w``; the
       probe and anchor rows union and a second per-key pass takes
       ``last(anchor_cum, ignorenulls)`` over a ROWS unbounded →
       current frame — the merge-join trick that reads the cumulative
       series "as of" the window's exclusive lower bound (anchors at
       exactly ``epoch − w`` sort BEFORE the probe, matching the
       frame's [t−w+1, t] inclusion);
    3. the trailing aggregate is the difference, on the probe rows.

    Two sort-shuffles on the key instead of one — the price of
    linearity; for uniform keys :func:`rolling_agg` is cheaper, for
    skewed streams this form is the only one that finishes (10⁶-row
    hot key: sliding extrapolates to ~1 h, prefix measured in
    seconds).  Gate q283 pins it to the SAME oracle as q268."""
    ids = list(id_cols or [])
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    cw = (Window.partitionBy(key).orderBy("__e")
          .rangeBetween(Window.unboundedPreceding, 0))
    cum = (events
           .select(F.col(key), *[F.col(c) for c in ids], F.col(ts_col),
                   epoch.alias("__e"), cents.alias("__c"))
           .select(key, *ids, ts_col, "__e",
                   F.count(F.lit(1)).over(cw).cast("bigint").alias("__cn"),
                   F.sum("__c").over(cw).cast("bigint").alias("__cs")))
    win = days * 86400
    types = dict(cum.dtypes)
    null = {c: F.lit(None).cast(types[c]).alias(c)
            for c in ["__cn", "__cs", ts_col, *ids]}
    anchors = cum.select(
        key, F.col("__e").alias("__pos"), F.lit(0).alias("__probe"),
        F.col("__cn").alias("__acn"), F.col("__cs").alias("__acs"),
        *null.values())
    probes = cum.select(
        key, (F.col("__e") - F.lit(win)).alias("__pos"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast("bigint").alias("__acn"),
        F.lit(None).cast("bigint").alias("__acs"),
        "__cn", "__cs", ts_col, *ids)
    mw = (Window.partitionBy(key).orderBy("__pos", "__probe")
          .rowsBetween(Window.unboundedPreceding, 0))
    merged = (anchors.unionByName(probes)
              .select("*",
                      F.last("__acn", ignorenulls=True).over(mw)
                      .alias("__bn"),
                      F.last("__acs", ignorenulls=True).over(mw)
                      .alias("__bs")))
    return (merged.filter(F.col("__probe") == 1)
            .select(F.col(key), *[F.col(c) for c in ids], F.col(ts_col),
                    (F.col("__cn") - F.coalesce(F.col("__bn"), F.lit(0)))
                    .cast("bigint").alias("n_events_win"),
                    (F.col("__cs") - F.coalesce(F.col("__bs"), F.lit(0)))
                    .cast("bigint").alias("sum_cents_win")))


def rolling_anomaly(events: DataFrame, key: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value",
                    days: int = 7, k_sigma: int = 3, min_n: int = 5,
                    id_cols: list[str] | None = None) -> DataFrame:
    """Flag events whose value deviates more than ``k_sigma`` standard
    deviations from the key's OWN trailing baseline — the per-entity
    anomaly screen (spend spikes, error bursts) a global threshold
    cannot express.

    The baseline window is the ``days`` ending one second BEFORE the
    event (RANGE ... PRECEDING AND 1 PRECEDING): the candidate never
    contaminates its own baseline, and a burst of simultaneous
    anomalies cannot vouch for itself.  Events with fewer than
    ``min_n`` baseline rows are not judged (is_anomaly false,
    baseline_n reported — the caller sees why).

    Integer-exact WITHOUT sqrt or doubles: with cents c, baseline
    count n, sum s, sum-of-squares q,

        |z| > k  <=>  (n·c − s)² > k² · (n·q − s²)

    (both sides are n² times the squared-deviation comparison; n·q−s²
    = n²·σ².)  Squares overflow BIGINT at realistic magnitudes, so
    the comparison runs in DECIMAL(38,0) (HUGEINT on the oracle) —
    exact integers end to end, so the flag is bit-identical
    cross-engine, the same reason the MAD profile and BM25 avoid
    libm.

    Shape: identical to :func:`rolling_agg` — ONE (key, ts)
    sort-shuffle, three range-frame aggregates sharing the window."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    w = (Window.partitionBy(key).orderBy(epoch)
         .rangeBetween(-(days * 86400 - 1), -1))
    base = (events
            .withColumn("__c", cents)
            .withColumn("__n", F.count(F.lit(1)).over(w).cast("bigint"))
            .withColumn("__s", F.coalesce(F.sum("__c").over(w), F.lit(0))
                        .cast("bigint"))
            .withColumn("__q", F.coalesce(
                F.sum(F.col("__c") * F.col("__c")).over(w), F.lit(0))
                .cast("bigint")))
    dev = ("(CAST(__n AS DECIMAL(38,0)) * __c - __s)"
           " * (CAST(__n AS DECIMAL(38,0)) * __c - __s)")
    var = ("(CAST(__n AS DECIMAL(38,0)) * __q - CAST(__s AS DECIMAL(38,0))"
           " * __s)")
    return base.select(
        F.col(key), *[F.col(c) for c in (id_cols or [])], F.col(ts_col),
        F.col("__c").alias("cents"),
        F.col("__n").alias("baseline_n"),
        F.expr(f"__n >= {min_n} AND {dev} > {k_sigma * k_sigma} * {var}")
        .alias("is_anomaly"))


def rolling_anomaly_prefix(events: DataFrame, key: str = "user_id",
                           ts_col: str = "ts", value_col: str = "value",
                           days: int = 7, k_sigma: int = 3, min_n: int = 5,
                           id_cols: list[str] | None = None) -> DataFrame:
    """HOT-KEY-PROOF :func:`rolling_anomaly` — same prefix-minus-probe
    rewrite as :func:`rolling_agg_prefix` (see its quadratic-frame
    rationale), with two extra wrinkles for the self-excluding
    baseline frame [t−w+1, t−1]:

    - the UPPER bound is ``cum(t) − ties(t)``: subtracting the row's
      whole same-epoch block from its own cumulative value excludes
      the candidate AND its simultaneous burst, exactly like the
      sliding frame's ``1 PRECEDING`` upper bound (one hash-partition
      pass over (key, epoch), no sort);
    - the LOWER bound reuses the as-of probe at ``epoch − w``.

    The σ comparison is then the same integer-exact DECIMAL(38,0)
    arithmetic as :func:`rolling_anomaly`; gate q284 pins this form
    to the SAME oracle as q273."""
    ids = list(id_cols or [])
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    cw = (Window.partitionBy(key).orderBy("__e")
          .rangeBetween(Window.unboundedPreceding, 0))
    tw = Window.partitionBy(key, "__e")
    q_ = F.col("__c") * F.col("__c")
    cum = (events
           .select(F.col(key), *[F.col(c) for c in ids], F.col(ts_col),
                   epoch.alias("__e"), cents.alias("__c"))
           .select(key, *ids, ts_col, "__e", "__c",
                   F.count(F.lit(1)).over(cw).cast("bigint").alias("__cn"),
                   F.sum("__c").over(cw).cast("bigint").alias("__cs"),
                   F.sum(q_).over(cw).cast("bigint").alias("__cq"),
                   (F.count(F.lit(1)).over(cw) - F.count(F.lit(1)).over(tw))
                   .cast("bigint").alias("__un"),
                   (F.sum("__c").over(cw) - F.sum("__c").over(tw))
                   .cast("bigint").alias("__us"),
                   (F.sum(q_).over(cw) - F.sum(q_).over(tw))
                   .cast("bigint").alias("__uq")))
    win = days * 86400
    types = dict(cum.dtypes)
    null = {c: F.lit(None).cast(types[c]).alias(c)
            for c in ["__un", "__us", "__uq", "__c", ts_col, *ids]}
    # anchor cum INCLUDES its epoch's ties (the probe's lower bound is
    # <= e-w, tie-inclusive), while the probe carries the tie-EXCLUDED
    # upper values.
    anchors = cum.select(
        key, F.col("__e").alias("__pos"), F.lit(0).alias("__probe"),
        F.col("__cn").alias("__an"), F.col("__cs").alias("__as"),
        F.col("__cq").alias("__aq"), *null.values())
    probes = cum.select(
        key, (F.col("__e") - F.lit(win)).alias("__pos"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast("bigint").alias("__an"),
        F.lit(None).cast("bigint").alias("__as"),
        F.lit(None).cast("bigint").alias("__aq"),
        "__un", "__us", "__uq", "__c", ts_col, *ids)
    mw = (Window.partitionBy(key).orderBy("__pos", "__probe")
          .rowsBetween(Window.unboundedPreceding, 0))
    merged = (anchors.unionByName(probes)
              .select("*",
                      F.last("__an", ignorenulls=True).over(mw)
                      .alias("__bn"),
                      F.last("__as", ignorenulls=True).over(mw)
                      .alias("__bs"),
                      F.last("__aq", ignorenulls=True).over(mw)
                      .alias("__bq")))
    base = (merged.filter(F.col("__probe") == 1)
            .select(F.col(key), *[F.col(c) for c in ids], F.col(ts_col),
                    F.col("__c"),
                    (F.col("__un") - F.coalesce(F.col("__bn"), F.lit(0)))
                    .cast("bigint").alias("__n"),
                    (F.col("__us") - F.coalesce(F.col("__bs"), F.lit(0)))
                    .cast("bigint").alias("__s"),
                    (F.col("__uq") - F.coalesce(F.col("__bq"), F.lit(0)))
                    .cast("bigint").alias("__q")))
    dev = ("(CAST(__n AS DECIMAL(38,0)) * __c - __s)"
           " * (CAST(__n AS DECIMAL(38,0)) * __c - __s)")
    var = ("(CAST(__n AS DECIMAL(38,0)) * __q - CAST(__s AS DECIMAL(38,0))"
           " * __s)")
    return base.select(
        F.col(key), *[F.col(c) for c in ids], F.col(ts_col),
        F.col("__c").alias("cents"),
        F.col("__n").alias("baseline_n"),
        F.expr(f"__n >= {min_n} AND {dev} > {k_sigma * k_sigma} * {var}")
        .alias("is_anomaly"))


def rolling_anomaly_sql(table: str, key: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        days: int = 7, k_sigma: int = 3, min_n: int = 5,
                        id_cols: list[str] | None = None) -> str:
    """DuckDB twin of :func:`rolling_anomaly` (same floor(epoch)
    whole-second integer frame key as :func:`rolling_agg_sql` — see
    the divergence note there)."""
    ids = "".join(f"{c}, " for c in (id_cols or []))
    dev = ("(CAST(n AS HUGEINT) * c - s) * (CAST(n AS HUGEINT) * c - s)")
    var = ("(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)")
    return f"""
WITH b AS (
  SELECT {key}, {ids}CAST({ts_col} AS TIMESTAMP) AS {ts_col},
         CAST(round({value_col} * 100) AS BIGINT) AS c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(COALESCE(SUM(CAST(round({value_col} * 100) AS BIGINT)) OVER w,
                       0) AS BIGINT) AS s,
         CAST(COALESCE(SUM(CAST(round({value_col} * 100) AS BIGINT)
                           * CAST(round({value_col} * 100) AS BIGINT))
                       OVER w, 0) AS BIGINT) AS q
  FROM {table}
  WINDOW w AS (PARTITION BY {key}
               ORDER BY CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP)))
                             AS BIGINT)
               RANGE BETWEEN {days * 86400 - 1} PRECEDING AND 1 PRECEDING)
)
SELECT {key}, {ids}{ts_col}, c AS cents, n AS baseline_n,
       (n >= {min_n} AND {dev} > {k_sigma * k_sigma} * {var}) AS is_anomaly
FROM b
"""


def top_event_paths(events: DataFrame, n: int = 3, k: int = 20,
                    key: str = "user_id", ts_col: str = "ts",
                    type_col: str = "event_type",
                    session_col: str | None = None,
                    tiebreak: list[str] | None = None) -> DataFrame:
    """The ``k`` most common ``n``-step event-type sequences
    (consecutive within a user — or within a session when
    ``session_col`` is given, keeping paths from bridging a session
    gap).  Returns (path STRING '->'-joined, n_paths BIGINT,
    rank BIGINT), ordered by count desc then path.

    Shape: lead() windows over (key[, session]) partitions — state is
    n-1 rows per partition, never a collected history array; the
    count is one partial-aggregated groupBy on the path string and
    the top-k a distributed TakeOrdered.  ``tiebreak`` columns make
    the within-partition order total under duplicate timestamps
    (determinism for differential testing).

    Rows with NULL ``type_col`` are dropped BEFORE the window in both
    this form and the SQL twin: concat_ws silently skips NULLs while
    SQL '||' nulls the whole path, so a NULL event mid-window would
    yield a shortened 'a->c' here and a NULL path in the oracle — the
    up-front filter makes both engines see identical sequences (a
    NULL-typed event also shouldn't silently bridge its neighbours
    into a fake consecutive pair, so the drop is the semantic we
    want, not just the portable one)."""
    events = events.filter(F.col(type_col).isNotNull())
    parts = [key] + ([session_col] if session_col else [])
    order = [F.asc(ts_col)] + [F.asc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*parts).orderBy(*order)
    steps = [F.col(type_col)] + [F.lead(type_col, i).over(w)
                                 for i in range(1, n)]
    paths = (events
             .select(F.concat_ws("->", *steps).alias("path"),
                     steps[-1].isNotNull().alias("__full"))
             .filter("__full")
             .groupBy("path")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths")))
    topk = paths.orderBy(F.desc("n_paths"), F.asc("path")).limit(k)
    rw = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return topk.select("path", "n_paths",
                       F.row_number().over(rw).cast("bigint").alias("rank"))


def top_event_paths_sql(table: str, n: int = 3, k: int = 20,
                        key: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        session_col: str | None = None,
                        tiebreak: list[str] | None = None) -> str:
    """DuckDB twin of :func:`top_event_paths`, including the
    session-scoped form (``session_col`` joins the window partition
    so paths never bridge a session gap — pair with
    :func:`dbms_spark.operators.joins.sessionize_sql` as the inner
    table).  NULL ``type_col`` rows are dropped up front, mirroring
    the DataFrame form (see its NULL note)."""
    parts = ", ".join([key] + ([session_col] if session_col else []))
    ob = ", ".join([f"CAST({ts_col} AS TIMESTAMP)"] + list(tiebreak or []))
    leads = [type_col] + [f"lead({type_col}, {i}) OVER w" for i in range(1, n)]
    concat = " || '->' || ".join(leads)
    last = f"lead({type_col}, {n - 1}) OVER w"
    return f"""
WITH stepped AS (
  SELECT {concat} AS path, {last} IS NOT NULL AS is_complete
  FROM {table}
  WHERE {type_col} IS NOT NULL
  WINDOW w AS (PARTITION BY {parts} ORDER BY {ob})
),
counted AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM stepped WHERE is_complete GROUP BY 1
)
SELECT path, n_paths,
       CAST(ROW_NUMBER() OVER (ORDER BY n_paths DESC, path) AS BIGINT) AS rank
FROM counted
ORDER BY n_paths DESC, path
LIMIT {k}
"""


def attribute_conversions(events: DataFrame, conversion_type: str,
                          touch_types: list[str], key: str = "user_id",
                          ts_col: str = "ts", type_col: str = "event_type",
                          lookback_seconds: int | None = None,
                          tiebreak: list[str] | None = None) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: credit each conversion event to the
    key's most recent strictly-preceding touch event (``touch_types``),
    optionally only within ``lookback_seconds`` — the "which campaign
    gets the sale" join every marketing pipeline runs.  Unattributed
    conversions surface with NULL touch columns rather than vanishing
    (the report needs the organic share too).

    Returns (key, tiebreak..., conv_ts, touch_type, touch_ts,
    lag_seconds) — one row per conversion event.

    Shape: the backward as-of join INSIDE one event stream needs no
    join at all — ONE (key, ts) sort-shuffle and a ROWS frame ending
    1 row before the current: ``last(touch_ts, ignorenulls)`` over it
    reads the most recent preceding touch in O(rows) (the frame only
    ever appends).  "Preceding" is strict in (ts, tiebreak...) order —
    pass the event id to make simultaneous-event behavior total and
    cross-engine deterministic.  The lookback clips AFTER the window
    (a too-old touch NULLs out, exactly like no touch); lag uses
    truncated whole-second epochs on both engines (the q268 floor
    lesson)."""
    tb = list(tiebreak or [])
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    is_touch = F.col(type_col).isin(touch_types)
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts_col).cast("timestamp"),
                  *[F.asc(c) for c in tb])
         .rowsBetween(Window.unboundedPreceding, -1))
    base = (events
            .withColumn("__tt", F.last(F.when(is_touch, F.col(type_col)),
                                       ignorenulls=True).over(w))
            .withColumn("__tts", F.last(
                F.when(is_touch, F.col(ts_col).cast("timestamp")),
                ignorenulls=True).over(w))
            .filter(F.col(type_col) == conversion_type))
    if lookback_seconds is not None:
        stale = (F.col("__tts").cast("long")
                 < epoch - F.lit(lookback_seconds))
        base = (base
                .withColumn("__tt", F.when(~stale, F.col("__tt")))
                .withColumn("__tts", F.when(~stale, F.col("__tts"))))
    return base.select(
        F.col(key), *[F.col(c) for c in tb],
        F.col(ts_col).cast("timestamp").alias("conv_ts"),
        F.col("__tt").alias("touch_type"),
        F.col("__tts").alias("touch_ts"),
        (epoch - F.col("__tts").cast("long")).cast("bigint")
        .alias("lag_seconds"))


def attribute_conversions_sql(table: str, conversion_type: str,
                              touch_types: list[str], key: str = "user_id",
                              ts_col: str = "ts",
                              type_col: str = "event_type",
                              lookback_seconds: int | None = None,
                              tiebreak: list[str] | None = None) -> str:
    """DuckDB twin of :func:`attribute_conversions` (same ROWS frame,
    same strict (ts, tiebreak) order, same floor-epoch lag)."""
    tb = list(tiebreak or [])
    tbsel = "".join(f"{c}, " for c in tb)
    ob = ", ".join([f"CAST({ts_col} AS TIMESTAMP)"] + tb)
    touches = ", ".join(_q(t) for t in touch_types)
    ep = f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)"
    tep = "CAST(floor(epoch(tts)) AS BIGINT)"
    stale = ("" if lookback_seconds is None else
             f", CASE WHEN {tep} < ep - {lookback_seconds} "
             f"THEN NULL ELSE tt END AS tt2"
             f", CASE WHEN {tep} < ep - {lookback_seconds} "
             f"THEN NULL ELSE tts END AS tts2")
    tt, tts = ("tt2", "tts2") if lookback_seconds is not None else ("tt",
                                                                    "tts")
    return f"""
WITH marked AS (
  SELECT {key}, {tbsel}{type_col}, CAST({ts_col} AS TIMESTAMP) AS {ts_col},
         {ep} AS ep,
         last_value(CASE WHEN {type_col} IN ({touches})
                         THEN {type_col} END IGNORE NULLS) OVER w AS tt,
         last_value(CASE WHEN {type_col} IN ({touches})
                         THEN CAST({ts_col} AS TIMESTAMP) END
                    IGNORE NULLS) OVER w AS tts
  FROM {table}
  WINDOW w AS (PARTITION BY {key} ORDER BY {ob}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (
  SELECT *{stale} FROM marked WHERE {type_col} = {_q(conversion_type)}
)
SELECT {key}, {tbsel}{ts_col} AS conv_ts, {tt} AS touch_type,
       {tts} AS touch_ts,
       CAST(ep - CAST(floor(epoch({tts})) AS BIGINT) AS BIGINT)
         AS lag_seconds
FROM conv
"""


def heartbeat_gaps(events: DataFrame, key: str = "user_id",
                   ts_col: str = "ts", max_gap_seconds: int = 3600,
                   tiebreak: list[str] | None = None) -> DataFrame:
    """SILENCE DETECTION: per-key periods where consecutive events are
    more than ``max_gap_seconds`` apart — the "sensor went dark /
    device stopped heartbeating" screen, the event-time sibling of
    the id-space :func:`dbms_spark.operators.validate.sequence_gaps`
    (that one finds missing IDs, this one missing TIME).

    Returns (key, gap_start, gap_end, gap_seconds) — one row per
    silent period, gap_seconds in truncated whole seconds (the floor
    rule both engines share).

    Shape: ONE (key, ts) sort-shuffle and a lag() window — O(rows),
    no self-join, no sliding frame; the output is bounded by the
    number of silent periods, not events."""
    tb = list(tiebreak or [])
    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(key).orderBy(ts, *[F.asc(c) for c in tb])
    prev = F.lag(ts).over(w)
    return (events
            .select(F.col(key), prev.alias("gap_start"),
                    ts.alias("gap_end"),
                    (ts.cast("long") - prev.cast("long"))
                    .cast("bigint").alias("gap_seconds"))
            .filter(F.col("gap_seconds") > max_gap_seconds))


def heartbeat_gaps_sql(table: str, key: str = "user_id",
                       ts_col: str = "ts", max_gap_seconds: int = 3600,
                       tiebreak: list[str] | None = None) -> str:
    """DuckDB twin of :func:`heartbeat_gaps` (same lag window, same
    floor-epoch whole-second delta)."""
    ob = ", ".join([f"CAST({ts_col} AS TIMESTAMP)"] + list(tiebreak or []))
    ep = f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)"
    return f"""
WITH lagged AS (
  SELECT {key},
         lag(CAST({ts_col} AS TIMESTAMP)) OVER w AS gap_start,
         CAST({ts_col} AS TIMESTAMP) AS gap_end,
         {ep} - lag({ep}) OVER w AS gap_seconds
  FROM {table}
  WINDOW w AS (PARTITION BY {key} ORDER BY {ob})
)
SELECT {key}, gap_start, gap_end, CAST(gap_seconds AS BIGINT) AS gap_seconds
FROM lagged WHERE gap_seconds > {max_gap_seconds}
"""


def attribution_multi_touch(events: DataFrame, conversion_type: str,
                            touch_types: list[str], key: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type",
                            lookback_seconds: int = 7 * 86400,
                            id_col: str = "event_id",
                            max_touches: int | None = None) -> DataFrame:
    """MULTI-TOUCH attribution: every touch in the lookback window
    before each conversion gets credit, split integer-exactly —
    each touch receives floor(1e6 / n) ppm and the LAST (most recent)
    touch absorbs the remainder, so per-conversion weights always sum
    to exactly 1,000,000 (the property downstream spend-allocation
    joins rely on; doubles would drift).

    Returns (key, conv_id, conv_ts, touch_id, touch_type, touch_ts,
    n_touches, weight_ppm), one row per (conversion, touch) pair.

    Shape, uncapped: one key equi-join between the conversion and
    touch relations with the lookback range predicate — the join
    necessarily forms convs × touches pairs per key before the
    filter, which is the workload's intrinsic output when touch
    density is low but a measured straggler when it is not
    (tools/event_skew_smoke.py round8: 45.6 s at 5·10⁶ events over
    10⁴ users).

    ``max_touches`` therefore switches ALGORITHM, not just output:
    touches get per-key sequence numbers (one ordered window pass),
    each conversion reads its preceding-touch count from the same
    pass, and a bounded OFFSET EXPLODE joins each conversion to
    exactly its last ≤ N touch seqs on (key, seq) — the cross
    product is never formed (same smoke: 38.5 s post-join-capped →
    seq-join form measured in single-digit seconds).  Equivalent by
    construction: in-window touches are the NEWEST preceding touches,
    so the N most recent preceding touches filtered to the window ==
    the N most recent in-window touches.  "Preceding" is strict in
    (ts, id) lexicographic order, so same-timestamp events resolve
    deterministically."""
    strictly_before = (
        (F.col("touch_ts") < F.col("conv_ts"))
        | ((F.col("touch_ts") == F.col("conv_ts"))
           & (F.col("touch_id") < F.col("conv_id"))))
    in_window = (F.col("touch_ts").cast("long")
                 >= F.col("conv_ts").cast("long") - F.lit(lookback_seconds))
    if max_touches is None:
        convs = (events.filter(F.col(type_col) == conversion_type)
                 .select(F.col(key),
                         F.col(id_col).alias("conv_id"),
                         F.col(ts_col).cast("timestamp").alias("conv_ts")))
        touches = (events.filter(F.col(type_col).isin(touch_types))
                   .select(F.col(key),
                           F.col(id_col).alias("touch_id"),
                           F.col(type_col).alias("touch_type"),
                           F.col(ts_col).cast("timestamp")
                           .alias("touch_ts")))
        pairs = convs.join(touches, key).filter(strictly_before & in_window)
    else:
        is_touch = F.col(type_col).isin(touch_types)
        relevant = events.filter(is_touch
                                 | (F.col(type_col) == conversion_type))
        w = (Window.partitionBy(key)
             .orderBy(F.col(ts_col).cast("timestamp"), F.col(id_col))
             .rowsBetween(Window.unboundedPreceding, 0))
        # two consumers (touch relation + conversion relation) read
        # the seq window — materialize once or the 1-pass sort runs
        # twice (the funnel localCheckpoint recipe)
        seqd = (relevant
                .select(F.col(key), F.col(id_col), F.col(type_col),
                        F.col(ts_col).cast("timestamp").alias(ts_col))
                .withColumn(
                    "__seq", F.sum(F.when(is_touch, 1).otherwise(0)).over(w))
                .localCheckpoint())
        touches = (seqd.filter(is_touch)
                   .select(F.col(key), F.col("__seq").alias("seq"),
                           F.col(id_col).alias("touch_id"),
                           F.col(type_col).alias("touch_type"),
                           F.col(ts_col).cast("timestamp")
                           .alias("touch_ts")))
        pairs = (seqd.filter(F.col(type_col) == conversion_type)
                 .filter(F.col("__seq") > 0)
                 .select(F.col(key),
                         F.col(id_col).alias("conv_id"),
                         F.col(ts_col).cast("timestamp").alias("conv_ts"),
                         F.explode(F.sequence(
                             F.greatest(F.lit(1),
                                        F.col("__seq")
                                        - F.lit(max_touches - 1)),
                             F.col("__seq"))).alias("seq"))
                 .join(touches, [key, "seq"]).drop("seq")
                 .filter(strictly_before & in_window))
    cw = Window.partitionBy(key, "conv_id")
    lastw = (Window.partitionBy(key, "conv_id")
             .orderBy(F.desc("touch_ts"), F.desc("touch_id")))
    n = F.count(F.lit(1)).over(cw).cast("bigint")
    rn = F.row_number().over(lastw)
    base = F.expr("CAST(1000000 AS BIGINT) DIV __n")
    return (pairs
            .withColumn("__n", n)
            .withColumn("__rn", rn)
            .select(F.col(key), "conv_id", "conv_ts", "touch_id",
                    "touch_type", "touch_ts",
                    F.col("__n").alias("n_touches"),
                    F.when(F.col("__rn") == 1,
                           base + F.expr("1000000 % __n"))
                    .otherwise(base).cast("bigint").alias("weight_ppm")))


def attribution_multi_touch_sql(table: str, conversion_type: str,
                                touch_types: list[str],
                                key: str = "user_id", ts_col: str = "ts",
                                type_col: str = "event_type",
                                lookback_seconds: int = 7 * 86400,
                                id_col: str = "event_id",
                                max_touches: int | None = None) -> str:
    """DuckDB twin of :func:`attribution_multi_touch`."""
    touches = ", ".join(_q(t) for t in touch_types)
    cap = (f"QUALIFY ROW_NUMBER() OVER (PARTITION BY c.{key}, conv_id "
           f"ORDER BY touch_ts DESC, touch_id DESC) <= {max_touches}"
           if max_touches is not None else "")
    return f"""
WITH convs AS (
  SELECT {key}, {id_col} AS conv_id,
         CAST({ts_col} AS TIMESTAMP) AS conv_ts
  FROM {table} WHERE {type_col} = {_q(conversion_type)}
),
touches AS (
  SELECT {key}, {id_col} AS touch_id, {type_col} AS touch_type,
         CAST({ts_col} AS TIMESTAMP) AS touch_ts
  FROM {table} WHERE {type_col} IN ({touches})
),
pairs AS (
  SELECT c.{key}, conv_id, conv_ts, touch_id, touch_type, touch_ts
  FROM convs c JOIN touches t USING ({key})
  WHERE (touch_ts < conv_ts OR (touch_ts = conv_ts AND touch_id < conv_id))
    AND CAST(floor(epoch(touch_ts)) AS BIGINT)
        >= CAST(floor(epoch(conv_ts)) AS BIGINT) - {lookback_seconds}
  {cap}
)
SELECT {key}, conv_id, conv_ts, touch_id, touch_type, touch_ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_touches,
       CAST(CASE WHEN ROW_NUMBER() OVER
                      (PARTITION BY {key}, conv_id
                       ORDER BY touch_ts DESC, touch_id DESC) = 1
                 THEN 1000000 // COUNT(*) OVER w + 1000000 % COUNT(*) OVER w
                 ELSE 1000000 // COUNT(*) OVER w END AS BIGINT)
         AS weight_ppm
FROM pairs
WINDOW w AS (PARTITION BY {key}, conv_id)
"""


def funnel_conversion(events: DataFrame, steps: list[str],
                      key: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """The funnel DROP-OFF report: :func:`funnel`'s counts plus
    integer-ppm step-to-step and from-top conversion rates — the
    numbers a funnel dashboard actually shows ("62% of viewers
    click, 8% of viewers buy").  Rates are NULL where the upstream
    count is zero (0/0 is unreported, not fake-100%).

    Pure composition over the ≤ len(steps)-row funnel output; adds
    one trivial window over that tiny relation."""
    counts = funnel(events, steps, key, ts_col, type_col)
    w = Window.orderBy("step")
    base = (counts
            .withColumn("__prev", F.lag("n_users").over(w))
            .withColumn("__first", F.first("n_users").over(w)))
    # integer DIV, not '/', so the ppm is exact like the oracle's //
    return base.select(
        "step", "event_type", "n_users",
        F.expr("CASE WHEN __prev > 0 THEN CAST(1000000 AS BIGINT)"
               " * n_users DIV __prev END").cast("bigint")
        .alias("conv_from_prev_ppm"),
        F.expr("CASE WHEN __first > 0 THEN CAST(1000000 AS BIGINT)"
               " * n_users DIV __first END").cast("bigint")
        .alias("conv_from_first_ppm"))


def funnel_conversion_sql(table: str, steps: list[str],
                          key: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type") -> str:
    """DuckDB twin of :func:`funnel_conversion`."""
    inner = funnel_sql(table, steps, key, ts_col, type_col)
    return f"""
WITH counts AS ({inner})
SELECT step, event_type, n_users,
       CAST(CASE WHEN lag(n_users) OVER (ORDER BY step) > 0
                 THEN CAST(1000000 AS BIGINT) * n_users
                      // lag(n_users) OVER (ORDER BY step) END AS BIGINT)
         AS conv_from_prev_ppm,
       CAST(CASE WHEN first_value(n_users) OVER (ORDER BY step) > 0
                 THEN CAST(1000000 AS BIGINT) * n_users
                      // first_value(n_users) OVER (ORDER BY step) END
            AS BIGINT) AS conv_from_first_ppm
FROM counts
"""


def funnel_trend(events: DataFrame, steps: list[str],
                 key: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 period: str = "week") -> DataFrame:
    """FUNNEL TREND: :func:`funnel`'s ordered-progression counts split
    by the ``period`` (ISO week/day/month) of each key's STEP-0
    anchor — "is the signup→purchase funnel improving for newer
    cohorts", the time axis the single funnel cannot show.  Cohort
    membership is pinned at step 0, so a key counts in exactly one
    period at every step and each period's counts are non-increasing
    down the steps.

    Returns (period TIMESTAMP, step BIGINT, event_type STRING,
    n_users BIGINT) — periods with no step-0 anchors are absent;
    later steps' zero cells are absent too (the triangle shape, like
    retention).

    Shape: the same chained key-bounded survivor relations as
    :func:`funnel`, except step 0 keeps its anchor period and every
    survivor carries it through the joins — counts partial-aggregate
    on (period,) instead of one global row, still bounded by
    distinct periods × steps."""
    if not steps:
        raise ValueError("funnel_trend needs at least one step")
    reached: DataFrame | None = None
    counts: list[DataFrame] = []
    for i, step in enumerate(steps):
        ev_i = (events.filter(F.col(type_col) == step)
                .select(F.col(key), F.col(ts_col).alias("__ts")))
        if reached is None:
            cur = (ev_i.groupBy(key).agg(F.min("__ts").alias("__t"))
                   .withColumn("__p", F.date_trunc(
                       period, F.col("__t").cast("timestamp"))))
        else:
            cur = (ev_i.join(reached.select(key, "__t", "__p"), key)
                   .filter(F.col("__ts") > F.col("__t"))
                   .groupBy(key, "__p").agg(F.min("__ts").alias("__t")))
        reached = cur.localCheckpoint()
        counts.append(reached.groupBy("__p").agg(
            F.lit(i).cast("bigint").alias("step"),
            F.lit(step).alias("event_type"),
            F.count(F.lit(1)).cast("bigint").alias("n_users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select(F.col("__p").alias("period"), "step", "event_type",
                      "n_users")


def funnel_trend_sql(table: str, steps: list[str], key: str = "user_id",
                     ts_col: str = "ts", type_col: str = "event_type",
                     period: str = "week") -> str:
    """DuckDB twin of :func:`funnel_trend` (the funnel_sql CTE chain
    carrying the step-0 anchor period through every join)."""
    ctes, selects = [], []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {key}, MIN(CAST({ts_col} AS TIMESTAMP)) AS t,"
                f" date_trunc({_q(period)},"
                f" MIN(CAST({ts_col} AS TIMESTAMP))) AS p"
                f" FROM {table} WHERE {type_col} = {_q(step)} GROUP BY 1)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{key}, s{i - 1}.p,"
                f" MIN(CAST(e.{ts_col} AS TIMESTAMP)) AS t"
                f" FROM {table} e JOIN s{i - 1} USING ({key})"
                f" WHERE e.{type_col} = {_q(step)}"
                f" AND CAST(e.{ts_col} AS TIMESTAMP) > s{i - 1}.t"
                f" GROUP BY 1, 2)")
        selects.append(
            f"SELECT p AS period, CAST({i} AS BIGINT) AS step,"
            f" {_q(step)} AS event_type,"
            f" CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i} GROUP BY 1")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def last_seen(events: DataFrame, key: str = "user_id",
              ts_col: str = "ts") -> DataFrame:
    """The (key, last_seen TIMESTAMP) relation — one row per
    ever-seen key.  Mergeable state (max is commutative/idempotent,
    so ANY batch order is exact); the liveness ledger behind
    :func:`offline_keys` and the streaming last-seen store."""
    return events.groupBy(key).agg(
        F.max(F.col(ts_col).cast("timestamp")).alias("last_seen"))


def last_seen_merge(ledger: DataFrame, new_events: DataFrame,
                    key: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """O(batch) intake: the batch's per-key max broadcasts as the
    touched-key set; untouched ledger keys pass through with no
    shuffle (broadcast anti-join is map-side), touched keys
    re-maximize — the retention_merge recipe with max instead of
    min."""
    batch = last_seen(new_events, key, ts_col)
    touched = F.broadcast(batch.select(key))
    upd = (ledger.join(touched, key, "left_semi").unionByName(batch)
           .groupBy(key).agg(F.max("last_seen").alias("last_seen")))
    return ledger.join(touched, key, "left_anti").unionByName(upd)


def offline_keys(ledger: DataFrame, as_of: str,
                 threshold_seconds: int = 86400,
                 key: str = "user_id") -> DataFrame:
    """Keys whose last activity is more than ``threshold_seconds``
    before ``as_of`` (an ISO timestamp literal) — the "device went
    dark" report off the liveness ledger, plus the staleness age.
    Whole-second epochs (the floor rule); a key active within the
    threshold is absent, not flagged false."""
    cut = (F.lit(as_of).cast("timestamp").cast("long")
           - F.lit(threshold_seconds))
    return (ledger
            .select(F.col(key), F.col("last_seen"),
                    (F.lit(as_of).cast("timestamp").cast("long")
                     - F.col("last_seen").cast("long"))
                    .cast("bigint").alias("silent_seconds"))
            .filter(F.col("last_seen").cast("long") < cut))


def offline_keys_sql(table: str, as_of: str,
                     threshold_seconds: int = 86400,
                     key: str = "user_id", ts_col: str = "ts") -> str:
    """DuckDB twin of :func:`last_seen` + :func:`offline_keys`."""
    ep = "CAST(floor(epoch(MAX(CAST({c} AS TIMESTAMP)))) AS BIGINT)" \
        .format(c=ts_col)
    cut = (f"CAST(floor(epoch(TIMESTAMP '{as_of}')) AS BIGINT)"
           f" - {threshold_seconds}")
    now = f"CAST(floor(epoch(TIMESTAMP '{as_of}')) AS BIGINT)"
    return f"""
SELECT {key}, MAX(CAST({ts_col} AS TIMESTAMP)) AS last_seen,
       CAST({now} - {ep} AS BIGINT) AS silent_seconds
FROM {table} GROUP BY 1 HAVING {ep} < {cut}
"""
