"""Streaming event analytics over the SketchStore ledger (round-7
judge ask #5): WAU/MAU and funnel counters maintained crash-safely
from a streaming source, so the CDC/streaming layer and the
event-analytics family compose.

Both stores ride :class:`dbms_spark.streaming.incremental_agg.
SketchStore`'s snapshot + pointer-commit machinery: one atomic POSIX
rename carries the state switch AND the applied-batch marker, so
foreachBatch redeliveries after a crash apply exactly once (the q233
contract).  What differs is the maintained state:

- **Active-days store**: the deduped (key, day) relation —
  :func:`dbms_spark.operators.events.active_days` — which is
  losslessly mergeable under ANY batch order (set union), so the
  ledger after N micro-batches equals the relation over everything
  applied, and :func:`wau_from_store` answers rolling actives from
  activity-bounded state.  Late and out-of-order batches are exact.

- **Funnel store**: one (key, step, anchor) row per key per reached
  step — the first-touch anchor chain.  Anchors only ever move
  FORWARD given in-order delivery, so under the resolvedTs flush
  contract (streaming/cdc.py: batch boundaries respect event-time /
  commit order) the merged state after N batches is EXACTLY the
  batch funnel's state over the concatenation; the soak test pins
  that equality across injected crashes.  Out-of-order delivery
  across batch boundaries would under-count conversions whose
  earlier-step event arrives late (a step-0 event arriving after a
  later batch already processed step-1 candidates cannot
  retroactively re-anchor them) — the same contract every
  last-event-wins CDC apply in this repo documents, and why the
  store composes with the resolvedTs-flushed source rather than a
  raw unordered stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from dbms_spark.streaming.cdc import ParquetTableStore
from dbms_spark.streaming.incremental_agg import SketchStore
from dbms_spark.plans.parallelism import literal_df


def active_days_store(spark, path: str, key: str = "user_id",
                      ts_col: str = "ts",
                      key_type: str = "long") -> SketchStore:
    """Crash-safe maintained (key, day) active-days ledger.  The
    merge is the probe-the-batch's-days append of
    :func:`dbms_spark.operators.events.active_days_merge` — O(batch)
    intake, exact under any ordering (set union is commutative)."""
    from dbms_spark.operators.events import _merge_day_rows, active_days

    return SketchStore(
        spark, path,
        build_fn=lambda b: active_days(b, key, ts_col),
        merge_fn=lambda cur, d: _merge_day_rows(cur, d, key),
        schema=f"{key} {key_type}, day timestamp")


def wau_from_store(store: SketchStore, key: str = "user_id",
                   days: int = 7) -> DataFrame:
    """Rolling distinct actives (WAU for days=7, MAU for 30) answered
    from the ledger's activity-bounded state — the event stream is
    never re-read."""
    from dbms_spark.operators.events import rolling_active_from_days

    return rolling_active_from_days(store.read(), key, days)


def _funnel_advance_fold(u: DataFrame, k: int, key: str) -> DataFrame:
    """The one-exchange per-key fold over the unioned (state row +
    batch event) relation ``u`` — (key, __i, __ts, __st) with __st=1
    marking state rows.  Per-key memory is O(batch events of the
    key) in one aggregation buffer; :func:`_funnel_advance` bounds it
    with the hot-key guard."""
    g = (u.groupBy(key)
         .agg(
             *[F.min(F.when((F.col("__i") == i) & (F.col("__st") == 1),
                            F.col("__ts"))).alias(f"__s{i}")
               for i in range(k)],
             *[F.max(F.when((F.col("__i") == i) & (F.col("__st") == 1), 1)
                     .otherwise(0)).alias(f"__hs{i}") for i in range(k)],
             F.max(F.when((F.col("__i") == 0) & (F.col("__st") == 0), 1)
                   .otherwise(0)).alias("__he0"),
             F.sort_array(F.collect_list(
                 F.when((F.col("__st") == 0) & F.col("__ts").isNotNull(),
                        F.struct(F.col("__ts").alias("t"),
                                 F.col("__i").alias("i")))))
             .alias("__evs")))
    # nested CASE keeps acc[j - 1] inside a branch only reachable for
    # j >= 1 (AND/OR operands are not guaranteed lazy; a top-level
    # acc[-1] would trip ANSI array indexing)
    seeds = ", ".join(f"__s{i}" for i in range(k))
    fold = (f"aggregate(__evs, array({seeds}), (acc, e) -> "
            f"transform(acc, (a, j) -> CASE WHEN j != e.i THEN a "
            f"WHEN e.i = 0 THEN least(a, e.t) "
            f"WHEN acc[j - 1] IS NOT NULL AND e.t > acc[j - 1] "
            f"THEN least(a, e.t) ELSE a END))")
    folded = g.withColumn("__acc", F.expr(fold))
    return _funnel_state_rows(
        folded, k, key,
        anchor=lambda i: F.col("__acc")[i],
        hs=lambda i: F.col(f"__hs{i}") == 1,
        he0=F.col("__he0") == 1)


def _funnel_advance_window(u: DataFrame, k: int, key: str) -> DataFrame:
    """Spill-safe chained-window twin of :func:`_funnel_advance_fold`
    for HOT keys (same equivalence argument as the batch
    ``_funnel_window_totals``, with the per-step state seeds entering
    through a whole-partition min window instead of the fold's seed
    array): the running anchor ``__a{i}`` at any row equals
    least(seed_i, min over qualifying step-i batch events <= row),
    which is exactly the fold's acc[i] prefix recursion.  WindowExec
    buffers spill, so a hot key is a straggler, never an unspillable
    collect_list buffer."""
    w_full = (Window.partitionBy(key)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    w_run = (Window.partitionBy(key)
             .orderBy(F.col("__ts").asc_nulls_first(), F.col("__i"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cur = u
    for i in range(k):
        seed = F.min(F.when((F.col("__i") == i) & (F.col("__st") == 1),
                            F.col("__ts"))).over(w_full)
        if i == 0:
            cond = ((F.col("__i") == 0) & (F.col("__st") == 0)
                    & F.col("__ts").isNotNull())
        else:
            prev = F.col(f"__a{i - 1}")
            cond = ((F.col("__i") == i) & (F.col("__st") == 0)
                    & prev.isNotNull() & (F.col("__ts") > prev))
        cur = cur.withColumn(
            f"__a{i}",
            F.least(seed, F.min(F.when(cond, F.col("__ts"))).over(w_run)))
    final = cur.groupBy(key).agg(
        *[F.min(f"__a{i}").alias(f"__m{i}") for i in range(k)],
        *[F.max(F.when((F.col("__i") == i) & (F.col("__st") == 1), 1)
                .otherwise(0)).alias(f"__hs{i}") for i in range(k)],
        F.max(F.when((F.col("__i") == 0) & (F.col("__st") == 0), 1)
              .otherwise(0)).alias("__he0"))
    return _funnel_state_rows(
        final, k, key,
        anchor=lambda i: F.col(f"__m{i}"),
        hs=lambda i: F.col(f"__hs{i}") == 1,
        he0=F.col("__he0") == 1)


def _funnel_state_rows(per_key: DataFrame, k: int, key: str,
                       anchor, hs, he0) -> DataFrame:
    """(key, step, anchor) rows from a per-key relation: step i
    exists iff a state row carried it or a new anchor folded in
    (step 0 also from any batch step-0 event, NULL-ts included)."""
    arms = []
    for i in range(k):
        exists = (hs(i) | anchor(i).isNotNull()) if i else (hs(0) | he0)
        arms.append(F.when(exists, F.struct(
            F.lit(i).cast("bigint").alias("step"),
            anchor(i).alias("anchor"))))
    return (per_key.select(
        F.col(key),
        F.explode(F.filter(F.array(*arms), lambda x: x.isNotNull()))
        .alias("__r"))
        .select(F.col(key), F.col("__r.step").alias("step"),
                F.col("__r.anchor").alias("anchor")))


def _funnel_advance(state: DataFrame, batch: DataFrame, steps: list[str],
                    key: str, ts_col: str, type_col: str,
                    hot_key_events: int | None = 1_000_000) -> DataFrame:
    """Fold one time-ordered batch into the (key, step, anchor) chain:
    per step, candidates are the batch's step events strictly after
    the key's (already-merged) previous-step anchor, so a key can
    cascade through several steps within one batch; committed anchors
    win via min() (under the in-order contract they are always
    earlier).

    ONE exchange per batch (round 10, guide §2.4): state rows and
    batch events union into a single groupBy(key) that collects the
    key's time-sorted batch events and the per-step state seeds, and
    a per-key left-to-right fold computes every step's merged anchor
    in one pass.  (The previous shape ran per STEP: a join against
    the previous step's anchors + two groupBys + an eager
    localCheckpoint — ~6 exchanges and 3 standalone jobs per batch.)

    Equivalence with the per-step form: events are folded in
    ascending (ts, step) order; a step-i event is eligible iff the
    running step-(i-1) anchor is non-NULL and strictly earlier, and
    anchors fold by least().  The running anchor at time t equals
    min(seed, step-(i-1) events ≤ t), which is exactly the merged
    anchor the per-step form compares against (candidate mins are
    first-eligible-in-time-order); strict inequality makes ts ties
    order-independent.  A step-0 row also exists for keys whose only
    step-0 events carry NULL ts (anchor NULL), matching the old
    unconditioned groupBy; for i>0 NULL ts can never pass the strict
    filter in either form.  An event type listed at SEVERAL step
    positions contributes one fold row per position (the old per-step
    filters each matched it independently).

    HOT-KEY GUARD (round 11, guide §2.5/§5 — the batch funnel's
    guard applied per micro-batch): when the batch's row count
    exceeds ``hot_key_events`` (total >= any per-key count, so a
    smaller batch proves no key can be hot and the plan is EXACTLY
    the unguarded one-exchange fold; the count job itself is gated
    by the no-job Catalyst size estimate — see
    ``operators.events._maybe_hot`` — so ordinary micro-batches add
    zero jobs), keys with more batch step events than the threshold
    split out via a broadcast anti/semi join into the spill-safe
    chained-window twin; the two (key, step, anchor) outputs union
    (key sets are disjoint).  State rows are k-bounded per key and
    follow their key's path."""
    k = len(steps)
    if len(set(steps)) == k:
        step_idx = F.when(F.col(type_col) == steps[0], 0)
        for i in range(1, k):
            step_idx = step_idx.when(F.col(type_col) == steps[i], i)
        ev = (batch.select(F.col(key),
                           step_idx.cast("int").alias("__i"),
                           F.col(ts_col).cast("timestamp").alias("__ts"))
              .where(F.col("__i").isNotNull())
              .withColumn("__st", F.lit(0)))
    else:
        idx_arr = F.array_compact(F.array(*[
            F.when(F.col(type_col) == s, F.lit(i).cast("int"))
            for i, s in enumerate(steps)]))
        ev = (batch.select(F.col(key), F.explode(idx_arr).alias("__i"),
                           F.col(ts_col).cast("timestamp").alias("__ts"))
              .withColumn("__st", F.lit(0)))
    st = state.select(F.col(key), F.col("step").cast("int").alias("__i"),
                      F.col("anchor").alias("__ts"),
                      F.lit(1).alias("__st"))
    from dbms_spark.operators.events import _maybe_hot

    u = ev.unionByName(st)
    if _maybe_hot(batch, hot_key_events):
        hot = (ev.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
               .where(F.col("__n") > int(hot_key_events)).select(key))
        return (_funnel_advance_fold(
            u.join(F.broadcast(hot), key, "left_anti"), k, key)
            .unionByName(_funnel_advance_window(
                u.join(F.broadcast(hot), key, "left_semi"), k, key)))
    return _funnel_advance_fold(u, k, key)


def funnel_store(spark, path: str, steps: list[str],
                 key: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 key_type: str = "long",
                 hot_key_events: int | None = 1_000_000) -> SketchStore:
    """Crash-safe maintained first-touch funnel state: (key, step,
    anchor), one row per key per reached step — key-bounded, never
    per-event.  Requires time-ordered batch boundaries (see module
    docstring); under that contract the state after N batches equals
    the batch :func:`dbms_spark.operators.events.funnel` chain over
    the concatenation.  ``fold_first_batch=True``: build only projects
    the batch, so the anchor-chain state shape comes from the merge —
    which must run on batch #1 too, against the empty state relation
    (the flag replaces the former _FoldStore apply_batch override that
    duplicated the base pointer/redelivery/commit sequence)."""
    return SketchStore(
        spark, path,
        build_fn=lambda b: b.select(
            F.col(key), F.col(ts_col).cast("timestamp").alias(ts_col),
            F.col(type_col)),
        merge_fn=lambda cur, d: _funnel_advance(cur, d, steps, key,
                                                ts_col, type_col,
                                                hot_key_events),
        schema=f"{key} {key_type}, step bigint, anchor timestamp",
        fold_first_batch=True)


def funnel_counts_from_store(store: SketchStore,
                             steps: list[str]) -> DataFrame:
    """Per-step distinct-key counts from the funnel store, zero rows
    included for unreached steps — the same (step, event_type,
    n_users) contract as the batch funnel()."""
    spark = store.spark
    idx = literal_df(spark, 
        [(i, s) for i, s in enumerate(steps)], "step long, event_type string")
    counts = (store.read().groupBy("step")
              .agg(F.count(F.lit(1)).cast("bigint").alias("__n")))
    return (idx.join(counts, "step", "left")
            .select(F.col("step").cast("bigint").alias("step"),
                    "event_type",
                    F.coalesce(F.col("__n"), F.lit(0)).cast("bigint")
                    .alias("n_users")))


def _attr_advance(state: DataFrame, batch: DataFrame,
                  conversion_type: str, touch_types: list[str], key: str,
                  ts_col: str, type_col: str,
                  lookback_seconds: int | None,
                  tiebreak: list[str]) -> DataFrame:
    """Fold one time-ordered batch into the attribution state: the
    stored per-key LAST TOUCH re-enters the batch as a pseudo touch
    event (strictly earlier than every batch row under the event-time
    batch contract, so its tiebreak never matters), the batch
    attribution runs UNCHANGED over the union, and the per-touch-type
    conversion counters fold by sum.  New last-touch rows are the
    (ts, tiebreak)-max over stored ∪ batch touches."""
    from dbms_spark.operators.events import attribute_conversions

    lasts = state.filter(F.col("kind") == "last")
    cnts = state.filter(F.col("kind") == "cnt")
    tb_types = dict(batch.dtypes)
    pseudo = lasts.select(
        F.col(key), F.col("touch_ts").alias(ts_col),
        F.col("touch_type").alias(type_col),
        *[F.lit(-1).cast(tb_types[c]).alias(c) for c in tiebreak])
    ev = batch.select(key, ts_col, type_col, *tiebreak).unionByName(pseudo)
    att = attribute_conversions(ev, conversion_type, touch_types, key,
                                ts_col, type_col, lookback_seconds,
                                tiebreak)
    new_cnts = (cnts.select("touch_type", "n")
                .unionByName(att.groupBy("touch_type")
                             .agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("n")))
                .groupBy("touch_type")
                .agg(F.sum("n").cast("bigint").alias("n")))
    touches = (ev.filter(F.col(type_col).isin(touch_types))
               .select(F.col(key),
                       F.col(ts_col).cast("timestamp").alias("touch_ts"),
                       F.col(type_col).alias("touch_type"),
                       *[F.col(c) for c in tiebreak]))
    # (ts, tiebreak)-max per key as ONE partial-aggregated max(struct)
    # instead of the former row_number window (round 10, guide §2.3):
    # struct ordering compares fields left to right with NULL smallest,
    # so the selected row equals the rn=1 row of ORDER BY ts DESC,
    # tiebreak DESC (descending NULLS LAST) — a NULL-ts touch wins only
    # when the key has nothing else, exactly as before; the map-side
    # partial max ships one struct per key per task where the window
    # sorted and shipped every touch row.
    new_lasts = (touches.groupBy(key).agg(F.max(F.struct(
        F.col("touch_ts"), *[F.col(c) for c in tiebreak],
        F.col("touch_type"))).alias("__m"))
        .select(F.col(key), F.col("__m.touch_ts").alias("touch_ts"),
                F.col("__m.touch_type").alias("touch_type")))
    nulls = {"key": F.lit(None).cast(lasts.schema[key].dataType),
             "ts": F.lit(None).cast("timestamp")}
    return (new_lasts.select(
        F.lit("last").alias("kind"), F.col(key), F.col("touch_type"),
        F.col("touch_ts"), F.lit(None).cast("bigint").alias("n"))
        .unionByName(new_cnts.select(
            F.lit("cnt").alias("kind"), nulls["key"].alias(key),
            F.col("touch_type"), nulls["ts"].alias("touch_ts"),
            F.col("n"))))


def attribution_store(spark, path: str, conversion_type: str,
                      touch_types: list[str], key: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      lookback_seconds: int | None = None,
                      tiebreak: list[str] | None = None,
                      key_type: str = "long") -> SketchStore:
    """Crash-safe maintained LAST-TOUCH ATTRIBUTION counters: per
    touch type (NULL = organic), how many conversions so far credited
    to it — plus the per-key last-touch rows that let the next batch's
    conversions see across the batch boundary.  State is key-bounded
    (one last-touch row per key, one counter row per touch type),
    never per-event.

    Requires time-ordered batch boundaries (the resolvedTs / event-
    time-cut contract of :func:`funnel_store`): a stored last touch
    is then strictly earlier than every batch row, so folding it in
    as a pseudo event and running the UNCHANGED batch
    :func:`dbms_spark.operators.events.attribute_conversions` over
    the union yields exactly the one-shot attribution of the
    concatenation (gate q303).  A touch arriving late, after a later
    conversion was already attributed, cannot re-credit it — the same
    last-write contract the funnel store documents."""
    tb = list(tiebreak or [])
    return SketchStore(
        spark, path,
        build_fn=lambda b: b.select(
            F.col(key), F.col(ts_col).cast("timestamp").alias(ts_col),
            F.col(type_col), *[F.col(c) for c in tb]),
        merge_fn=lambda cur, d: _attr_advance(
            cur, d, conversion_type, touch_types, key, ts_col, type_col,
            lookback_seconds, tb),
        schema=(f"kind string, {key} {key_type}, touch_type string,"
                f" touch_ts timestamp, n bigint"),
        fold_first_batch=True)


def attribution_counts_from_store(store: SketchStore) -> DataFrame:
    """(touch_type, n) conversion credit per touch type from the
    maintained state — NULL touch_type is the organic share, same
    contract as grouping the one-shot attribution output."""
    return (store.read().filter(F.col("kind") == "cnt")
            .select("touch_type", F.col("n").cast("bigint").alias("n")))


def _sess_advance(state: DataFrame, batch: DataFrame, key: str,
                  gap_seconds: int) -> DataFrame:
    """Fold one batch into the session ledger: every stored session
    re-enters as TWO pseudo events (its start with weight 0, its end
    carrying its event count), TAGGED with the session's identity —
    a long session's endpoints can be further apart than the gap
    (inner events chained them when it was formed), so the split
    rule must never separate same-tag endpoints; everything else
    splits on the plain gap rule.  The union re-sessionizes with the
    same lag + running-sum recipe and per-session rows aggregate
    back.  Exact whenever no late event lands strictly INSIDE an
    already-closed session's span (the event-time batch contract
    guarantees that); a boundary event extending the open session
    merges exactly as the one-shot would."""
    from pyspark.sql.window import Window

    # (key, s_ep) uniquely names a stored session -> the tag
    pseudo = (state.select(F.col(key), F.col("s_ep").alias("ep"),
                           F.lit(0).cast("bigint").alias("w"),
                           F.col("s_ep").alias("tag"))
              .unionByName(state.select(F.col(key),
                                        F.col("e_ep").alias("ep"),
                                        F.col("n").alias("w"),
                                        F.col("s_ep").alias("tag"))))
    allr = pseudo.unionByName(
        batch.withColumn("tag", F.lit(None).cast("bigint")))
    # NULLS LAST: a batch event whose TRUNCATED epoch ties a stored
    # session's end (sub-second timestamps either side of the batch
    # cut) must sort AFTER the pseudo endpoint pair — nulls-first
    # would interpose it between same-tag endpoints and re-split a
    # longer-than-gap session into a phantom (s_ep, s_ep, 0) row
    w_ord = Window.partitionBy(key).orderBy(
        "ep", F.asc_nulls_last("tag"))
    gap = F.col("ep") - F.lag("ep").over(w_ord)
    same_tag = F.coalesce(F.col("tag") == F.lag("tag").over(w_ord),
                          F.lit(False))
    return (allr
            .withColumn("__new", F.when(gap.isNull()
                                        | ((gap > gap_seconds)
                                           & ~same_tag), 1)
                        .otherwise(0))
            .withColumn("__sid", F.sum("__new").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy(key, "__sid")
            .agg(F.min("ep").alias("s_ep"), F.max("ep").alias("e_ep"),
                 F.sum("w").cast("bigint").alias("n"))
            .drop("__sid"))


def session_store(spark, path: str, key: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30,
                  key_type: str = "long") -> SketchStore:
    """Crash-safe maintained gap-session ledger: one row per session
    (key, first/last event epoch, event count) — session-bounded
    state, the streaming sibling of
    :func:`dbms_spark.operators.joins.sessionize`.  Same time-ordered
    batch contract as the other fold stores; under it the ledger
    after N batches equals the one-shot sessionization of the
    concatenation (gate q304), including a batch's first events
    extending the previous batch's open sessions.  Epochs are
    truncated whole seconds (the repo-wide floor-epoch rule), so gap
    decisions match the batch form bit-for-bit."""
    return SketchStore(
        spark, path,
        build_fn=lambda b: b.select(
            F.col(key),
            F.col(ts_col).cast("timestamp").cast("long").alias("ep"),
            F.lit(1).cast("bigint").alias("w"))
        .filter(F.col("ep").isNotNull()),   # a session needs a time
        merge_fn=lambda cur, d: _sess_advance(cur, d, key,
                                              gap_minutes * 60),
        schema=f"{key} {key_type}, s_ep bigint, e_ep bigint, n bigint",
        fold_first_batch=True)


def session_stats_from_store(store: SketchStore,
                             key: str = "user_id") -> DataFrame:
    """(key, session_id, n_events, duration_seconds) from the session
    ledger — session ids numbered per key in start order, matching
    the batch sessionize's running-sum numbering (the q293 shape)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy("s_ep")
    return store.read().select(
        F.col(key), F.row_number().over(w).cast("bigint")
        .alias("session_id"), F.col("n").alias("n_events"),
        (F.col("e_ep") - F.col("s_ep")).cast("bigint")
        .alias("duration_seconds"))


class DayBucketLedger(ParquetTableStore):
    """GROWING-STATE ledger with DAY-keyed buckets — the scale form
    of the SketchStore event ledgers.  SketchStore commits rewrite
    the FULL snapshot every batch: exactly right for bounded state
    (HLL registers, funnel anchors, counters), quadratic over time
    for state that grows with activity (the active-days relation, the
    session ledger).  The CDC ParquetTableStore already bounds apply
    cost by touched buckets, but its buckets hash on the KEY — a
    uniform-key batch touches every bucket, so nothing prunes.  This
    subclass buckets on the DAY (epoch-day DIV days_per_bucket, no
    modulo — the manifest gains one entry per period, trivially
    small), the dimension along which batches are LOCAL: a nightly
    batch rewrites only its few day buckets and re-points the rest,
    so per-batch I/O is O(batch days × bucket size), never O(state).
    Everything else — atomic manifest replace as the single commit
    point, watermark-carried batch ids (redelivery no-op), time
    travel, GC — is inherited.  Rows must carry a ``day`` TIMESTAMP
    column (UTC midnights, the active_days contract)."""

    TABLE = "ledger"

    def __init__(self, spark, path: str, schema: str,
                 key_cols: list[str], days_per_bucket: int = 1):
        super().__init__(spark=spark, base_path=path,
                         schemas={self.TABLE: schema},
                         key_cols={self.TABLE: list(key_cols)})
        self.days_per_bucket = days_per_bucket

    #: bucket id for NULL-day rows (a NULL-ts event survives the
    #: activity dedup as a (key, NULL) row; the snapshot store simply
    #: carries it, so the drop-in ledger must too) — far outside any
    #: epoch-day bucket, and an int so the touched-bucket sort works
    _NULL_BUCKET = -(2 ** 62)

    def _day_bucket(self) -> F.Column:
        return F.coalesce(
            F.expr(f"CAST(day AS LONG) DIV {86400 * self.days_per_bucket}"),
            F.lit(self._NULL_BUCKET))

    def upsert_day_rows(self, delta: DataFrame,
                        batch_id: int | None = None) -> None:
        """Fold already-deduped ledger rows in: only genuinely new
        rows append (set-union semantics — exact under ANY batch
        order), and only the delta's day buckets are read or
        rewritten.  The delta is localCheckpointed LAZILY and the
        touched-bucket collect (driver-bounded by the batch's day
        span, the _merge_day_rows trade) is its materializing action
        — one job pins the delta AND answers the bucket probe, where
        an eager checkpoint paid a separate materialization job
        first (round 10, guide §1.2 job count); the commit write
        then reads the same pinned blocks."""
        wm = self.get_watermark(self.TABLE)
        if batch_id is not None and batch_id <= wm:
            return  # redelivered batch: exactly-once no-op
        bid = wm + 1 if batch_id is None else batch_id
        delta = delta.localCheckpoint(eager=False)
        touched = sorted(r[0] for r in delta.select(
            self._day_bucket().alias("__b")).distinct().collect())
        if not touched:
            self.set_watermark(self.TABLE, bid)
            return
        manifest = self._read_manifest(self.TABLE)
        existing = self._read_buckets(self.TABLE, touched)
        cols = existing.columns
        # set-union via union + dropDuplicates over ALL columns: the
        # former null-safe LEFT ANTI join computed the same set but as
        # a sort-merge join (both sides sorted); one hash aggregate
        # over the union is the same shuffle volume with no sorts
        # (round 10, guide §3).  dropDuplicates groups NULLs together,
        # so a (key, NULL-day) row still dedups — the eqNullSafe
        # contract is preserved.  Rows agree on every column inside a
        # duplicate group, so which one survives is immaterial.
        out = (existing.unionByName(delta.select(*cols))
               .dropDuplicates(cols)
               .withColumn("_kb", self._day_bucket()))
        self._commit_buckets(self.TABLE, manifest, touched, out, bid)

    def read(self) -> DataFrame:  # type: ignore[override]
        return self._read_buckets(self.TABLE)

    def last_batch_id(self) -> int:
        return self.get_watermark(self.TABLE)


class ActiveDaysDayLedger(DayBucketLedger):
    """The active-days store over day buckets: drop-in for
    :func:`active_days_store` (same apply_batch/read surface, same
    :func:`wau_from_store` compatibility) with per-batch I/O bounded
    by the batch's calendar span instead of total history — the form
    that survives a year of nightly batches over 10⁹ users."""

    def __init__(self, spark, path: str, key: str = "user_id",
                 ts_col: str = "ts", key_type: str = "long",
                 days_per_bucket: int = 1):
        super().__init__(spark, path,
                         schema=f"{key} {key_type}, day timestamp",
                         key_cols=[key, "day"],
                         days_per_bucket=days_per_bucket)
        self._key, self._ts = key, ts_col

    def apply_batch(self, events: DataFrame,
                    batch_id: int | None = None) -> None:
        from dbms_spark.operators.events import active_days

        self.upsert_day_rows(active_days(events, self._key, self._ts),
                             batch_id)


class SessionDayLedger(DayBucketLedger):
    """The gap-session ledger over day buckets — the growing-state
    form of :func:`session_store`.  Sessions bucket on their END
    day: under the time-ordered batch contract, the only stored
    sessions a batch can touch are those ending within ``gap`` of the
    batch's first event, so one apply reads ONLY the buckets covering
    [batch_min − gap, batch_max], folds them with the batch through
    the same tagged-endpoint re-sessionization as the snapshot store,
    and rewrites just those buckets (a session whose end moves
    forward relocates to its new end-day bucket; the emptied bucket
    is dropped from the manifest — delete-by-overwrite).  Buckets
    older than gap-reach are never read OR written, so per-batch I/O
    is O(batch span), not O(session history)."""

    def __init__(self, spark, path: str, key: str = "user_id",
                 ts_col: str = "ts", gap_minutes: int = 30,
                 key_type: str = "long", days_per_bucket: int = 1):
        super().__init__(spark, path,
                         schema=(f"{key} {key_type}, s_ep bigint,"
                                 f" e_ep bigint, n bigint"),
                         key_cols=[key, "s_ep"],
                         days_per_bucket=days_per_bucket)
        self._key, self._ts = key, ts_col
        self._gap = gap_minutes * 60

    def _day_bucket(self) -> F.Column:
        return F.expr(f"e_ep DIV {86400 * self.days_per_bucket}")

    def apply_batch(self, events: DataFrame,
                    batch_id: int | None = None) -> None:
        wm = self.get_watermark(self.TABLE)
        if batch_id is not None and batch_id <= wm:
            return  # redelivered batch: exactly-once no-op
        bid = wm + 1 if batch_id is None else batch_id
        batch = (events.select(
            F.col(self._key),
            F.col(self._ts).cast("timestamp").cast("long").alias("ep"),
            F.lit(1).cast("bigint").alias("w"))
            .filter(F.col("ep").isNotNull())   # a session needs a time
            .localCheckpoint(eager=False))     # min/max collect pins it
        b = batch.agg(F.min("ep").alias("lo"),
                      F.max("ep").alias("hi")).collect()[0]
        if b["lo"] is None:
            self.set_watermark(self.TABLE, bid)
            return
        per = 86400 * self.days_per_bucket
        lo_b, hi_b = (b["lo"] - self._gap) // per, b["hi"] // per
        manifest = self._read_manifest(self.TABLE)
        reach = [int(k) for k in manifest["buckets"]
                 if lo_b <= int(k) <= hi_b]
        state = self._read_buckets(self.TABLE, reach)
        out = (_sess_advance(state.select(self._key, "s_ep", "e_ep",
                                          "n"), batch,
                             self._key, self._gap)
               .withColumn("_kb", self._day_bucket()))
        # touched = buckets READ (reach: their sessions may relocate or
        # merge away); buckets the fold PRODUCED are learned from the
        # staged write itself inside _commit_buckets — the fold runs
        # exactly once, in the commit write, with no separate
        # distinct-bucket collect job or checkpoint (round 10, guide
        # §1.2).  Produced buckets stay bounded by the distinct
        # end-days present; nothing ever enumerates range(lo_b,
        # hi_b + 1), so one corrupt far-future timestamp cannot OOM
        # the driver (the rolling_active_from_days spine hazard).
        self._commit_buckets(self.TABLE, manifest, reach, out, bid)


class AttributionDayLedger(DayBucketLedger):
    """Last-touch attribution over DAY buckets — the growing-state
    form of :func:`attribution_store` (round-10 judge ask #2).  The
    SketchStore form keeps ONE last-touch row per key but commits the
    FULL snapshot every batch: at 10⁹ users a nightly batch rewrites
    the whole last-touch relation.  Here last-touch rows bucket on
    their TOUCH DAY and the per-touch-type counters live in one tiny
    dedicated bucket, so an apply reads and rewrites only the buckets
    within LOOKBACK REACH of the batch ([batch_min − lookback,
    batch_max] — the SessionDayLedger gap-reach argument with the
    attribution window as the gap) plus the counter bucket: per-batch
    I/O tracks the batch span and the attribution window, never total
    user cardinality.

    WHY REACH SUFFICES (exactness): a batch conversion at ts c can
    only credit a touch with ts ≥ c − lookback ≥ batch_min − lookback,
    so every stored last touch that could matter lives in a reach
    bucket; the fold is the UNCHANGED :func:`_attr_advance` over that
    slice, and the counters fold by sum — equal to the one-shot
    attribution of the concatenation (the q303 contract, driven
    through this ledger by gate q311).  This requires a FINITE
    ``lookback_seconds`` — the infinite-window form has no reach
    bound and stays on the SketchStore (enforced at construction).

    RE-TOUCHED KEYS tombstone by omission: a key's superseded row is
    dropped when its bucket (in reach) rewrites; a row whose key next
    touches only AFTER the window leaves a stale copy in its old
    bucket — harmless to attribution (out of every future window) and
    deduped by :meth:`lasts` on read.  Same time-ordered batch
    contract as every fold store here."""

    #: the per-touch-type counters' bucket: far outside any epoch-day,
    #: distinct from the NULL-day bucket
    _CNT_BUCKET = -(2 ** 61)

    def __init__(self, spark, path: str, conversion_type: str,
                 touch_types: list[str], key: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 lookback_seconds: int | None = None,
                 tiebreak: list[str] | None = None,
                 key_type: str = "long", days_per_bucket: int = 1):
        if not lookback_seconds or lookback_seconds <= 0:
            raise ValueError(
                "AttributionDayLedger needs a finite lookback_seconds "
                "(the reach bound); use attribution_store for an "
                "unbounded attribution window")
        super().__init__(spark, path,
                         schema=(f"kind string, {key} {key_type},"
                                 f" touch_type string,"
                                 f" touch_ts timestamp, n bigint"),
                         key_cols=[key],
                         days_per_bucket=days_per_bucket)
        self._conv = conversion_type
        self._touch_types = list(touch_types)
        self._key, self._ts, self._type = key, ts_col, type_col
        self._lookback = int(lookback_seconds)
        self._tb = list(tiebreak or [])

    def _day_bucket(self) -> F.Column:
        per = 86400 * self.days_per_bucket
        return (F.when(F.col("kind") == "cnt", F.lit(self._CNT_BUCKET))
                .otherwise(F.coalesce(
                    F.expr(f"CAST(touch_ts AS LONG) DIV {per}"),
                    F.lit(self._NULL_BUCKET))))

    def apply_batch(self, events: DataFrame,
                    batch_id: int | None = None) -> None:
        wm = self.get_watermark(self.TABLE)
        if batch_id is not None and batch_id <= wm:
            return  # redelivered batch: exactly-once no-op
        bid = wm + 1 if batch_id is None else batch_id
        batch = (events.select(
            F.col(self._key),
            F.col(self._ts).cast("timestamp").alias(self._ts),
            F.col(self._type),
            *[F.col(c) for c in self._tb])
            .filter(F.col(self._ts).isNotNull())
            .localCheckpoint(eager=False))     # min/max collect pins it
        b = batch.agg(
            F.min(F.col(self._ts).cast("long")).alias("lo"),
            F.max(F.col(self._ts).cast("long")).alias("hi")).collect()[0]
        if b["lo"] is None:
            self.set_watermark(self.TABLE, bid)
            return
        per = 86400 * self.days_per_bucket
        lo_b, hi_b = (b["lo"] - self._lookback) // per, b["hi"] // per
        manifest = self._read_manifest(self.TABLE)
        reach = [int(k) for k in manifest["buckets"]
                 if lo_b <= int(k) <= hi_b or int(k) == self._CNT_BUCKET]
        state = self._read_buckets(self.TABLE, reach)
        out = (_attr_advance(state, batch, self._conv, self._touch_types,
                             self._key, self._ts, self._type,
                             self._lookback, self._tb)
               .withColumn("_kb", self._day_bucket()))
        # touched = read buckets (their rows re-emit or tombstone by
        # omission); produced buckets are learned from the staged
        # write inside _commit_buckets — one fold execution, no
        # separate distinct-bucket collect (round 10, guide §1.2), and
        # never an enumerated day range (the far-future rule)
        self._commit_buckets(self.TABLE, manifest, reach, out, bid)

    def counts(self) -> DataFrame:
        """(touch_type, n) credited conversions — reads ONE bucket."""
        m = self._read_manifest(self.TABLE)
        has = str(self._CNT_BUCKET) in m["buckets"]
        src = (self._read_buckets(self.TABLE, [self._CNT_BUCKET])
               if has else self._read_buckets(self.TABLE, []))
        return (src.filter(F.col("kind") == "cnt")
                .select("touch_type",
                        F.col("n").cast("bigint").alias("n")))

    def lasts(self) -> DataFrame:
        """Per-key latest touch, stale copies deduped (a key whose
        next touch came after the window leaves its old row in an
        out-of-reach bucket; latest-wins on read restores the
        one-row-per-key contract)."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(self._key).orderBy(
            F.desc("touch_ts"),
            *[F.desc(c) for c in ("touch_type",)])
        return (self.read().filter(F.col("kind") == "last")
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(self._key, "touch_type", "touch_ts"))


def last_seen_store(spark, path: str, key: str = "user_id",
                    ts_col: str = "ts",
                    key_type: str = "long") -> SketchStore:
    """Crash-safe maintained liveness ledger: (key, last_seen), the
    max-merge sibling of the active-days store — exact under ANY
    batch order (max is commutative/idempotent), so late and
    out-of-order batches need no contract.  Feed
    :func:`dbms_spark.operators.events.offline_keys` for the
    device-went-dark report."""
    from dbms_spark.operators.events import last_seen, last_seen_merge

    def merge(cur: DataFrame, delta: DataFrame) -> DataFrame:
        # delta is already the batch's (key, last_seen); the merge
        # re-aggregates it (a no-op — max of one row per key) and
        # touched-splits against the ledger
        return last_seen_merge(cur, delta, key, "last_seen")

    return SketchStore(
        spark, path,
        build_fn=lambda b: last_seen(b, key, ts_col),
        merge_fn=merge,
        schema=f"{key} {key_type}, last_seen timestamp")
