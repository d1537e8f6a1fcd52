package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryDef, Tables}

/** Temporal join operators Spark lacks as single built-ins, composed from
  * primitives so Catalyst still owns the physical plan (preference order
  * (a) of the build rules — no custom strategy needed):
  *
  *  - as-of join: union-and-window. Tag both streams, sort-partition by
  *    key, carry the last left-side value forward with
  *    last_value(IGNORE NULLS). ONE shuffle on the key, no range
  *    explosion — this is the scalable shape for "latest quote before
  *    trade" style joins at any SF.
  *  - range join: equi-join on the key plus a bounded time predicate; the
  *    equi key keeps it a hash join (the range is a residual filter).
  */
object TemporalJoins {

  /** For every error event: the most recent click by the same user at or
    * before it (clicks sort ahead of errors on ts ties).
    */
  val asof: QueryDef = QueryDef(
    "join_asof_last_click_before_error",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("kind"))
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("kind"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn("last_click_event_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("event_id").as("error_event_id"), col("ts").as("error_ts"),
          col("last_click_event_id"), col("last_click_ts"))
        .orderBy("user_id", "error_event_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        FROM events WHERE event_type IN ('click', 'error')),
      carried AS (
        SELECT user_id, event_id, ts, kind,
               last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER w AS last_click_event_id,
               last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER w AS last_click_ts
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id, event_id AS error_event_id, ts AS error_ts,
             last_click_event_id, last_click_ts
      FROM carried
      WHERE kind = 1
      ORDER BY user_id, error_event_id
    """.stripMargin.trim))

  /** Ordered event pairs of the same user within one hour.
    *
    * Scale shape: joining on user_id alone is O(events_per_user²) — a
    * power-law user at 100 TB turns that quadratic. Instead the join key
    * is (user_id, hour_bucket): the left side is exploded into its own
    * bucket and the next one, so a pair at distance ≤ 1 h lands in
    * exactly one of the two bucket pairings (0 ≤ dt ≤ H ⇒ bucket(b) ∈
    * {bucket(a), bucket(a)+1} — no duplicates, no misses), and the time
    * predicate is a cheap residual on a hash join whose key cardinality
    * grows with the time span, not just the user count.
    */
  val range: QueryDef = QueryDef(
    "join_range_pairs_within_1h",
    (s, dir) => {
      val H = 3600L * 1000000L
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val a = e.select(col("user_id"), col("event_id").as("a_id"), col("us").as("a_us"),
          explode(array((col("us") / H).cast("long"), (col("us") / H).cast("long") + 1)).as("jb"))
      val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("us").as("b_us"),
          (col("us") / H).cast("long").as("bb"))
      a.join(b,
          col("user_id") === col("b_user") && col("jb") === col("bb") &&
          col("a_id") < col("b_id") &&
          col("b_us") - col("a_us") >= 0 && col("b_us") - col("a_us") <= H)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""
      SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
        AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 3600000000
      GROUP BY a.user_id
      ORDER BY user_id
    """.stripMargin.trim))

  /** Nearest-event as-of join (merge_asof direction='nearest'): for
    * every error, the click by the same user closest in time — behind
    * OR ahead — with a deterministic tie-break (the at-or-before side
    * wins equal distances; a click exactly at the error ts counts as
    * before). Same union-and-window shape as [[asof]], run in both
    * directions: the backward frame carries the last preceding click;
    * the forward carry runs the SAME running-prefix frame under the
    * reversed sort (semantically CURRENT ROW → UNBOUNDED FOLLOWING,
    * executed as an incrementally-maintained UNBOUNDED PRECEDING frame
    * — Spark re-aggregates shrinking following-frames per row, O(k²)
    * on a hot key), and
    * a microsecond-exact timestampdiff picks the winner — still one
    * shuffle on user_id, no range explosion, errors with no clicks at
    * all surface with NULLs (full-roster left semantics).
    */
  val asofNearest: QueryDef = QueryDef(
    "join_asof_nearest_click",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("kind"))
      val order = Seq(asc("ts"), asc("kind"), asc("event_id"))
      val wb = Window.partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // forward carry = last preceding non-null under the REVERSED order
      // (identical frame semantics to CURRENT ROW .. UNBOUNDED FOLLOWING,
      // but Spark maintains the running UnboundedPreceding frame
      // incrementally, where the shrinking following-frame variant
      // re-aggregates per row — O(k²) on a hot user's partition)
      val orderDesc = Seq(desc("ts"), desc("kind"), desc("event_id"))
      val wf = Window.partitionBy("user_id").orderBy(orderDesc: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val clickId = when(col("kind") === 0, col("event_id"))
      val clickTs = when(col("kind") === 0, col("ts"))
      ev
        .withColumn("b_id", last(clickId, ignoreNulls = true).over(wb))
        .withColumn("b_ts", last(clickTs, ignoreNulls = true).over(wb))
        .withColumn("f_id", last(clickId, ignoreNulls = true).over(wf))
        .withColumn("f_ts", last(clickTs, ignoreNulls = true).over(wf))
        .filter(col("kind") === 1)
        .withColumn("dt_b", expr("timestampdiff(MICROSECOND, b_ts, ts)"))
        .withColumn("dt_f", expr("timestampdiff(MICROSECOND, ts, f_ts)"))
        .withColumn("pick_b",
          col("b_id").isNotNull && (col("f_id").isNull || col("dt_b") <= col("dt_f")))
        .select(col("user_id"), col("event_id").as("error_event_id"),
          col("ts").as("error_ts"),
          when(col("pick_b"), col("b_id")).otherwise(col("f_id")).as("nearest_click_event_id"),
          when(col("pick_b"), col("dt_b")).otherwise(col("dt_f")).as("dt_us"),
          when(col("b_id").isNull && col("f_id").isNull, lit(null).cast("string"))
            .when(col("pick_b"), lit("before")).otherwise(lit("after")).as("direction"))
        .orderBy("user_id", "error_event_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        FROM events WHERE event_type IN ('click', 'error')),
      carried AS (
        SELECT user_id, event_id, ts, kind,
               last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER wb AS b_id,
               last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER wb AS b_ts,
               first_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER wf AS f_id,
               first_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER wf AS f_ts
        FROM ev
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      picked AS (
        SELECT user_id, event_id, ts, b_id, f_id,
               date_diff('microsecond', b_ts, ts) AS dt_b,
               date_diff('microsecond', ts, f_ts) AS dt_f,
               (b_id IS NOT NULL AND (f_id IS NULL OR
                  date_diff('microsecond', b_ts, ts) <= date_diff('microsecond', ts, f_ts)))
                 AS pick_b
        FROM carried WHERE kind = 1)
      SELECT user_id, event_id AS error_event_id, ts AS error_ts,
             CASE WHEN pick_b THEN b_id ELSE f_id END AS nearest_click_event_id,
             CASE WHEN pick_b THEN dt_b ELSE dt_f END AS dt_us,
             CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                  WHEN pick_b THEN 'before' ELSE 'after' END AS direction
      FROM picked
      ORDER BY user_id, error_event_id
    """.stripMargin.trim))

  /** Feature-store point-in-time join: for every purchase (the label
    * event), the user's SCD2 activity state valid at `purchase_ts − 1 h`
    * — the leakage-safe feature cutoff a training pipeline must enforce
    * (a feature computed after the label time is target leakage). The
    * state dimension is [[EventOps.stateChanges]] — THE scd2 definition,
    * shared so the two operators cannot drift.
    *
    * Shape: union-and-carry, not an interval join — state changes (kind
    * 0, at effective_from) and feature-time query points (kind 1, at
    * ts−1h) interleave in one per-user sorted pass; `last(… IGNORE
    * NULLS)` carries the in-effect state. ONE shuffle on user_id, no
    * range explosion, and a change exactly at the cutoff counts
    * (at-or-before, kind tie-break) — the same carry discipline as
    * [[asof]].
    */
  val pointInTime: QueryDef = QueryDef(
    "join_pointintime_features",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val tsType = ev.schema("ts").dataType
      val st = EventOps.stateChanges(ev).select(
        col("user_id"), col("ts").as("ets"), lit(0).as("kind"), col("event_id"),
        col("event_type").as("state"), lit(null).cast(tsType).as("purchase_ts"))
      val q = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), (col("ts") - expr("INTERVAL 1 HOUR")).as("ets"),
        lit(1).as("kind"), col("event_id"),
        lit(null).cast("string").as("state"), col("ts").as("purchase_ts"))
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ets"), asc("kind"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      st.unionByName(q)
        .withColumn("f_state",
          last(when(col("kind") === 0, col("state")), ignoreNulls = true).over(w))
        .withColumn("f_ts",
          last(when(col("kind") === 0, col("ets")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("event_id").as("purchase_event_id"),
          col("purchase_ts"), col("ets").as("feature_ts"),
          col("f_state").as("state_at_feature_ts"),
          expr("timestampdiff(MICROSECOND, f_ts, ets)").as("state_age_us"))
        .orderBy("user_id", "purchase_event_id")
    },
    Some(s"""
      WITH ${EventOps.stateChangesSql},
      st AS (
        SELECT user_id, ts AS ets, 0 AS kind, event_id,
               event_type AS state, CAST(NULL AS TIMESTAMP) AS purchase_ts
        FROM changes),
      q AS (
        SELECT user_id, ts - INTERVAL 1 HOUR AS ets, 1 AS kind, event_id,
               CAST(NULL AS VARCHAR) AS state, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'),
      u AS (SELECT * FROM st UNION ALL SELECT * FROM q),
      carried AS (
        SELECT user_id, ets, kind, event_id, purchase_ts,
               last_value(CASE WHEN kind = 0 THEN state END IGNORE NULLS) OVER w AS f_state,
               last_value(CASE WHEN kind = 0 THEN ets END IGNORE NULLS) OVER w AS f_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ets ASC, kind ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id, event_id AS purchase_event_id, purchase_ts,
             ets AS feature_ts, f_state AS state_at_feature_ts,
             date_diff('microsecond', f_ts, ets) AS state_age_us
      FROM carried
      WHERE kind = 1
      ORDER BY user_id, purchase_event_id
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(asof, range, asofNearest, pointInTime)
}
