package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Event-stream operators in batch form over the `events` table. Each is
  * the DuckDB-checkable analog of a streaming-semantics operator from
  * SURVEY.md §2; the live Structured Streaming forms are exercised in
  * graft.streaming (windowed aggregation uses the identical `window()`
  * expression under a watermark).
  */
object EventOps {

  private val D = DecimalType(12, 2)

  /** THE definition of SCD2 state-change compaction (consecutive repeats
    * of the same event_type fold into the first occurrence under the
    * (ts, event_id) total order) — shared by `scd2_user_state_history`
    * and the point-in-time feature join so the dimension they build from
    * cannot drift. Returns (user_id, event_id, ts, event_type) change
    * rows; one shuffle on user_id.
    */
  private[operators] def stateChanges(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    ev.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
      .drop("prev_state")
  }

  /** THE latest-row-per-user reduction under the (ts, event_id) total
    * order — shared by the batch CDC merge and the live foreachBatch
    * merge (StreamLive) so "latest" can never mean two different
    * tie-breaks. */
  private[operators] def latestPerUser(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** DuckDB twin of [[stateChanges]]: CTEs `ordered` + `changes`. */
  private[operators] val stateChangesSql: String = """
        ordered AS (
          SELECT user_id, event_id, ts, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS prev_state
          FROM events),
        changes AS (
          SELECT user_id, event_id, ts, event_type
          FROM ordered
          WHERE prev_state IS NULL OR prev_state <> event_type)"""

  /** CDC changelog apply (the MERGE INTO / upsert-compaction kernel a
    * lakehouse table maintenance job runs): the pre-cutoff events build
    * the base snapshot (latest state per user under the (ts, event_id)
    * total order), the post-cutoff events become a changelog where
    * `error` is a DELETE and every other type an UPSERT, and applying
    * the changelog means: the LAST op per user wins — delete removes
    * the row, upsert replaces it, a user unseen in the changelog
    * carries over. Output is the merge audit: row counts by
    * (change_kind ∈ carried/updated/inserted/deleted × final state) —
    * what a MERGE reports as its matched/not-matched statistics.
    *
    * Scale shape: two latest-per-key reductions (each one keyed shuffle
    * over its half of the log — on a cluster, max_by aggregation, never
    * a global sort) + one keyed full-outer join on user_id + a tiny
    * rollup. Exactly the incremental-compaction plan: the base side is
    * the existing table, the changelog side is the new partition, and
    * only user_id moves.
    */
  val cdcMerge: QueryDef = QueryDef(
    "cdc_changelog_merge",
    (s, dir) => {
      val cutoff = "TIMESTAMP '2024-01-16 00:00:00'"
      val ev = Tables.events(s, dir)
      val base = latestPerUser(ev.filter(expr(s"ts <= $cutoff")))
        .select(col("user_id"), col("event_type").as("base_state"))
      val delta = latestPerUser(ev.filter(expr(s"ts > $cutoff")))
        .select(col("user_id"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
          col("event_type").as("delta_state"))
      base.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          when(col("op") === "D", lit("deleted"))
            .when(col("op").isNull, lit("carried"))
            .when(col("base_state").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("change_kind"),
          when(col("op") === "D", lit("-"))
            .otherwise(coalesce(col("delta_state"), col("base_state"))).as("final_state"))
        .groupBy("change_kind", "final_state")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("change_kind", "final_state")
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_type AS base_state
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts <= TIMESTAMP '2024-01-16 00:00:00') t
        WHERE rn = 1),
      delta AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               event_type AS delta_state
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts > TIMESTAMP '2024-01-16 00:00:00') t
        WHERE rn = 1),
      merged AS (
        SELECT COALESCE(base.user_id, delta.user_id) AS user_id,
               CASE WHEN op = 'D' THEN 'deleted'
                    WHEN op IS NULL THEN 'carried'
                    WHEN base_state IS NULL THEN 'inserted'
                    ELSE 'updated' END AS change_kind,
               CASE WHEN op = 'D' THEN '-'
                    ELSE COALESCE(delta_state, base_state) END AS final_state
        FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id)
      SELECT change_kind, final_state, COUNT(*) AS n_users
      FROM merged
      GROUP BY 1, 2
      ORDER BY change_kind, final_state
    """.stripMargin.trim))

  /** U-shaped (position-based) multi-touch attribution, integer-exact:
    * every purchase distributes 10⁶ ppm of credit over that user's
    * clicks in the preceding 24 h — 40% to the first touch, 40% to the
    * last, the middle 20% split evenly by integer division (the DIV
    * remainder stays unassigned, so per-conversion credit is ≤ 10⁶
    * exactly; n=1 → 10⁶, n=2 → 5·10⁵ each — the standard U-shape
    * degenerate cases). Credit rolls up by acquisition channel
    * (props.k mod 4 — the synthetic channel tag).
    *
    * Scale shape: the click↔purchase pairing is an equi-join on
    * user_id with a time-range predicate (the join_range_pairs
    * pattern — per-user activity bounds the fan-out), position
    * ranking windows are per-conversion (bounded by clicks-per-day,
    * never corpus-wide), and the rollup is one keyed agg.
    */
  val attribution: QueryDef = QueryDef(
    "event_attribution_position",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("cid"), col("ts").as("cts"),
          (regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long") % 4)
            .as("ch"))
      val touched = purchases.join(clicks, Seq("user_id"))
        .filter(col("cts") < col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 24 HOURS"))
      val w = Window.partitionBy("pid").orderBy(asc("cts"), asc("cid"))
      touched
        .withColumn("pos", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("pid")))
        .withColumn("credit_ppm", expr(
          """CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN pos = 1 OR pos = n THEN 400000
                  ELSE 200000 DIV (n - 2) END"""))
        .groupBy(concat(lit("ch"), col("ch")).as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("pid")).as("n_conversions_touched"),
          sum(col("credit_ppm")).as("credit_ppm"))
        .orderBy("channel")
    },
    Some("""
      WITH purchases AS (
        SELECT user_id, event_id AS pid, ts AS pts
        FROM events WHERE event_type = 'purchase'),
      clicks AS (
        SELECT user_id, event_id AS cid, ts AS cts,
               CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 4 AS ch
        FROM events WHERE event_type = 'click'),
      touched AS (
        SELECT p.pid, c.cid, c.cts, c.ch
        FROM purchases p JOIN clicks c ON p.user_id = c.user_id
        WHERE c.cts < p.pts AND c.cts >= p.pts - INTERVAL 24 HOUR),
      positioned AS (
        SELECT pid, ch,
               row_number() OVER (PARTITION BY pid ORDER BY cts ASC, cid ASC) AS pos,
               COUNT(*) OVER (PARTITION BY pid) AS n
        FROM touched),
      credited AS (
        SELECT pid, ch,
               CASE WHEN n = 1 THEN 1000000
                    WHEN n = 2 THEN 500000
                    WHEN pos = 1 OR pos = n THEN 400000
                    ELSE 200000 // (n - 2) END AS credit_ppm
        FROM positioned)
      SELECT 'ch' || CAST(ch AS VARCHAR) AS channel,
             COUNT(*) AS n_touches,
             COUNT(DISTINCT pid) AS n_conversions_touched,
             CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm
      FROM credited
      GROUP BY ch
      ORDER BY channel
    """.stripMargin.trim))

  /** Cumulative unique users per day WITHOUT a running COUNT(DISTINCT)
    * window (which would hold per-day distinct state over the whole
    * horizon): each user is attributed to their FIRST-seen day by a
    * content-keyed min aggregation — the vocab-growth shape on the
    * events table — and the cumulative curve is a running sum over the
    * day-grain table only. The audience-growth census every
    * product/funnel review reads, in the only form that scales: the
    * corpus is touched by exactly two keyed aggregations.
    */
  val cumulativeUniques: QueryDef = QueryDef(
    "event_cumulative_uniques",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n_events"))
      val firstSeen = ev.groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"))).as("f"))
        .select(col("f.ts").cast("date").as("d"))
        .groupBy("d").agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(firstSeen, Seq("d"), "left_outer")
        .select(col("d"), col("n_events"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("d")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events
        FROM events GROUP BY 1),
      first_seen AS (
        SELECT CAST(MIN(ts) AS DATE) AS d FROM events GROUP BY user_id),
      news AS (SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY 1)
      SELECT daily.d, n_events,
             CAST(COALESCE(new_users, 0) AS BIGINT) AS new_users,
             CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY daily.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      FROM daily LEFT JOIN news ON daily.d = news.d
      ORDER BY daily.d
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(cdcMerge, attribution, cumulativeUniques) ++ Seq(

    // ---- tumbling event-time window (§2.9 extension analytics) ----------
    QueryDef(
      "stream_hourly_windowed_agg",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(D)).cast("double").as("total_value"))
          .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
          .orderBy("window_start", "event_type")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
      """.stripMargin.trim)),

    // ---- gap-based sessionization (session_window analog) ---------------
    QueryDef(
      "stream_sessionization_30m",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        val cum = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("gap_us", unix_micros(col("ts").cast("timestamp")) - lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
          .withColumn("is_new", when(col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("is_new")).over(cum))
          .groupBy("user_id", "session_id")
          .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some("""
        WITH marked AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
                        (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events),
        sess AS (
          SELECT user_id, ts,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
      """.stripMargin.trim)),

    // ---- A5 batch analog: top-5-newest retention, evictions out ---------
    // (the faithful incremental/stateful form is graft.npm.Retention; this
    // is the declarative window form over a static table)
    QueryDef(
      "a5_retention_topk_evictions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") > 5)
          .select(col("user_id"), col("event_id").as("evicted_event_id"), col("ts"))
          .orderBy("user_id", "evicted_event_id")
      },
      Some("""
        SELECT user_id, event_id AS evicted_event_id, ts FROM (
          SELECT user_id, event_id, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn > 5
        ORDER BY user_id, evicted_event_id
      """.stripMargin.trim)),

    // ---- A6: latest record per key (max_by) ------------------------------
    QueryDef(
      "a6_latest_event_per_user",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, event_id, ts, event_type FROM (
          SELECT user_id, event_id, ts, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1
        ORDER BY user_id
      """.stripMargin.trim)),

    // ---- T1: per-record JSON field extraction from the props payload ----
    QueryDef(
      "t1_json_props_extraction",
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.stripMargin.trim)),

    // ---- F2/K3: size-cap routing with DLQ reason (dead-letter analog) ---
    QueryDef(
      "f2_size_cap_routing",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            when(col("n_chars") > 500, "skipped_too_large").otherwise("kept").as("route"))
          .groupBy("route").agg(count(lit(1)).as("n"))
          .orderBy("route")
      },
      Some("""
        SELECT CASE WHEN n_chars > 500 THEN 'skipped_too_large' ELSE 'kept' END AS route,
               COUNT(*) AS n
        FROM documents
        GROUP BY 1
        ORDER BY route
      """.stripMargin.trim)),

    // ---- T4/T6/T7: name split, dir-prefix hash, filename templating ------
    QueryDef(
      "t4_t6_path_derivation",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            element_at(split(col("source"), "/"), -1).as("split_name"),
            upper(substring(col("source"), 1, 3)).as("dir_prefix"),
            concat(col("source"), lit("_"), col("doc_id"), lit(".zip")).as("zip_name"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               string_split(source, '/')[-1] AS split_name,
               upper(substr(source, 1, 3)) AS dir_prefix,
               source || '_' || CAST(doc_id AS VARCHAR) || '.zip' AS zip_name
        FROM documents
        ORDER BY doc_id
      """.stripMargin.trim)),

    /** Ordered funnel conversion (view → click → purchase within 7 days
      * of the first view): the classic event-sequence operator the
      * analytics surface lacked. Each stage is "earliest qualifying
      * event at-or-after the previous stage's timestamp", so
      * out-of-order events never count and the 7-day horizon anchors at
      * stage 1. Shape: three per-user min-aggregations chained by
      * equi-joins on user_id (keyed shuffles; each stage's frame is one
      * row per surviving user, monotonically shrinking), then three
      * 1-row count aggregates crossJoined into the single summary row —
      * the whitelisted broadcast-scalar pattern. No window over the
      * full event stream, no per-user event sorting: at 100 TB each
      * stage is a filtered scan + hash agg + shrinking hash join.
      */
    QueryDef(
      "event_funnel_conversion",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "ts", "event_type")
        val u1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val u2 = ev.filter(col("event_type") === "click")
          .join(u1, "user_id").filter(col("ts") >= col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
        val u3 = ev.filter(col("event_type") === "purchase")
          .join(u2, "user_id")
          .filter(col("ts") >= col("t2") &&
            col("ts") <= col("t1") + expr("INTERVAL 7 DAY"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        val n1 = u1.agg(count(lit(1)).as("n_view"))
        val n2 = u2.agg(count(lit(1)).as("n_click_after_view"))
        val n3 = u3.agg(count(lit(1)).as("n_purchase_within_7d"))
        n1.crossJoin(n2).crossJoin(n3)
          .select(col("n_view"), col("n_click_after_view"), col("n_purchase_within_7d"),
            (col("n_click_after_view").cast("double") / col("n_view"))
              .as("conv_view_to_click"),
            (col("n_purchase_within_7d").cast("double") / col("n_click_after_view"))
              .as("conv_click_to_purchase"))
      },
      Some("""
        WITH u1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        u2 AS (
          SELECT e.user_id, MIN(e.ts) AS t2, MIN(u1.t1) AS t1
          FROM events e JOIN u1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts >= u1.t1
          GROUP BY 1),
        u3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN u2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= u2.t2
            AND e.ts <= u2.t1 + INTERVAL 7 DAY
          GROUP BY 1)
        SELECT (SELECT COUNT(*) FROM u1) AS n_view,
               (SELECT COUNT(*) FROM u2) AS n_click_after_view,
               (SELECT COUNT(*) FROM u3) AS n_purchase_within_7d,
               CAST((SELECT COUNT(*) FROM u2) AS DOUBLE)
                 / (SELECT COUNT(*) FROM u1) AS conv_view_to_click,
               CAST((SELECT COUNT(*) FROM u3) AS DOUBLE)
                 / (SELECT COUNT(*) FROM u2) AS conv_click_to_purchase
      """.stripMargin.trim)),

    /** SCD2-style state history: each user's event stream compacted to
      * STATE CHANGES (consecutive repeats of the same event_type fold
      * into the first occurrence), each change valid
      * [effective_from, effective_to) until the next change, the last
      * row open-ended (NULL end, is_current) — the
      * slowly-changing-dimension type-2 build every warehouse derives
      * from a mutation stream. Two windows over ONE per-user sorted
      * partition pass (lag to detect the change, lead over the
      * compacted rows for the interval end); deterministic under the
      * (ts, event_id) total order. At scale this is one shuffle on
      * user_id — the same window-carry shape as the as-of family.
      */
    QueryDef(
      "scd2_user_state_history",
      (s, dir) => {
        stateChanges(Tables.events(s, dir))
          .withColumn("effective_to",
            lead(col("ts"), 1).over(Window.partitionBy("user_id")
              .orderBy(asc("ts"), asc("event_id"))))
          .select(col("user_id"), col("event_type").as("state"),
            col("ts").as("effective_from"), col("effective_to"),
            col("effective_to").isNull.as("is_current"))
          // effective_to joins the sort: two same-ts same-state changes
          // would otherwise tie on (user, from, state) and the emitted
          // order could differ between engines; NULLS LAST matches
          // DuckDB's default ordering
          .orderBy(asc("user_id"), asc("effective_from"), asc("state"),
            asc_nulls_last("effective_to"))
      },
      Some(s"""
        WITH $stateChangesSql
        SELECT user_id, event_type AS state, ts AS effective_from,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS effective_to,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) IS NULL AS is_current
        FROM changes
        ORDER BY user_id, effective_from, state, effective_to
      """.stripMargin.trim)),

    /** Weekly cohort retention — the second classic product-analytics
      * operator (funnel's sibling): users are cohorted by their FIRST
      * active week, and each (cohort, week-offset) cell reports how
      * many of them were active that week and the retention rate.
      * Week ids are Monday-truncated timestamps converted to integer
      * weeks via day-difference ÷ 7 from a Monday epoch — exact in both
      * engines because both operands are Monday-aligned (a direct
      * 'week' datediff would count engine-specific boundary crossings).
      * Shape: distinct (user, week) hash agg → per-user min (cohort) →
      * two keyed joins + the final (cohort, offset) agg. All shuffles
      * are keyed; nothing is per-event after the first dedup agg.
      */
    QueryDef(
      "cohort_weekly_retention",
      (s, dir) => {
        val wk = Tables.events(s, dir)
          .select(col("user_id"),
            expr("CAST(datediff(date_trunc('week', ts), DATE'1995-01-02') DIV 7 AS BIGINT)").as("w"))
          .distinct()
        val cohort = wk.groupBy("user_id").agg(min(col("w")).as("w0"))
        val sizes = cohort.groupBy("w0").agg(count(lit(1)).as("nc"))
        wk.join(cohort, "user_id")
          .join(sizes, "w0")
          .groupBy(col("w0").as("cohort_week"), (col("w") - col("w0")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"), min(col("nc")).as("n_cohort"))
          .select(col("cohort_week"), col("week_offset"), col("n_active"), col("n_cohort"),
            (col("n_active").cast("double") / col("n_cohort")).as("retention"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""
        WITH wk AS (
          SELECT DISTINCT user_id,
                 CAST(date_diff('day', DATE '1995-01-02',
                      CAST(date_trunc('week', ts) AS DATE)) // 7 AS BIGINT) AS w
          FROM events),
        cohort AS (SELECT user_id, MIN(w) AS w0 FROM wk GROUP BY 1),
        sizes AS (SELECT w0, COUNT(*) AS nc FROM cohort GROUP BY 1)
        SELECT c.w0 AS cohort_week, wk.w - c.w0 AS week_offset,
               COUNT(*) AS n_active, MIN(s.nc) AS n_cohort,
               CAST(COUNT(*) AS DOUBLE) / MIN(s.nc) AS retention
        FROM wk JOIN cohort c USING (user_id) JOIN sizes s ON c.w0 = s.w0
        GROUP BY 1, 2
        ORDER BY cohort_week, week_offset
      """.stripMargin.trim)),

    /** First-order Markov transition matrix of the event stream: counts
      * of adjacent (prev → next) event-type transitions under the
      * per-user (ts, event_id) total order, with row-normalized shares
      * in integer ppm — the behavioral fingerprint next-event-prediction
      * features start from. One shuffle on user_id for the lag, then a
      * type²-sized aggregation; the row-total window runs over ≤|types|²
      * rows.
      */
    QueryDef(
      "event_transition_matrix",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share_ppm", expr(
            "n * 1000000 DIV SUM(n) OVER (PARTITION BY from_type)"))
          .orderBy("from_type", "to_type")
      },
      Some("""
        WITH ordered AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS from_type
          FROM events),
        m AS (
          SELECT from_type, event_type AS to_type, COUNT(*) AS n
          FROM ordered WHERE from_type IS NOT NULL
          GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS share_ppm
        FROM m
        ORDER BY from_type, to_type
      """.stripMargin.trim)),

    /** Stationary distribution of the event-type Markov chain by power
      * iteration — where the behavioral process settles if users keep
      * transitioning forever (the long-run type mix a capacity model or
      * next-event prior starts from; PageRank's teleport-free core on
      * the type graph). Three unrolled iterations x_{k+1} = x_k·P from
      * the uniform start, ENTIRELY in integer ppm: each step's term is
      * (x_i · n_ij) DIV rowtotal_i — associative integer arithmetic, no
      * float matrix product to diverge between engines — and the
      * per-type |x₃ − x₂| delta is emitted so the convergence readout is
      * part of the checked result (the chain mixes fast: delta ≈ 0 ppm
      * by iteration 3 on this stream). Types with no out-transitions are
      * treated as ABSORBING (implicit self-loop) so the matrix stays
      * stochastic and mass is conserved on any corpus — without it a
      * sink type silently drains the whole distribution (r13 advisory).
      *
      * Scale shape: ONE shuffle on user_id builds the transition counts
      * (the same lag pass as event_transition_matrix); the iteration
      * state is the |types|-row vector (≤ a few dozen at any corpus
      * size) broadcast into |types|²-row joins — iterating costs nothing
      * data-proportional after the first agg.
      */
    QueryDef(
      "event_markov_stationary",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        val m = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rt", sum(col("n")).over(Window.partitionBy("from_type")))
          .localCheckpoint(true) // |types|² rows feed 3 iteration joins + the type set
        val types = m.select(col("from_type").as("t"))
          .union(m.select(col("to_type"))).distinct()
        // sink guard (r13 advisory): a type with NO out-transitions would
        // silently lose its whole mass each step (substochastic matrix —
        // it never appears in m.from_type, so it contributes nothing to
        // x_{k+1}). Make sinks ABSORBING — an implicit self-loop
        // P(t→t)=1 — so mass is conserved on any corpus; on a sink-free
        // stream (this one) the branch adds 0 to every row and the
        // readout is bit-identical.
        val typesS = types
          .join(m.select(col("from_type").as("t")).distinct()
            .withColumn("out1", lit(1L)), Seq("t"), "left")
          .select(col("t"), coalesce(col("out1"), lit(0L)).as("has_out"))
        val nt = types.agg(count(lit(1)).as("c")) // 1-row, broadcast
        // the iteration vector CARRIES has_out, so each step is the same
        // single broadcast left join the pre-guard shape had (the first
        // cut joined types→x→nxt per step and doubled the query's cost)
        val x0 = typesS.crossJoin(broadcast(nt))
          .select(col("t"), col("has_out"),
            expr("CAST(1000000 DIV c AS BIGINT)").as("x"))
        def step(x: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
          val nxt = m.join(broadcast(x.select("t", "x")),
              col("from_type") === col("t"))
            .groupBy(col("to_type"))
            .agg(sum(expr("x * n DIV rt")).as("xs"))
          x.join(broadcast(nxt), col("t") === col("to_type"), "left")
            .select(col("t"), col("has_out"),
              (coalesce(col("xs"), lit(0L)) +
                when(col("has_out") === 0, col("x")).otherwise(lit(0L))).as("x"))
        }
        val x1 = step(x0); val x2 = step(x1); val x3 = step(x2)
        x0.select(col("t"), col("x").as("x0_ppm"))
          .join(x1.select(col("t"), col("x").as("x1_ppm")), "t")
          .join(x2.select(col("t"), col("x").as("x2_ppm")), "t")
          .join(x3.select(col("t"), col("x").as("x3_ppm")), "t")
          .select(col("t").as("event_type"), col("x0_ppm"), col("x1_ppm"),
            col("x2_ppm"), col("x3_ppm"),
            abs(col("x3_ppm") - col("x2_ppm")).as("delta_ppm"))
          .orderBy("event_type")
      },
      Some("""
        WITH ordered AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS from_type
          FROM events),
        m AS (
          SELECT from_type, event_type AS to_type, COUNT(*) AS n
          FROM ordered WHERE from_type IS NOT NULL
          GROUP BY 1, 2),
        mr AS (SELECT *, SUM(n) OVER (PARTITION BY from_type) AS rt FROM m),
        types AS (SELECT from_type AS t FROM m UNION SELECT to_type FROM m),
        -- sink guard twin: absorbing self-loop for types with no out-edges
        tys AS (SELECT ty.t, CASE WHEN f.t IS NULL THEN 0 ELSE 1 END AS has_out
                FROM types ty
                LEFT JOIN (SELECT DISTINCT from_type AS t FROM m) f ON ty.t = f.t),
        nt AS (SELECT COUNT(*) AS c FROM types),
        x0 AS (SELECT t, has_out, CAST(1000000 // c AS BIGINT) AS x
               FROM tys CROSS JOIN nt),
        x1 AS (SELECT x0.t, x0.has_out, CAST(COALESCE(s.xs, 0)
                 + CASE WHEN x0.has_out = 0 THEN x0.x ELSE 0 END AS BIGINT) AS x
               FROM x0
               LEFT JOIN (SELECT mr.to_type, SUM(x0.x * mr.n // mr.rt) AS xs
                          FROM mr JOIN x0 ON mr.from_type = x0.t GROUP BY 1) s
               ON x0.t = s.to_type),
        x2 AS (SELECT x1.t, x1.has_out, CAST(COALESCE(s.xs, 0)
                 + CASE WHEN x1.has_out = 0 THEN x1.x ELSE 0 END AS BIGINT) AS x
               FROM x1
               LEFT JOIN (SELECT mr.to_type, SUM(x1.x * mr.n // mr.rt) AS xs
                          FROM mr JOIN x1 ON mr.from_type = x1.t GROUP BY 1) s
               ON x1.t = s.to_type),
        x3 AS (SELECT x2.t, x2.has_out, CAST(COALESCE(s.xs, 0)
                 + CASE WHEN x2.has_out = 0 THEN x2.x ELSE 0 END AS BIGINT) AS x
               FROM x2
               LEFT JOIN (SELECT mr.to_type, SUM(x2.x * mr.n // mr.rt) AS xs
                          FROM mr JOIN x2 ON mr.from_type = x2.t GROUP BY 1) s
               ON x2.t = s.to_type)
        SELECT x0.t AS event_type, x0.x AS x0_ppm, x1.x AS x1_ppm,
               x2.x AS x2_ppm, x3.x AS x3_ppm, ABS(x3.x - x2.x) AS delta_ppm
        FROM x0 JOIN x1 ON x0.t = x1.t JOIN x2 ON x0.t = x2.t JOIN x3 ON x0.t = x3.t
        ORDER BY event_type
      """.stripMargin.trim)),

    /** RFM segmentation: every user scored 1-4 on Recency (last activity),
      * Frequency (event count) and Monetary (exact value cents) by
      * NTILE(4) under fully tie-broken total orders (metric, user_id) —
      * deterministic cross-engine because NTILE's distribution rule is
      * SQL-standard given an identical order. Output is the segment
      * census (rfm_code = r·100 + f·10 + m): user counts and exact cent
      * mass per cell — the 64-cell behavioral map a lifecycle/marketing
      * pipeline consumes. Shape: one per-user aggregation; the R and M
      * quartiles come from exact boundary TUPLES
      * ([[TwoStageOrder.orderStatisticTuples]], both metrics fused into
      * one bracket/selection aggregation pair — no range exchange:
      * µs-grain timestamps and cent sums are tie-sparse at the probed
      * cuts, r18) compared map-side per user; the F quartile keeps the
      * ranked form ([[TwoStageOrder.ntileExact]]: range partition +
      * per-partition rank + closed-form bucket) because event COUNTS
      * are a small-integer column that can mass-tie at a quartile —
      * exactly the band-size caveat the tuple primitive documents — so
      * its one full-width range exchange is the honest shape. (The r10
      * form was three single-partition global `ntile(4)` sorts; r17
      * three range exchanges.) Then one 64-cell census agg.
      */
    QueryDef(
      "event_rfm_segments",
      (s, dir) => {
        val perUser = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(max(col("ts")).as("last_ts"),
            count(lit(1)).as("freq"),
            sum((col("value").cast(D) * 100).cast("long")).as("cents"))
          // materialized once: the F ntile's range partitioner samples
          // its input, and the R/M cut selection + the census each read
          // it again — unpinned, each pass would re-run the events
          // scan+agg
          .localCheckpoint(true)
        val cuts = TwoStageOrder.orderStatisticTuples(perUser,
          Seq(("last_ts", Seq("user_id"), TwoStageOrder.ntileCutTargets(4, "rb")),
              ("cents", Seq("user_id"), TwoStageOrder.ntileCutTargets(4, "mb"))))
        TwoStageOrder.ntileExact(perUser, 4,
            Seq(asc("freq"), asc("user_id")), "f")
          .crossJoin(broadcast(cuts))
          .withColumn("r", TwoStageOrder.bucketByCuts(4, "rb",
            "last_ts", "user_id", col("last_ts"), col("user_id")))
          .withColumn("m", TwoStageOrder.bucketByCuts(4, "mb",
            "cents", "user_id", col("cents"), col("user_id")))
          .groupBy((col("r") * 100 + col("f") * 10 + col("m")).cast("long").as("rfm_code"))
          .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents"))
          .orderBy("rfm_code")
      },
      Some("""
        WITH per_user AS (
          SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
                 CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY 1),
        scored AS (
          SELECT user_id, cents,
                 NTILE(4) OVER (ORDER BY last_ts ASC, user_id ASC) AS r,
                 NTILE(4) OVER (ORDER BY freq ASC, user_id ASC) AS f,
                 NTILE(4) OVER (ORDER BY cents ASC, user_id ASC) AS m
          FROM per_user)
        SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code,
               COUNT(*) AS n_users, CAST(SUM(cents) AS BIGINT) AS cents
        FROM scored
        GROUP BY 1
        ORDER BY rfm_code
      """.stripMargin.trim)),

    /** Peak concurrency per state — the sweep-line interval aggregation
      * (how many users were in state X at once, and when the high-water
      * mark was first reached), over the SAME [[stateChanges]]-derived
      * intervals as scd2/point-in-time. Each interval [from, to) emits
      * +1 at `from` and −1 at `to` (open current intervals emit no −1);
      * the running sum under the (ts, delta, user) total order — exits
      * before entries on ts ties, the half-open convention — visits a
      * permutation-invariant set of values per ts group, so peak and its
      * first ts are deterministic. Shape: one shuffle on user_id for the
      * interval build, one on state for the sweep; event-grain windows,
      * keyed throughout.
      */
    QueryDef(
      "event_peak_concurrency",
      (s, dir) => {
        val iw = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        val intervals = stateChanges(Tables.events(s, dir))
          .withColumn("eto", lead(col("ts"), 1).over(iw))
          .select(col("user_id"), col("event_type").as("state"),
            col("ts").as("efrom"), col("eto"))
        val pts = intervals
          .select(col("state"), col("efrom").as("pts"), lit(1L).as("delta"), col("user_id"))
          .unionByName(intervals.filter(col("eto").isNotNull)
            .select(col("state"), col("eto").as("pts"), lit(-1L).as("delta"), col("user_id")))
        val sw = Window.partitionBy("state")
          .orderBy(asc("pts"), asc("delta"), asc("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pts
          .withColumn("run", sum(col("delta")).over(sw))
          .withColumn("peak", max(col("run")).over(Window.partitionBy("state")))
          .filter(col("run") === col("peak"))
          .groupBy("state")
          .agg(min(col("peak")).as("peak_concurrency"),
            min(col("pts")).as("peak_at"))
          .orderBy("state")
      },
      Some(s"""
        WITH ${stateChangesSql},
        intervals AS (
          SELECT user_id, event_type AS state, ts AS efrom,
                 LEAD(ts) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS eto
          FROM changes),
        pts AS (
          SELECT state, efrom AS pts, CAST(1 AS BIGINT) AS delta, user_id FROM intervals
          UNION ALL
          SELECT state, eto, CAST(-1 AS BIGINT), user_id FROM intervals WHERE eto IS NOT NULL),
        swept AS (
          SELECT state, pts, user_id,
                 SUM(delta) OVER (PARTITION BY state
                   ORDER BY pts ASC, delta ASC, user_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM pts),
        peaked AS (
          SELECT state, pts, run,
                 MAX(run) OVER (PARTITION BY state) AS peak
          FROM swept)
        SELECT state, CAST(MIN(peak) AS BIGINT) AS peak_concurrency,
               MIN(pts) AS peak_at
        FROM peaked
        WHERE run = peak
        GROUP BY state
        ORDER BY state
      """.stripMargin.trim)),

    // ---- session path mining: top behavior trigrams ---------------------
    // The sequence-mining primitive behind behavioral-corpus building:
    // sessionize by 30-minute gap (the stream_sessionization_30m rule,
    // batch form), then count ordered event-type TRIGRAMS within each
    // session and release the global top-20. Every window is partitioned
    // by user (sessionization) — per-user event counts are bounded by
    // activity, not corpus size — and the trigram count is a keyed
    // aggregation; the final top-20 is a TakeOrdered, not a global
    // window. Tie-breaks: (ts, event_id) total order inside sessions,
    // (count desc, trigram asc) on release.
    QueryDef(
      "event_session_path_trigrams",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        val cum = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Tables.events(s, dir)
          .withColumn("gap_us", unix_micros(col("ts").cast("timestamp"))
            - lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
          .withColumn("is_new", when(col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("is_new")).over(cum))
        val bySess = Window.partitionBy("user_id", "session_id")
          .orderBy(asc("ts"), asc("event_id"))
        sess
          .withColumn("e2", lead(col("event_type"), 1).over(bySess))
          .withColumn("e3", lead(col("event_type"), 2).over(bySess))
          .filter(col("e2").isNotNull && col("e3").isNotNull)
          .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("e1"), asc("e2"), asc("e3"))
          .limit(20)
      },
      Some("""
        WITH marked AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
                        (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events),
        sess AS (
          SELECT user_id, event_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked),
        grams AS (
          SELECT event_type AS e1,
                 LEAD(event_type, 1) OVER (PARTITION BY user_id, session_id
                   ORDER BY ts ASC, event_id ASC) AS e2,
                 LEAD(event_type, 2) OVER (PARTITION BY user_id, session_id
                   ORDER BY ts ASC, event_id ASC) AS e3
          FROM sess)
        SELECT e1, e2, e3, COUNT(*) AS n
        FROM grams
        WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n DESC, e1, e2, e3
        LIMIT 20
      """.stripMargin.trim)),

    // ---- per-key fixed-size reservoir (deterministic K per stratum) -----
    // sample_uniform_fixed_k's per-GROUP sibling: exactly K docs per
    // source, chosen by K-smallest content hash — the per-stratum
    // eval-set / human-review-queue builder. The rank is two-stage PER
    // GROUP: a (source, content-pid) window keeps ≤K per partition (each
    // partition's cut preserves every global-top-K row), then the pooled
    // ≤P·K survivors per source — a BOUNDED frame — take the final K.
    // No per-source single-partition pass over the full stratum: the
    // big table is touched only by the first, fully-parallel window.
    QueryDef(
      "sample_reservoir_per_key",
      (s, dir) => {
        val K = 25
        val hashed = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), col("n_chars"),
            md5(col("doc_id").cast("string").cast("binary")).as("h"))
          .withColumn("pid", expr(ScalePatterns.hexIntSpark(
            "md5(CAST(CAST(doc_id AS STRING) AS BINARY))")) % 32)
        val local = Window.partitionBy("source", "pid").orderBy(asc("h"), asc("doc_id"))
        val pooled = Window.partitionBy("source").orderBy(asc("h"), asc("doc_id"))
        hashed
          .withColumn("lr", row_number().over(local)).filter(col("lr") <= K)
          .withColumn("r", row_number().over(pooled)).filter(col("r") <= K)
          .select(col("source"), col("r").cast("long").as("r"),
            col("doc_id"), col("n_chars"))
          .orderBy("source", "r")
      },
      Some("""
        SELECT source, CAST(r AS BIGINT) AS r, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r
          FROM documents) t
        WHERE r <= 25
        ORDER BY source, r
      """.stripMargin.trim)),

    // ---- native session_window (batch) ----------------------------------
    // The same 30-minute gap rule as stream_sessionization_30m, but
    // through Spark's NATIVE session_window aggregation — a keyed
    // aggregate (merge-sessions exec partitioned by user_id), no window
    // function at all, so it scales as an ordinary groupBy. The oracle
    // independently re-derives Spark's merge rule: two events share a
    // session iff gap < 30 min STRICTLY ([t, t+gap) interval overlap —
    // note the boundary differs from the lag-based analog's `> gap`
    // split), and session_end = last event + gap. A DuckDB match here
    // pins the native operator's exact boundary semantics against an
    // independent engine.
    QueryDef(
      "event_session_window_native",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("session_value"))
          .select(col("user_id"), col("sw.start").as("session_start"),
            col("sw.end").as("session_end"), col("n_events"), col("session_value"))
          .orderBy("user_id", "session_start"),
      Some("""
        WITH marked AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
                        (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) >= 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events),
        sess AS (
          SELECT user_id, ts, value,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM marked)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
      """.stripMargin.trim))
  )
}
