package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Batch analogs of streaming patterns not yet covered by EventOps:
  * stream-static enrichment joins, watermark/late-data accounting, and
  * the exactly-once dedup of an at-least-once (redelivered) feed — the
  * §2.9 upgrade the reference lacks, stated as an oracle-checkable query.
  * The live unbounded forms live in graft.streaming.EventStream.
  */
object StreamAnalogs {

  private val D = DecimalType(12, 2)

  val defs: Seq[QueryDef] = Seq(

    // ---- stream-static enrichment join ------------------------------------
    // The per-micro-batch broadcast join of a stream against a slowly-
    // changing dimension (customer segment, keyed by user_id). On a
    // cluster the dimension is broadcast once per batch — no stream-side
    // shuffle at all.
    QueryDef(
      "stream_static_enrich_segment",
      (s, dir) => {
        val dim = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
        Tables.events(s, dir)
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(D)).cast("double").as("total_value"))
          .orderBy("c_mktsegment", "event_type")
      },
      Some("""
        SELECT c_mktsegment, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events
        JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
        ORDER BY c_mktsegment, event_type
      """.stripMargin.trim)),

    // ---- late-data / watermark accounting ---------------------------------
    // Arrival order = event_id; an event is out-of-order if its event time
    // precedes the max event time already seen for that user, and would be
    // DROPPED under a 1-hour watermark if it lags that max by more than
    // 1 hour. This quantifies what a chosen watermark actually discards.
    QueryDef(
      "stream_late_arrival_accounting",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(asc("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("maxprev", max(col("us")).over(w))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("us") < col("maxprev"), 1L).otherwise(0L)).as("n_out_of_order"),
            sum(when(col("us") < col("maxprev") - 3600L * 1000000L, 1L).otherwise(0L))
              .as("n_dropped_by_1h_watermark"))
          .orderBy("user_id")
      },
      Some("""
        WITH seen AS (
          SELECT user_id, epoch_us(ts) AS us,
                 MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxprev
          FROM events)
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN us < maxprev THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
               CAST(SUM(CASE WHEN us < maxprev - 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_by_1h_watermark
        FROM seen
        GROUP BY user_id
        ORDER BY user_id
      """.stripMargin.trim)),

    // ---- exactly-once dedup of an at-least-once feed ----------------------
    // The reference's delivery is at-least-once (SURVEY §2.9): duplicates
    // are possible. Simulate a full redelivery (union of the feed with
    // itself) and recover exactly-once counts by dedup on the event key —
    // n_delivered is 2× n_after_dedup for every type iff dedup is exact.
    QueryDef(
      "stream_replay_exactly_once",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "event_type")
        val doubled = ev.unionAll(ev)
        val delivered = doubled.groupBy("event_type")
          .agg(count(lit(1)).as("n_delivered"))
        val deduped = doubled.distinct().groupBy("event_type")
          .agg(count(lit(1)).as("n_after_dedup"))
        deduped.join(delivered, "event_type")
          .select("event_type", "n_after_dedup", "n_delivered")
          .orderBy("event_type")
      },
      Some("""
        WITH doubled AS (
          SELECT event_id, event_type FROM events
          UNION ALL
          SELECT event_id, event_type FROM events),
        delivered AS (
          SELECT event_type, COUNT(*) AS n_delivered FROM doubled GROUP BY event_type),
        deduped AS (
          SELECT event_type, COUNT(*) AS n_after_dedup
          FROM (SELECT DISTINCT event_id, event_type FROM doubled) t
          GROUP BY event_type)
        SELECT event_type, n_after_dedup, n_delivered
        FROM deduped JOIN delivered USING (event_type)
        ORDER BY event_type
      """.stripMargin.trim))
  )
}
