package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Streaming analytics over an event stream — the §2.9 extension surface:
  * event-time windows under a watermark, and streaming dedup. The
  * expressions are the same ones the batch analogs in
  * operators.EventOps declare (oracle-checked there); these bind them to
  * unbounded sources with late-data semantics.
  */
object EventStream {

  /** Tumbling 1-hour aggregation with a 30-minute watermark: late events
    * beyond the watermark are dropped, windows finalize (append mode)
    * once the watermark passes their end.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Exactly-once-per-event_id streaming dedup: state bounded by the
    * watermark (event_ids older than 1 hour are forgotten — the
    * exactly-once upgrade of SURVEY §2.9 without unbounded state).
    */
  def dedupByEventId(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based streaming sessionization: session_window(30 min) under a
    * watermark — the unbounded twin of the batch lag/cumsum form in
    * operators.EventOps (stream_sessionization_30m). Sessions close and
    * emit once the watermark passes their gap; state per (user, open
    * session) only.
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))

  /** Stream-static enrichment: the unbounded twin of the batch
    * stream_static_enrich_segment query (operators.StreamAnalogs). The
    * static dimension is broadcast per micro-batch, so the stream side
    * never shuffles; dimension updates are picked up on re-plan.
    */
  def enrichWithSegments(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(F.broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"))

  /** Stream-stream interval join: each error joined to the same user's
    * clicks in the preceding hour. Both sides carry watermarks, so the
    * join state is bounded (watermark + interval decides when a buffered
    * click can never match a future error and is evicted) — the
    * unbounded-input version of the bucketed batch range join in
    * operators.TemporalJoins. Also valid on batch DataFrames (watermark
    * is a no-op there), which is how the spec proves batch equivalence.
    */
  def clicksBeforeErrors(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", "30 minutes")
    errors.join(clicks,
      col("c_user") === col("e_user") &&
      col("click_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR") &&
      col("click_ts") <= col("error_ts"))
      .select(col("e_user").as("user_id"), col("error_id"), col("error_ts"),
        col("click_id"), col("click_ts"))
  }
}

/** A3 — the producer's lag/stall watchdog as a pure, testable policy
  * (reference: node_app/producer.ts:206-242; README.md:126-128):
  *  - capture the first observed lag as init_lag;
  *  - restart when lag > init_lag + 200 (lag grew);
  *  - shrink init_lag when lag < init_lag - 200 (pipeline caught up);
  *  - restart when last_seq is unchanged for 10 consecutive polls.
  * The driver loop applies Restart by stopping + resubmitting the query
  * from its checkpoint (NpmStream.currentLag supplies the lag).
  */
class LagPolicy(growThreshold: Long = 200, stallPolls: Int = 10) extends Serializable {
  sealed trait Decision
  case object Ok extends Decision
  case object Restart extends Decision

  private var initLag: Option[Long] = None
  private var lastSeq: Long = -1L
  private var unchanged: Int = 0

  def observe(newestSeq: Long, processedSeq: Long): Decision = {
    val lag = newestSeq - processedSeq
    if (initLag.isEmpty) initLag = Some(lag)

    if (processedSeq == lastSeq) unchanged += 1 else { unchanged = 0; lastSeq = processedSeq }
    if (unchanged >= stallPolls) { unchanged = 0; return Restart }

    if (lag > initLag.get + growThreshold) { initLag = Some(lag); Restart }
    else {
      if (lag < initLag.get - growThreshold) initLag = Some(lag)
      Ok
    }
  }

  def currentInitLag: Option[Long] = initLag
}

/** K8/A1-A4/A7 — pipeline metrics via StreamingQueryListener, replacing
  * the reference's Prometheus counters/gauges/summaries
  * (changes_consumer.py:38-42, producer.ts:111-125):
  *   npm_update_counter        → totalInputRows (monotonic counter)
  *   last_seq_processed gauge  → per-query latest batch watermark/rows
  *   request_processing_seconds→ batchDurationsMs (summary source)
  *   download_queue_length     → inputRowsPerSecond vs processedRowsPerSecond
  */
class GraftMetricsListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  import scala.collection.mutable

  @volatile var totalInputRows: Long = 0L
  val batchDurationsMs: mutable.Buffer[Long] = mutable.Buffer.empty
  val progressEvents: mutable.Buffer[String] = mutable.Buffer.empty
  /** in-query `observe()` metric rows per batch, keyed by observation
    * name — the Prometheus-counter vehicle for DERIVED per-stage counts
    * (e.g. dlq rows per reason) that plain numInputRows can't carry */
  val observedMetrics: mutable.Buffer[(String, Map[String, Any])] =
    mutable.Buffer.empty
  @volatile var lastInputRowsPerSecond: Double = 0.0

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    progressEvents += s"started:${event.name}"

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    // the VOLATILE counter is written LAST: an unsynchronized reader that
    // polls totalInputRows gets a happens-before edge to the buffer
    // appends above it (piggybacked ordering) — with the counter first,
    // a reader could observe rows >= n while the matching batch: entry
    // is still invisible (the flake EventStreamSpec:85 chased in r6)
    batchDurationsMs += p.batchDuration
    lastInputRowsPerSecond = p.inputRowsPerSecond
    progressEvents += s"batch:${p.batchId}:${p.numInputRows}"
    p.observedMetrics.forEach { (name, row) =>
      observedMetrics += name ->
        row.schema.fieldNames.map(f => f -> row.getAs[Any](f)).toMap
    }
    totalInputRows += p.numInputRows
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    progressEvents += "terminated"
}
