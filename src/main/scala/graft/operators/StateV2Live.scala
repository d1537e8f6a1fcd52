package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState, MapState}

import graft.{QueryDef, Tables}

/** The event row as the stateful processor sees it: timestamps as UTC
  * microseconds and money as exact cents, so every piece of state is a
  * plain integer (no floating accumulation order to disagree on). */
final case class UEvt(user_id: Long, ts_us: Long, event_type: String, v2: Long)

/** One cumulative snapshot per (user, micro-batch): everything the user
  * has done up to and including that batch. `batch_half` is derived
  * from the DATA (max event time vs the drop boundary), not from the
  * engine's batch counter, so the emitted rows are a pure function of
  * the input partitioning — the determinism the hash oracle needs. */
final case class USnap(user_id: Long, batch_half: Long, upto_ts_us: Long,
    n_cum: Long, sum_cum_e2: Long, n_types_cum: Long)

/** Spark 4 `transformWithState` — the arbitrary-state streaming API that
  * replaces `flatMapGroupsWithState` (SPARK-40434, "State API v2"):
  * typed named state primitives (`ValueState`, `MapState`) on the
  * RocksDB state store, instead of one opaque state object per key.
  *
  * The processor keeps, per user: a `ValueState[(n, sum_e2, max_ts)]`
  * running aggregate and a `MapState[event_type, count]` — the map
  * grows per-ENTRY in RocksDB (each type is its own store key), so a
  * key with a million map entries never round-trips as one blob, which
  * is the scale reason this API exists. Each micro-batch emits one
  * cumulative snapshot per active user.
  *
  * Reference scope: the NPM mirror's consumer keeps exactly this shape
  * of per-key running state (last seq, per-status counters —
  * `data_pipeline/npm-mirror/app/changes_consumer.py:44-56`) in process
  * memory; this is the fault-tolerant, checkpointed form.
  */
private class CumStatsProcessor(midUs: Long)
    extends StatefulProcessor[Long, UEvt, USnap] {

  @transient private var agg: ValueState[(Long, Long, Long)] = _
  @transient private var typeCounts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState[(Long, Long, Long)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)
    typeCounts = getHandle.getMapState[String, Long]("typeCounts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[UEvt],
      timerValues: TimerValues): Iterator[USnap] = {
    var (n, sum, mx) =
      if (agg.exists()) agg.get() else (0L, 0L, Long.MinValue)
    rows.foreach { e =>
      n += 1; sum += e.v2
      if (e.ts_us > mx) mx = e.ts_us
      val prev = if (typeCounts.containsKey(e.event_type))
        typeCounts.getValue(e.event_type) else 0L
      typeCounts.updateValue(e.event_type, prev + 1L)
    }
    agg.update((n, sum, mx))
    val half = if (mx >= midUs) 1L else 0L
    Iterator.single(USnap(key, half, mx, n, sum, typeCounts.keys().size.toLong))
  }
}

/** LIVE `transformWithState` query — see [[CumStatsProcessor]]. The two
  * event-time halves of the feed are dropped as two files whose
  * modification times are explicitly pinned (batch 0 strictly older),
  * so the file source's modTime ordering — and therefore the cumulative
  * snapshots — is deterministic. The DuckDB oracle re-derives the
  * snapshot algebra relationally: for every (user, half) with activity,
  * aggregate everything at or before that half.
  */
object StateV2Live {

  private val MID = "2024-01-16"
  private val MID_US = java.time.LocalDate.parse(MID).atStartOfDay
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  val cumStats: QueryDef = QueryDef(
    "stream_transform_with_state_live",
    (s0, dir) => {
      val s = s0.newSession()
      // state-store sizing + the provider the v2 state API is built on
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val ev = Tables.events(s, dir).select(
        col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("v2"))
      val base = java.nio.file.Files.createTempDirectory("graft-tws").toString
      val mid = lit(MID).cast("timestamp")
      val tsCol = expr("timestamp_micros(ts_us)")
      // order-DEPENDENT emission ⇒ the drops are written sequentially and
      // their modTimes pinned 60 s apart (FileStreamSource orders by
      // modTime; the concurrent-write trick the order-independent live
      // queries use would leave batch order to filesystem timing)
      ev.filter(tsCol < mid).coalesce(1).write.parquet(s"$base/in/d0")
      ev.filter(tsCol >= mid).coalesce(1).write.parquet(s"$base/in/d1")
      val t0 = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L)
      val t1 = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L)
      for ((d, t) <- Seq("d0" -> t0, "d1" -> t1)) {
        val dp = java.nio.file.Paths.get(s"$base/in/$d")
        java.nio.file.Files.list(dp).forEach(p =>
          java.nio.file.Files.setLastModifiedTime(p, t))
      }
      implicit val evtEnc: Encoder[UEvt] = Encoders.product[UEvt]
      implicit val snapEnc: Encoder[USnap] = Encoders.product[USnap]
      val snaps = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
        .as[UEvt]
        .groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(new CumStatsProcessor(MID_US),
          TimeMode.None(), OutputMode.Append())
      // RocksDB's checkpoint file manager hard-casts to Hadoop's checksum
      // LocalFileSystem; under the test JVM's RawLocalFileSystem default
      // the checkpoint must route through the localfs:// scheme instead
      // (graft.testfs.ChecksumLocalFs — same discipline as RetentionSpec)
      val ckptScheme =
        if (s.sparkContext.hadoopConfiguration.get("fs.file.impl", "")
            .contains("RawLocalFileSystem")) "localfs://" else ""
      snaps.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$ckptScheme$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", s"$base/out")
        .start()
        .awaitTermination()
      s.read.parquet(s"$base/out").orderBy("user_id", "batch_half")
        .select("user_id", "batch_half", "upto_ts_us", "n_cum",
          "sum_cum_e2", "n_types_cum")
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v2,
               CASE WHEN ts >= TIMESTAMP '$MID' THEN 1 ELSE 0 END AS h
        FROM events),
      halves AS (SELECT DISTINCT user_id, h FROM e)
      SELECT hv.user_id,
             CAST(hv.h AS BIGINT) AS batch_half,
             MAX(e.ts_us) AS upto_ts_us,
             COUNT(*) AS n_cum,
             CAST(SUM(e.v2) AS BIGINT) AS sum_cum_e2,
             CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types_cum
      FROM halves hv JOIN e ON e.user_id = hv.user_id AND e.h <= hv.h
      GROUP BY 1, 2
      ORDER BY 1, 2
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(cumStats)
}
