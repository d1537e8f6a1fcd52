package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState,
  TimeMode, TimerValues, Trigger, TTLConfig, ValueState, MapState}

import graft.{QueryDef, Tables}

/** The backfilled state a user carries into the stream: the batch
  * aggregate of everything BEFORE the cutover, including the per-type
  * counts (a Map column — each entry lands as its own RocksDB key via
  * MapState, so a wide history never round-trips as one blob). */
final case class UInit(user_id: Long, n: Long, sum_e2: Long, max_ts_us: Long,
    types: Map[String, Long])

/** `StatefulProcessorWithInitialState` — the LAMBDA-MIGRATION shape:
  * bootstrap the streaming state store from a BATCH backfill, then
  * continue live. The batch job aggregates the historical half of the
  * feed into one row per user; `handleInitialState` seeds ValueState +
  * MapState from it before the first micro-batch, and the stream then
  * processes only post-cutover events — emitting cumulative snapshots
  * that must be indistinguishable from a stream that had seen the
  * whole feed. That equivalence is the oracle: DuckDB computes the
  * full-history cumulative algebra, restricted to post-cutover
  * activity windows.
  *
  * At 100 TB this is how a stateful pipeline deploys at all: replaying
  * months of history through micro-batches to warm state is a
  * non-starter; the backfill is one batch aggregation and the stream
  * starts at the cutover offset.
  */
private class WarmStartProcessor(cut2Us: Long)
    extends StatefulProcessorWithInitialState[Long, UEvt, USnap, UInit] {

  @transient private var agg: ValueState[(Long, Long, Long)] = _
  @transient private var typeCounts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState[(Long, Long, Long)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)
    typeCounts = getHandle.getMapState[String, Long]("typeCounts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long, initialState: UInit,
      timerValues: TimerValues): Unit = {
    agg.update((initialState.n, initialState.sum_e2, initialState.max_ts_us))
    initialState.types.foreach { case (t, c) => typeCounts.updateValue(t, c) }
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
    val seq = if (mx >= cut2Us) 1L else 0L
    Iterator.single(USnap(key, seq, mx, n, sum, typeCounts.keys().size.toLong))
  }
}

object StateV2Init {

  private val CUT1 = "2024-01-16" // batch/stream cutover
  private val CUT2 = "2024-01-23" // boundary between the two live batches
  private def usOf(d: String): Long = java.time.LocalDate.parse(d).atStartOfDay
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  val warmStart: QueryDef = QueryDef(
    "stream_tws_initial_state_live",
    (s0, dir) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val ev = Tables.events(s, dir).select(
        col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("v2"),
        col("event_id"))
      implicit val evtEnc: Encoder[UEvt] = Encoders.product[UEvt]
      implicit val snapEnc: Encoder[USnap] = Encoders.product[USnap]
      implicit val initEnc: Encoder[UInit] = Encoders.product[UInit]
      // --- the batch backfill: aggregate the pre-cutover history ---
      // totals and the per-type map come from the (user, type) grain in
      // one shuffle: per-type partials roll up to the user totals
      val init = ev.filter(col("ts_us") < usOf(CUT1))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"), sum(col("v2")).as("sv"),
          max(col("ts_us")).as("mt"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("n"), sum(col("sv")).as("sum_e2"),
          max(col("mt")).as("max_ts_us"),
          map_from_entries(collect_list(struct(col("event_type"), col("c"))))
            .as("types"))
        .as[UInit]
        .groupByKey(_.user_id)(Encoders.scalaLong)
      // --- the live side: post-cutover events, two pinned drops ---
      val base = graft.TmpDirs.create("graft-tws-init")
      val tsCol = expr("timestamp_micros(ts_us)")
      ev.filter(tsCol >= lit(CUT1).cast("timestamp") &&
          tsCol < lit(CUT2).cast("timestamp"))
        .coalesce(1).write.parquet(s"$base/in/d0")
      ev.filter(tsCol >= lit(CUT2).cast("timestamp"))
        .coalesce(1).write.parquet(s"$base/in/d1")
      val t0 = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L)
      val t1 = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L)
      for ((d, t) <- Seq("d0" -> t0, "d1" -> t1)) {
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/in/$d"))
          .forEach(p => java.nio.file.Files.setLastModifiedTime(p, t))
      }
      val ckptScheme =
        if (s.sparkContext.hadoopConfiguration.get("fs.file.impl", "")
            .contains("RawLocalFileSystem")) "localfs://" else ""
      val snaps = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
        .as[UEvt]
        .groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(new WarmStartProcessor(usOf(CUT2)),
          TimeMode.None(), OutputMode.Append(), init,
          Encoders.product[USnap], Encoders.product[UInit])
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
               CASE WHEN ts >= TIMESTAMP '$CUT2' THEN 1
                    WHEN ts >= TIMESTAMP '$CUT1' THEN 0
                    ELSE -1 END AS h
        FROM events),
      live AS (SELECT DISTINCT user_id, h FROM e WHERE h >= 0)
      SELECT lv.user_id,
             CAST(lv.h AS BIGINT) AS batch_half,
             MAX(e.ts_us) AS upto_ts_us,
             COUNT(*) AS n_cum,
             CAST(SUM(e.v2) AS BIGINT) AS sum_cum_e2,
             CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types_cum
      FROM live lv JOIN e ON e.user_id = lv.user_id AND e.h <= lv.h
      GROUP BY 1, 2
      ORDER BY 1, 2
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(warmStart)
}
