package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.Tables

/** Round-15 diagnostic main: break the ~0.23 s/micro-batch AvailableNow
  * floor (measured by [[StreamFloorProbe]]'s batch-count sweep) into the
  * engine's own durationMs phases (walCommit / getBatch / addBatch /
  * queryPlanning / commitOffsets / latestOffset), then A/B the candidate
  * fixed-cost knobs the r14 verdict item 4 names — checkpoint fsync
  * behavior and log compaction — against the identical query. Results
  * feed the DESIGN.md round-15 streaming-floor entry.
  *
  * `scripts/run_main.sh graft.streaming.FloorExperiment`
  */
object FloorExperiment {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // phase accounting: sum each durationMs key across every progress event
    // (registered per CHILD session — the event bus is per-session)
    val phases = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def listen(s2: SparkSession): Unit = s2.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        e.progress.durationMs.forEach((k, v) =>
          phases.merge(k, v.toLong, (a: Long, b: Long) => a + b): Unit)
        phases.merge("n_batches", 1L, (a: Long, b: Long) => a + b): Unit
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[exp] $name%-52s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val ev = Tables.events(s, dir).localCheckpoint(true)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("ts").cast("timestamp").as("view_ts"))

      def passthrough(tag: String, k: Int, tune: SparkSession => Unit): Unit = {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "4")
        tune(s2)
        listen(s2)
        val baseK = graft.TmpDirs.create(s"floor-x$k")
        (0 until k).foreach { i =>
          views.filter(pmod(col("view_event_id"), lit(k)) === i).coalesce(1)
            .write.parquet(s"$baseK/in/d$i")
        }
        phases.clear()
        time(s"$tag, $k batches") {
          s2.readStream.schema(views.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$baseK/in/*")
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$baseK/ckpt")
            .trigger(Trigger.AvailableNow())
            .format("parquet").option("path", s"$baseK/out")
            .start().awaitTermination()
        }
        Thread.sleep(800) // listener bus is async; let events drain
        val snap = new java.util.TreeMap[String, Long](phases)
        println(s"      phases: $snap")
      }

      passthrough("baseline", 8, _ => ())
      passthrough("nio checkpoint manager", 8,
        s2 => s2.conf.set("spark.sql.streaming.checkpointFileManagerClass",
          "graft.streaming.LocalNioCheckpointFileManager"))
      // 4-store stateful op for comparison
      def statefulDedup(tag: String, tune: SparkSession => Unit): Unit = {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "4")
        tune(s2)
        listen(s2)
        val baseD = graft.TmpDirs.create("floor-xd")
        val evD = ev.select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("event_type"), col("value"))
        evD.coalesce(1).write.parquet(s"$baseD/in/d0")
        evD.coalesce(1).write.parquet(s"$baseD/in/d1")
        phases.clear()
        time(tag) {
          s2.readStream.schema(evD.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$baseD/in/*")
            .withWatermark("ts", "35 days")
            .dropDuplicatesWithinWatermark("event_id")
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$baseD/ckpt")
            .trigger(Trigger.AvailableNow())
            .format("parquet").option("path", s"$baseD/out")
            .start().awaitTermination()
        }
        Thread.sleep(800) // listener bus is async; let events drain
        val snap = new java.util.TreeMap[String, Long](phases)
        println(s"      phases: $snap")
      }
      statefulDedup("dedup-within-watermark baseline", _ => ())
      statefulDedup("dedup-within-watermark nio manager",
        s2 => s2.conf.set("spark.sql.streaming.checkpointFileManagerClass",
          "graft.streaming.LocalNioCheckpointFileManager"))
    }
    spark.stop()
  }
}
