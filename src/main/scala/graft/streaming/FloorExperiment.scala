package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.Tables

/** Streaming-floor diagnostic main (r14 item 4 / r15 verdict item 5):
  * break the per-micro-batch AvailableNow floor into the engine's own
  * durationMs phases and A/B the fixed-cost knobs against the identical
  * query. Round 15 attributed ~125 ms/batch to metadata-log I/O and cut
  * it with [[LocalNioCheckpointFileManager]]; THIS round decomposes the
  * remaining floor under the NIO manager: sink-manifest cost (memory
  * sink arm), the trailing no-data batch (noDataMicroBatches arm), and
  * the plain per-job scheduling floor the streaming numbers sit on
  * (batch-loop arm — the same file written the same way, no streaming
  * engine at all). Results feed the DESIGN.md round-16 entry.
  *
  * Phase accounting is PER RUN (r15 advice): each run registers its own
  * listener + map and drains deterministically — poll until the
  * listener has seen one event per entry of the query's own
  * recentProgress array, bounded by a timeout that WARNs on partial
  * sums — so a slow bus can no longer bleed one run's late events into
  * the next run's snapshot. The listener is removed before the method
  * returns.
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

    /** Run one streaming query with a PRIVATE listener and print its
      * wall time + per-batch durationMs phase decomposition. The drain
      * polls until the async bus has delivered one progress event per
      * entry in the query's own recentProgress array (ring-buffered at
      * spark.sql.streaming.numRecentProgressUpdates = 100 — fine for
      * the K=8 sweeps here; a >100-batch sweep would under-count and
      * the timeout warning below would fire). */
    def timedRun(s2: SparkSession, tag: String)(
        start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val phases = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          e.progress.durationMs.forEach((k, v) =>
            phases.merge(k, v.toLong, (a: Long, b: Long) => a + b): Unit)
          phases.merge("n_batches", 1L, (a: Long, b: Long) => a + b): Unit
          seen.incrementAndGet(): Unit
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      s2.streams.addListener(listener)
      try {
        val t0 = System.nanoTime()
        val q = start
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        // deterministic drain: the query's own progress array says how
        // many batches ran; wait until the async bus delivered them all
        val expected = q.recentProgress.length.toLong
        val deadline = System.nanoTime() + 10_000_000_000L
        while (seen.get() < expected && System.nanoTime() < deadline)
          Thread.sleep(20)
        if (seen.get() < expected)
          println(s"[exp] WARN: drain timed out at ${seen.get()}/$expected " +
            "progress events — phase sums below are PARTIAL")
        val n = math.max(phases.getOrDefault("n_batches", 1L), 1L)
        val tm = new java.util.TreeMap[String, Long](phases)
        println(f"[exp] $tag%-44s $wall%7.3f s  n=$n%2d  " +
          f"perBatch=${wall * 1000 / n}%6.1f ms")
        val tot = phases.getOrDefault("triggerExecution", 0L)
        val named = Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
          "walCommit", "commitOffsets").map(phases.getOrDefault(_, 0L)).sum
        println(s"      phases: $tm")
        println(f"      per-batch ms: trigger=${tot.toDouble / n}%6.1f " +
          f"addBatch=${phases.getOrDefault("addBatch", 0L).toDouble / n}%6.1f " +
          f"unattributed-in-trigger=${(tot - named).toDouble / n}%6.1f " +
          f"outside-trigger=${(wall * 1000 - tot) / n}%6.1f")
      } finally s2.streams.removeListener(listener)
    }

    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val ev = Tables.events(s, dir).localCheckpoint(true)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("ts").cast("timestamp").as("view_ts"))

      val K = 8
      def stage(k: Int): String = {
        val baseK = graft.TmpDirs.create(s"floor-x$k")
        (0 until k).foreach { i =>
          views.filter(pmod(col("view_event_id"), lit(k)) === i).coalesce(1)
            .write.parquet(s"$baseK/in/d$i")
        }
        baseK
      }

      def passthrough(tag: String, sink: String, tune: SparkSession => Unit): Unit = {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "4")
        s2.conf.set("spark.sql.streaming.checkpointFileManagerClass",
          "graft.streaming.LocalNioCheckpointFileManager")
        tune(s2)
        val baseK = stage(K)
        timedRun(s2, s"$tag, $K batches") {
          val r = s2.readStream.schema(views.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$baseK/in/*")
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$baseK/ckpt")
            .trigger(Trigger.AvailableNow())
          (if (sink == "memory") r.format("memory").queryName("floor_mem")
           else r.format("parquet").option("path", s"$baseK/out")).start()
        }
        // the memory sink retains the full stream output on the driver
        // heap behind the registered temp view — drop it so GC pressure
        // from one arm cannot skew the ~15-25 ms residuals the LATER
        // arms exist to measure
        if (sink == "memory") s2.catalog.dropTempView("floor_mem"): Unit
      }

      // r15 baseline pair (default manager vs NIO) kept for continuity
      {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "4")
        val baseK = stage(K)
        timedRun(s2, s"default manager, $K batches") {
          s2.readStream.schema(views.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$baseK/in/*")
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$baseK/ckpt")
            .trigger(Trigger.AvailableNow())
            .format("parquet").option("path", s"$baseK/out").start()
        }
      }
      passthrough("nio manager", "parquet", _ => ())
      // names the FileStreamSink manifest cost by difference
      passthrough("nio + memory sink", "memory", _ => ())
      // drops the trailing empty micro-batch AvailableNow schedules
      passthrough("nio + noDataMicroBatches off", "parquet",
        _.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false"))

      // the non-streaming floor the per-batch number sits on: the same
      // one-file read→write executed K times as plain batch jobs
      {
        val baseK = stage(K)
        val t0 = System.nanoTime()
        (0 until K).foreach { i =>
          s.read.schema(views.schema).parquet(s"$baseK/in/d$i")
            .write.mode("append").parquet(s"$baseK/outb")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[exp] batch-loop floor (no streaming), $K jobs     " +
          f"$wall%7.3f s  perJob=${wall * 1000 / K}%6.1f ms")
      }
    }
    spark.stop()
  }
}
