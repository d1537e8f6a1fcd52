package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** Diagnostic main: decomposes the live-streaming queries' wall time into
  * (input staging) + (AvailableNow engine floor) + (stateful probe), and
  * A/Bs the default vs RocksDB state store — the r8 verdict asked for the
  * 12.5 s streaming floor to be attributed before it is accepted as the
  * permanent price. Results recorded in DESIGN.md §round 9; the r12
  * batch-count sweep (fixed vs marginal per-batch floor) feeds the
  * per-live-query attribution table in DESIGN.md §round 12.
  *
  * `scripts/run_main.sh graft.streaming.StreamFloorProbe`
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[floor] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
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
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"),
          col("event_id").as("purchase_event_id"),
          col("ts").cast("timestamp").as("purchase_ts"))
      val mid = lit("2024-01-16").cast("timestamp")

      // 1a. staging, serial (the r8 shape)
      val baseA = graft.TmpDirs.create("floor-ser")
      time("staging 4 writes SERIAL") {
        views.filter(col("view_ts") < mid).coalesce(1).write.parquet(s"$baseA/v/d0")
        views.filter(col("view_ts") >= mid).coalesce(1).write.parquet(s"$baseA/v/d1")
        purchases.filter(col("purchase_ts") < mid).coalesce(1).write.parquet(s"$baseA/p/d0")
        purchases.filter(col("purchase_ts") >= mid).coalesce(1).write.parquet(s"$baseA/p/d1")
      }
      // 1b. staging, parallel futures
      val baseB = graft.TmpDirs.create("floor-par")
      time("staging 4 writes PARALLEL") {
        import scala.concurrent.duration.Duration
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.sequence(Seq(
          Future(views.filter(col("view_ts") < mid).coalesce(1).write.parquet(s"$baseB/v/d0")),
          Future(views.filter(col("view_ts") >= mid).coalesce(1).write.parquet(s"$baseB/v/d1")),
          Future(purchases.filter(col("purchase_ts") < mid).coalesce(1).write.parquet(s"$baseB/p/d0")),
          Future(purchases.filter(col("purchase_ts") >= mid).coalesce(1).write.parquet(s"$baseB/p/d1")))),
          Duration.Inf)
      }

      // 2. no-op passthrough floor: same 2-file source, no stateful op
      time("AvailableNow passthrough (2 batches, no state)") {
        val vs = s.readStream.schema(views.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$baseA/v/*")
        vs.writeStream.outputMode("append")
          .option("checkpointLocation", s"$baseA/ckpt-noop")
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", s"$baseA/out-noop")
          .start().awaitTermination()
      }

      // 2b. floor vs BATCH COUNT: K staged files → K AvailableNow
      // micro-batches through a stateless passthrough — the marginal
      // per-batch engine cost (offset log round-trip + parquet sink
      // commit) separated from the per-query fixed cost (stream start +
      // final watermark flush + awaitTermination teardown). Feeds the
      // r12 per-live-query floor attribution table in DESIGN.md: a live
      // query's floor ≈ fixed + batches · marginal, and its state work
      // is the bench-min residual above floor + staging.
      for (k <- Seq(1, 2, 4)) {
        val baseK = graft.TmpDirs.create(s"floor-k$k")
        (0 until k).foreach { i =>
          views.filter(pmod(col("view_event_id"), lit(k)) === i).coalesce(1)
            .write.parquet(s"$baseK/in/d$i")
        }
        time(s"AvailableNow passthrough, $k batch(es)") {
          s.readStream.schema(views.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$baseK/in/*")
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$baseK/ckpt")
            .trigger(Trigger.AvailableNow())
            .format("parquet").option("path", s"$baseK/out")
            .start().awaitTermination()
        }
      }

      // 3. stateful interval join, default (HDFSBackedStateStore)
      def joinRun(tag: String, ckptSuffix: String): Unit = time(tag) {
        val vStream = s.readStream.schema(views.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$baseA/v/*")
          .withWatermark("view_ts", "35 days")
        val pStream = s.readStream.schema(purchases.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$baseA/p/*")
          .withWatermark("purchase_ts", "35 days")
        vStream.join(pStream,
            col("user_id") === col("p_user_id") &&
            col("purchase_ts") > col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
          .select("user_id", "view_event_id", "purchase_event_id")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$baseA/ckpt-$ckptSuffix")
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", s"$baseA/out-$ckptSuffix")
          .start().awaitTermination()
      }
      joinRun("interval join, DEFAULT state store", "j-def")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      joinRun("interval join, ROCKSDB state store", "j-rdb")
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")

      // 4. dedup-within-watermark, default vs RocksDB
      val evD = Tables.events(s, dir).select(col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
      val baseD = graft.TmpDirs.create("floor-dd")
      evD.coalesce(1).write.parquet(s"$baseD/in/d0")
      evD.coalesce(1).write.parquet(s"$baseD/in/d1")
      def dedupRun(tag: String, ckptSuffix: String): Unit = time(tag) {
        s.readStream.schema(evD.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$baseD/in/*")
          .withWatermark("ts", "35 days")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$baseD/ckpt-$ckptSuffix")
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", s"$baseD/out-$ckptSuffix")
          .start().awaitTermination()
      }
      dedupRun("dedup-within-watermark, DEFAULT store", "d-def")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      dedupRun("dedup-within-watermark, ROCKSDB store", "d-rdb")
    }
    spark.stop()
  }
}
