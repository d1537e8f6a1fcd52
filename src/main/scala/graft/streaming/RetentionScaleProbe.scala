package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.npm.Retention
import graft.npm.Retention.ZipArrival

/** Diagnostic main (r16 verdict item 7): A5 retention state at ×10 key
  * cardinality under BOTH state-store providers, measured — the
  * Retention scaladoc argues O(#packages) state is fine at millions of
  * packages; this pins one decade of that growth with numbers instead
  * of prose. For K ∈ {25k, 250k} package dirs × 6 arrivals each
  * (arrival 6 observes 5 existing files → every key evicts exactly
  * once), fed as 6 K-row micro-batches through the declared
  * `flatMapGroupsWithState` operator, it reports wall time, eviction
  * count, and the engine's own state-store metrics (numRowsTotal,
  * memoryUsedBytes, RocksDB custom metrics when that provider is
  * active). Results recorded in DESIGN.md round-17.
  *
  * Usage: scripts/run_main.sh graft.streaming.RetentionScaleProbe
  */
object RetentionScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalNioCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    for (k <- Seq(25000, 250000); (pname, pclass) <- providers) {
      // isolated session per run: own SQLConf so the provider swap and
      // checkpoint never leak across arms
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass", pclass)
      import s2.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
      val ckpt = graft.TmpDirs.create("graft-retscale-ck")
      val input = MemoryStream[ZipArrival]
      val sinkName = s"retscale_${pname}_$k"
      val q = Retention.streamingEvictions(input.toDS())(s2)
        .writeStream.format("memory").queryName(sinkName)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      try {
        (1 to 6).foreach { b =>
          input.addData((0 until k).map(p =>
            ZipArrival(s"dir-$p", f"f$b.zip", b.toLong, retention_triggered = true)): _*)
          q.processAllAvailable()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val nEv = s2.table(sinkName).count()
        val so = Option(q.lastProgress).map(_.stateOperators).filter(_.nonEmpty)
        val rows = so.map(_(0).numRowsTotal).getOrElse(-1L)
        val mem = so.map(_(0).memoryUsedBytes).getOrElse(-1L)
        val custom = so.map(_(0).customMetrics).map { m =>
          Seq("rocksdbTotalMemoryUsage", "rocksdbSstFileSize")
            .flatMap(key => Option(m.get(key)).map(v => s""""$key":$v"""))
            .mkString(",")
        }.filter(_.nonEmpty).map("," + _).getOrElse("")
        println(s"""{"metric":"retention_state_scale","provider":"$pname","keys":$k,"evictions":$nEv,"sec":${f"$dt%.2f"},"state_rows":$rows,"state_memory_bytes":$mem$custom}""")
      } finally {
        q.stop()
        try org.apache.spark.sql.graftaccess.StateStoreAccess.unloadAll()
        catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
