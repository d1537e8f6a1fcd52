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
  * A second mode (`sweep` argument, r17 verdict item 4) root-causes the
  * 250k-key RocksDB inversion (24.6 s vs HDFS-backed 9.7 s in the r17
  * table): the same workload under RocksDB knob arms — changelog
  * checkpointing (skip the full-SST-set upload each commit),
  * trackTotalNumberOfRows=false (skip the read-before-write each put
  * pays to maintain the row counter), a bigger memtable, and the
  * combinations — next to an HDFS-backed reference in the same window.
  * Results recorded in DESIGN.md round-18.
  *
  * Usage: scripts/run_main.sh graft.streaming.RetentionScaleProbe [sweep]
  */
object RetentionScaleProbe {
  private val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Rdb = "spark.sql.streaming.stateStore.rocksdb"

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

    // (arm name, keys, provider, extra conf) per run; default mode is the
    // r16-verdict decade table, sweep mode the r17-verdict knob matrix
    val runs: Seq[(String, Int, String, Map[String, String])] =
      if (args.headOption.contains("sweep")) {
        val k = 250000
        Seq(
          ("hdfs_ref", k, HdfsProvider, Map.empty),
          ("rocksdb_default", k, RocksProvider, Map.empty),
          ("rocksdb_changelog", k, RocksProvider,
            Map(s"$Rdb.changelogCheckpointing.enabled" -> "true")),
          ("rocksdb_notrack", k, RocksProvider,
            Map(s"$Rdb.trackTotalNumberOfRows" -> "false")),
          ("rocksdb_changelog_notrack", k, RocksProvider,
            Map(s"$Rdb.changelogCheckpointing.enabled" -> "true",
              s"$Rdb.trackTotalNumberOfRows" -> "false")),
          ("rocksdb_changelog_notrack_wb256", k, RocksProvider,
            Map(s"$Rdb.changelogCheckpointing.enabled" -> "true",
              s"$Rdb.trackTotalNumberOfRows" -> "false",
              s"$Rdb.writeBufferSizeMB" -> "256")))
      } else {
        for (k <- Seq(25000, 250000); (p, c) <- Seq(
          "hdfs" -> HdfsProvider, "rocksdb" -> RocksProvider))
          yield (p, k, c, Map.empty[String, String])
      }
    for ((pname, k, pclass, extra) <- runs) {
      // isolated session per run: own SQLConf so the provider swap and
      // checkpoint never leak across arms
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass", pclass)
      extra.foreach { case (ck, cv) => s2.conf.set(ck, cv) }
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
