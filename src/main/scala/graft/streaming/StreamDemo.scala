package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the CUSTOM DSv2 surface: the
  * `npm-changes-feed` MicroBatchStream source feeds the full consumer
  * pipeline, the catalog is serialized back to JSON lines, and the
  * `npm-feed-sink` StreamingWrite lands it epoch-committed.
  * `scripts/run_main.sh graft.streaming.StreamDemo [feedDir]`
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark

    val base = graft.TmpDirs.create("streamdemo")
    val feedDir = args.headOption.getOrElse {
      val dir = s"$base/feed"
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "changes-000.jsonl"), Seq(
        """{"seq":1,"id":"left-pad","doc":{"_id":"left-pad","_rev":"9-r","name":"left-pad","dist-tags":{"latest":"v1.3.0"},"versions":{"v1.3.0":{"version":"v1.3.0","dist":{"tarball":"http://r/lp.tgz","unpackedSize":12,"shasum":"s"}}},"time":{"v1.3.0":"2018-04-10T00:00:00.000Z","created":"2014-03-17T00:00:00.000Z","modified":"2018-04-10T00:00:00.000Z"}}}""",
        """{"seq":2,"id":"ghost-pkg"}""").mkString("\n").getBytes("UTF-8"))
      dir
    }

    // custom source → pipeline → parquet sinks (idempotent per batch)
    val src = spark.readStream.format("npm-changes-feed")
      .option("path", feedDir).load()
    NpmStream.start(spark, src, s"$base/out", s"$base/ckpt").awaitTermination()

    // catalog → JSON lines → custom epoch-committed sink
    val catalogJson = spark.readStream
      .schema(spark.read.parquet(s"$base/out/catalog").schema)
      .parquet(s"$base/out/catalog")
      .select(to_json(struct(col("*"))).as("value"))
    val q = catalogJson.writeStream
      .format("npm-feed-sink")
      .option("path", s"$base/export")
      .option("checkpointLocation", s"$base/ckpt-export")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    println("=== catalog (parquet sink) ===")
    spark.read.parquet(s"$base/out/catalog")
      .select("package_name", "change_seq_id", "package_latest_version", "change_save_path")
      .show(false)
    println("=== exported JSONL (npm-feed-sink, epoch-committed) ===")
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(s"$base/export")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.toString.contains("_tmp"))
      .foreach { p => println(s"--- $p"); Files.readAllLines(p).asScala.foreach(println) }
    spark.stop()
  }
}
