package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.npm.Fixtures
import org.apache.spark.sql.functions._

class NpmStreamSpec extends SparkSpec {

  import spark.implicits._

  private def writeFeed(dir: String, lines: Seq[String], name: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
  }

  test("streaming file-source replay produces the same catalog as batch") {
    val base = Files.createTempDirectory("npmstream").toString
    val feedDir = s"$base/feed"
    writeFeed(feedDir, Fixtures.withFetch404, "changes-0.jsonl")

    val q = NpmStream.start(spark,
      NpmStream.fileSource(spark, feedDir),
      outDir = s"$base/out", checkpointDir = s"$base/ckpt",
      fetcher = Fixtures.RoutingFetcher)
    q.awaitTermination()

    val catalog = spark.read.parquet(s"$base/out/catalog")
    assert(catalog.select("change_seq_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L, 4L, 8L, 13L))
    val skipped = spark.read.parquet(s"$base/out/skipped")
    assert(skipped.filter(col("seq").isNotNull).count() == 6)
  }

  test("streaming retention carries per-package state across batches and restarts") {
    val base = Files.createTempDirectory("npmret").toString
    val feedDir = s"$base/feed"
    def change(seq: Int): String =
      s"""{"seq":$seq,"id":"hotpkg","doc":{"_id":"hotpkg","_rev":"$seq-r","name":"hotpkg","dist-tags":{"latest":"1.0.$seq"},"versions":{"1.0.$seq":{"version":"1.0.$seq","dist":{"tarball":"http://r/t.tgz","unpackedSize":5,"shasum":"s"}}},"time":{"1.0.$seq":"2023-01-01T00:00:00.000Z","created":"2023-01-01T00:00:00.000Z","modified":"2023-01-01T00:00:00.000Z"}}}"""
    // 5 versions in the first run: no eviction yet
    writeFeed(feedDir, (1 to 5).map(change), "f0.jsonl")
    NpmStream.startRetention(spark, NpmStream.fileSource(spark, feedDir),
      base, s"$base/ckpt").awaitTermination()
    assert(!Files.exists(Paths.get(s"$base/deleted_zips_stream")) ||
      spark.read.parquet(s"$base/deleted_zips_stream").count() == 0)
    // restart with two more versions: state remembered → two evictions
    writeFeed(feedDir, Seq(change(6), change(7)), "f1.jsonl")
    NpmStream.startRetention(spark, NpmStream.fileSource(spark, feedDir),
      base, s"$base/ckpt").awaitTermination()
    val evs = spark.read.parquet(s"$base/deleted_zips_stream")
      .select("deleted_zip_path").as[String].collect().sorted.toList
    assert(evs.map(_.split("/").last) == List("hotpkg_1-r.zip", "hotpkg_2-r.zip"))
  }

  test("a re-run of the same batch replaces its output instead of appending (idempotent sinks)") {
    // simulates the crash-between-sink-write-and-checkpoint-commit case:
    // Structured Streaming re-delivers the batch with the SAME batchId,
    // and the dynamic partition overwrite must replace the previous
    // attempt's rows, not duplicate them
    val base = Files.createTempDirectory("npmidem").toString
    val r = graft.npm.Pipeline.replay(
      Fixtures.withFetch404.toDF("value"), Fixtures.RoutingFetcher)(spark)
    NpmStream.writeBatchOutputs(r, base, batchId = 0)
    val once = spark.read.parquet(s"$base/catalog").count()
    NpmStream.writeBatchOutputs(r, base, batchId = 0) // same batch re-run
    assert(spark.read.parquet(s"$base/catalog").count() == once)
    assert(spark.read.parquet(s"$base/audit")
      .groupBy("seq").count().filter(col("count") > 3).count() == 0)
    // a genuinely new batch still lands alongside
    NpmStream.writeBatchOutputs(r, base, batchId = 1)
    assert(spark.read.parquet(s"$base/catalog").count() == once * 2)
  }

  test("restart from checkpoint does not duplicate already-processed changes") {
    val base = Files.createTempDirectory("npmstream2").toString
    val feedDir = s"$base/feed"
    writeFeed(feedDir, Fixtures.withFetch404, "changes-0.jsonl")

    val q1 = NpmStream.start(spark, NpmStream.fileSource(spark, feedDir),
      s"$base/out", s"$base/ckpt", Fixtures.RoutingFetcher)
    q1.awaitTermination()

    // new feed file arrives; restart the query from the same checkpoint
    writeFeed(feedDir, Seq(
      """{"seq":20,"id":"latepkg","doc":{"_id":"latepkg","_rev":"1-z","name":"latepkg","dist-tags":{"latest":"1.0.0"},"versions":{"1.0.0":{"version":"1.0.0","dist":{"tarball":"http://r/t.tgz","unpackedSize":5,"shasum":"s"}}},"time":{"1.0.0":"2023-02-01T00:00:00.000Z","created":"2023-02-01T00:00:00.000Z","modified":"2023-02-01T00:00:00.000Z"}}}"""),
      "changes-1.jsonl")
    val q2 = NpmStream.start(spark, NpmStream.fileSource(spark, feedDir),
      s"$base/out", s"$base/ckpt", Fixtures.RoutingFetcher)
    q2.awaitTermination()

    val catalog = spark.read.parquet(s"$base/out/catalog")
    // no duplicates from the first batch, and the late change arrived
    assert(catalog.count() == 7)
    assert(catalog.groupBy("change_seq_id").count().filter(col("count") > 1).count() == 0)
    assert(NpmStream.currentLag(spark, newestSeq = 20L, s"$base/out") == 0L)
  }
}
