package graft.npm

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the NPM change-feed pipeline: batch-replays
  * a small inline feed and prints the four output tables.
  * `scripts/run_main.sh graft.npm.ReplayDemo [jsonlFile]`
  */
object ReplayDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    import spark.implicits._

    val feed: Seq[String] = args.headOption match {
      case Some(path) =>
        scala.io.Source.fromFile(path).getLines().toSeq
      case None => Seq(
        """{"seq":1,"id":"left-pad","doc":{"_id":"left-pad","_rev":"9-r","name":"left-pad","dist-tags":{"latest":"v1.3.0"},"versions":{"v1.3.0":{"version":"v1.3.0","dist":{"tarball":"http://r/lp.tgz","unpackedSize":12,"shasum":"s"},"author":{"name":"azer"},"dependencies":{}}},"time":{"v1.3.0":"2018-04-10T00:00:00.000Z","created":"2014-03-17T00:00:00.000Z","modified":"2018-04-10T00:00:00.000Z"}}}""",
        """{"seq":2,"id":"@types/node","doc":{"_id":"@types/node","_rev":"3-r","name":"@types/node","dist-tags":{"latest":"20.0.0"},"versions":{"20.0.0":{"version":"20.0.0","dist":{"tarball":"http://r/tn.tgz","unpackedSize":44,"shasum":"s"}}},"time":{"20.0.0":"2023-05-01T00:00:00.000Z","created":"2016-01-01T00:00:00.000Z","modified":"2023-05-01T00:00:00.000Z"}}}""",
        """{"seq":3,"id":"ghost-pkg"}""",
        """not json at all""")
    }

    val r = Pipeline.replay(feed.toDF("value"))
    println("=== catalog ==="); r.catalog.show(false)
    println("=== skipped (DLQ) ==="); r.skipped.show(false)
    println("=== audit ==="); r.audit.orderBy("seq", "stage").show(false)
    println("=== deleted_zips ==="); r.deletions.show(false)
    spark.stop()
  }
}
