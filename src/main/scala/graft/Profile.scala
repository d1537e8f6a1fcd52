package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — contents vary per investigation (currently:
  * co-order edge-list build shapes for graph_triangle_count, round 10;
  * prior investigations' measured numbers live in DESIGN.md).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s   rows=$n")
    }
    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val sp = graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      t("build A: self-join + distinct") {
        sp.as("x").join(sp.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
          .count()
      }
      t("build B: collect_list + explode") {
        sp.groupBy("ok").agg(sort_array(collect_list(col("pk"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
              |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""
              .stripMargin)).as("e"))
          .select(col("e.a"), col("e.b")).distinct()
          .count()
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
