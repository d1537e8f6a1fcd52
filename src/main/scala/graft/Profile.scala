package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — contents vary per investigation (currently:
  * sub-stage attribution of graph_triangle_count, round 10; prior
  * investigations' measured numbers live in DESIGN.md).
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
      var und: org.apache.spark.sql.DataFrame = null
      t("und build+ckpt") {
        und = sp.as("x").join(sp.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
          .localCheckpoint(true)
        und.count()
      }
      var deg: org.apache.spark.sql.DataFrame = null
      t("deg+ckpt") {
        deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d")).localCheckpoint(true)
        deg.count()
      }
      var ori: org.apache.spark.sql.DataFrame = null
      t("orient+ckpt") {
        ori = und
          .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
          .select(
            when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
              col("a")).otherwise(col("b")).as("u"),
            when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
              col("b")).otherwise(col("a")).as("w"))
          .localCheckpoint(true)
        ori.count()
      }
      t("wedges only") {
        ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u")).count()
      }
      t("close smj") {
        ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u"))
          .select(col("e1.u").as("u"), col("e2.w").as("w"))
          .join(ori, Seq("u", "w"), "left_semi").count()
      }
      t("close bhj") {
        ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u"))
          .select(col("e1.u").as("u"), col("e2.w").as("w"))
          .join(broadcast(ori), Seq("u", "w"), "left_semi").count()
      }
      t("close bloom+smj") {
        graft.functions.BloomExpressions.register(spark)
        val keyed = ori.withColumn("k", expr("xxhash64(u, w)"))
        val bf = keyed.stat.bloomFilter("k", 1500000L, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u"))
          .select(col("e1.u").as("u"), col("e2.w").as("w"))
          .filter(call_function("bloom_might_contain",
            lit(bos.toByteArray), expr("xxhash64(u, w)")))
          .join(ori, Seq("u", "w"), "left_semi").count()
      }
      t("close shj") {
        ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u"))
          .select(col("e1.u").as("u"), col("e2.w").as("w"))
          .join(ori.hint("shuffle_hash"), Seq("u", "w"), "left_semi").count()
      }
      t("close bloom+shj") {
        graft.functions.BloomExpressions.register(spark)
        val keyed = ori.withColumn("k", expr("xxhash64(u, w)"))
        val bf = keyed.stat.bloomFilter("k", 1500000L, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u"))
          .select(col("e1.u").as("u"), col("e2.w").as("w"))
          .filter(call_function("bloom_might_contain",
            lit(bos.toByteArray), expr("xxhash64(u, w)")))
          .join(ori.hint("shuffle_hash"), Seq("u", "w"), "left_semi").count()
      }
      t("wedge shj only") {
        ori.as("e1").join(ori.as("e2").hint("shuffle_hash"),
          col("e1.w") === col("e2.u")).count()
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
