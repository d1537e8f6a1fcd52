package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — contents vary per investigation (currently:
  * sub-stage attribution of dedup_prefix_filter_jaccard, round 9; the
  * measured numbers and the rejected alternatives are recorded in
  * DESIGN.md §round 9).
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
    // warm the pinned surface exactly like Bench's warmup pass
    val sh = Dedup.shingleSurface(spark, dir)
    t("shingleSurface (pinned, warm)")(sh.count())
    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val cands0 = Dedup.prefixCandidatePairs(sh, 0.5)
      t("candidates (no ckpt)")(cands0.count())
      val cands = cands0.localCheckpoint(true)
      val candDocs = cands.select(col("ia").as("doc_id"))
        .union(cands.select(col("ib").as("doc_id"))).distinct()
      val shC = sh.join(broadcast(candDocs), Seq("doc_id")).localCheckpoint(true)
      t("prune shC (ckpt)")(shC.count())
      val sz = shC.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = shC.as("ca").join(shC.as("cb"),
          col("ca.shingle") === col("cb.shingle") &&
          col("ca.doc_id") < col("cb.doc_id"))
        .select(col("ca.doc_id").as("ia"), col("cb.doc_id").as("ib"))
        .join(cands.hint("broadcast"), Seq("ia", "ib"), "left_semi")
        .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
      val out = inter
        .join(broadcast(sz.as("sa")), col("ia") === col("sa.doc_id"))
        .join(broadcast(sz.as("sb")), col("ib") === col("sb.doc_id"))
        .select(col("ia"), col("ib"),
          (col("inter").cast("double") /
            (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("ia", "ib")
      t("verify tail")(out.count())
      graft.PinnedStorage.sweep(spark, blocking = true)
      System.gc()
    }
    spark.stop()
  }
}
