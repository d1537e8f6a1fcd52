package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d dur=${dur.getOrElse(-1L)}%5d ms  ${si.name.takeWhile(_ != '(')}")
      }
    })
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-30s ${(System.nanoTime()-t0)/1e9}%7.3f s   rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val explOnly = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ts) - 2),
          |  i -> concat_ws(' ', element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2)))""".stripMargin)).as("shingle"))
    t("explode only warm0")(explOnly.count())
    t("explode only")(explOnly.count())
    val dist = explOnly.distinct()
    t("explode+distinct warm0")(dist.count())
    t("explode+distinct")(dist.count())
    spark.stop()
  }
}
