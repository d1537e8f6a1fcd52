package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {

  import spark.implicits._

  test("minhash_sketch equals the k-column min(md5) formulation") {
    MinHashAgg.register(spark)
    val sh = Seq(
      (1L, "a b c"), (1L, "b c d"), (1L, "c d e"),
      (2L, "x y z"), (2L, "y z w")).toDF("doc_id", "shingle")

    val sketch = sh.groupBy("doc_id")
      .agg(expr("minhash_sketch(shingle, 4)").as("sig"))
      .select(col("doc_id"), col("sig"))
      .as[(Long, Seq[String])].collect().toMap

    val cols = (0 until 4).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")).cast("binary"))).as(s"h$i"))
    val reference = sh.groupBy("doc_id").agg(cols.head, cols.tail: _*)
      .as[(Long, String, String, String, String)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap

    assert(sketch == reference)
  }

  test("sketch is repartitioning-invariant (merge path)") {
    MinHashAgg.register(spark)
    val sh = (1 to 500).map(i => (i % 7L, s"shingle-$i")).toDF("doc_id", "shingle")
    val direct = sh.groupBy("doc_id").agg(expr("minhash_sketch(shingle, 8)").as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val shuffled = sh.repartition(11).groupBy("doc_id")
      .agg(expr("minhash_sketch(shingle, 8)").as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(direct == shuffled)
  }
}
