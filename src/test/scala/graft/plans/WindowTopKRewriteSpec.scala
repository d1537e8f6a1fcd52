package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** With the rewrite enabled, the PLAIN window idiom plans through the
  * custom operator — rows identical, ranks included — and unsafe shapes
  * (rank ties, multiple window exprs, no literal bound) are left alone.
  */
class WindowTopKRewriteSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def plainTop3 = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
  }

  private def withRewrite[T](body: => T): T = {
    WindowTopKRewriteSession.enable(spark)
    try body finally WindowTopKRewriteSession.disable(spark)
  }

  test("plain row_number <= k window queries route through TopKPerKey, rows+ranks identical") {
    val baseline = plainTop3.collect().map(_.toSeq).toSet
    withRewrite {
      val df = plainTop3
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
      assert(df.collect().map(_.toSeq).toSet == baseline)
    }
    // and with the rule removed, plans are back to plain window form
    assert(!plainTop3.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("rank() (tie semantics) is NOT rewritten") {
    withRewrite {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val df = Tables.orders(spark, dir)
        .withColumn("r", rank().over(w)).filter(col("r") <= 3)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }

  test("a second window expression over the same spec blocks the rewrite") {
    withRewrite {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val df = Tables.orders(spark, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("mx", max("o_totalprice").over(Window.partitionBy("o_custkey")))
        .filter(col("rn") <= 3)
      // pruning before the unbounded max would change mx for kept rows
      val rows = df.select("o_custkey", "rn", "mx").collect()
      val check = Tables.orders(spark, dir)
        .groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach(r => assert(r.getDouble(2) == check(r.getLong(0)),
        "rewrite corrupted a sibling window aggregate"))
    }
  }

  test("non-literal bound is left alone") {
    withRewrite {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val df = Tables.orders(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("o_custkey")) // data-dependent bound
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() > 0)
    }
  }
}
