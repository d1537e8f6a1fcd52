package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** With the rewrite present, the PLAIN window idiom plans through the
  * custom operator — rows identical, ranks included — and unsafe shapes
  * (rank ties, multiple window exprs, no literal bound) are left alone.
  *
  * All enable/disable cycles run on an ISOLATED newSession (r7, ADVICE
  * r6): WindowTopKRewriteSession.enable injects the rule and flips a
  * session conf, and doing that on the shared suite session while other
  * suites plan queries in parallel is exactly the cross-suite
  * interference mode RetentionSpec's isolation pattern exists for.
  */
class WindowTopKRewriteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plainTop3(s: SparkSession) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
  }

  private def withRewrite[T](body: SparkSession => T): T = {
    val s = spark.newSession()
    WindowTopKRewriteSession.enable(s)
    try body(s) finally WindowTopKRewriteSession.disable(s)
  }

  test("plain row_number <= k window queries route through TopKPerKey, rows+ranks identical") {
    val baseline = plainTop3(spark.newSession()).collect().map(_.toSeq).toSet
    withRewrite { s =>
      val df = plainTop3(s)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
      assert(df.collect().map(_.toSeq).toSet == baseline)
    }
    // and on a session without the rule, plans are the plain window form
    assert(!plainTop3(spark.newSession())
      .queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("rank() (tie semantics) is NOT rewritten") {
    withRewrite { s =>
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val df = Tables.orders(s, dir)
        .withColumn("r", rank().over(w)).filter(col("r") <= 3)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }

  test("a second window expression over the same spec blocks the rewrite") {
    withRewrite { s =>
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val df = Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("mx", max("o_totalprice").over(Window.partitionBy("o_custkey")))
        .filter(col("rn") <= 3)
      // pruning before the unbounded max would change mx for kept rows
      val rows = df.select("o_custkey", "rn", "mx").collect()
      val check = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach(r => assert(r.getDouble(2) == check(r.getLong(0)),
        "rewrite corrupted a sibling window aggregate"))
    }
  }

  test("non-literal bound is left alone") {
    withRewrite { s =>
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val df = Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("o_custkey")) // data-dependent bound
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() > 0)
    }
  }
}
