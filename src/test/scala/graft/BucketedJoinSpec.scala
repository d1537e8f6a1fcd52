package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join tool for fact-fact joins at 100 TB:
  * both tables pre-hashed into the same bucket count on the join key, so
  * the SortMergeJoin reads matching buckets directly — ZERO Exchange in
  * the plan. This spec proves the engine's storage layout delivers that:
  * same join, bucketed vs unbucketed, shuffle nodes counted in the plan.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans no Exchange; unbucketed shuffles both sides") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.lineitem(spark, dir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, dir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString

      val unbucketed = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val unbucketedPlan = unbucketed.queryExecution.executedPlan.toString

      def joinExchanges(plan: String): Int =
        // exchanges before the aggregate's own shuffle: count total and
        // compare across the two plans (the agg shuffle exists in both)
        "Exchange hashpartitioning".r.findAllIn(plan).length

      assert(bucketedPlan.contains("SortMergeJoin"))
      assert(joinExchanges(unbucketedPlan) >= joinExchanges(bucketedPlan) + 2,
        s"bucketing did not remove both join shuffles:\n" +
          s"bucketed=${joinExchanges(bucketedPlan)} unbucketed=${joinExchanges(unbucketedPlan)}")

      // same answer either way
      val a = bucketed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = unbucketed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
