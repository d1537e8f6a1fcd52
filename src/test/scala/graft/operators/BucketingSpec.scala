package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DESIGN.md claims bucketing gives co-located (shuffle-free) fact joins;
  * this spec proves it on the plan: a self-join of two tables bucketed on
  * the join key must contain NO shuffle exchange, and results must match
  * the unbucketed join.
  */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key runs without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val or = graft.Tables.orders(spark, "/root/testdata/sf0.001")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    or.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("or_b")

    val joined = spark.table("li_b").join(spark.table("or_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    // disable broadcast so the join strategy actually depends on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString()
      val joinShuffles = "Exchange hashpartitioning\\((l|o)_orderkey".r
        .findAllIn(plan).length
      assert(joinShuffles == 0, s"expected bucket-co-located join, got:\n$plan")

      val expected = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
