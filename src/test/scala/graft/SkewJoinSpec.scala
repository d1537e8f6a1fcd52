package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling, demonstrated rather than assumed: a join where
  * 90% of the left rows share one hot key would hang one reducer at
  * cluster scale; with skew-join enabled (default) and test-sized
  * thresholds, AQE splits the oversized partition at runtime — visible as
  * `skew=true` on the SortMergeJoin of the final adaptive plan. This is
  * the runtime complement to the manual salting pattern
  * (agg_salted_two_stage), covering joins where pre-salting isn't wired.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot-key partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows, 90% on key 0, padded so the hot partition crosses the
      // threshold; dimension side is uniform
      val skewed = spark.range(0, 100000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
          concat(lit("x"), lpad(col("id").cast("string"), 32, "0")).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 7).as("w"))
      // NOTE: no groupBy on the join key downstream — AQE skips skew
      // splitting when a parent requires the join's output partitioning
      val joined = skewed.join(dim, "k")
      assert(joined.collect().length == 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the hot partition for skew splitting")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
