package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-19 optimization gates.
  *
  * 1. The node-broadcast guard ([[GraphIterative.nodeBc]], r18 verdict
  *    item 2): within the cap the hop join is a BroadcastHashJoin of the
  *    node-sized side; PAST the cap the hint must drop so the join stays
  *    keyed (SortMergeJoin/ShuffledHashJoin) — an explicit broadcast()
  *    hint is honored by Spark regardless of size, so an unguarded hint
  *    hard-fails at scale instead of degrading.
  */
class Round19Spec extends SparkSpec {
  import spark.implicits._

  test("node-broadcast guard: over-cap arm plans a KEYED join, under-cap broadcasts") {
    // auto-broadcast off: at test scale the planner would happily
    // auto-broadcast the 50-row frame, masking the thing under test —
    // whether the FORCED hint is present (under cap) or dropped (over
    // cap). At 100 TB the un-hinted side is over the auto threshold
    // too, so hint-absent ⇒ keyed is exactly the production behavior.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1 to 1000).map(i => (i.toLong, (i % 97).toLong))
        .toDF("src", "dst").localCheckpoint(true)
      val frontier = (1 to 50).map(_.toLong).toDF("node").localCheckpoint(true)
      def hopPlan(bc: DataFrame => DataFrame): String = {
        val out = edges.join(bc(frontier), edges("src") === frontier("node"))
          .select(col("dst"))
        out.queryExecution.executedPlan.toString
      }
      val under = hopPlan(GraphIterative.nodeBc(1L))
      assert(under.contains("BroadcastHashJoin"),
        s"under-cap arm did not broadcast:\n$under")
      val over = hopPlan(GraphIterative.nodeBc(GraphIterative.NodeBroadcastCap + 1L))
      assert(!over.contains("BroadcastHashJoin"),
        s"over-cap arm still broadcasts:\n$over")
      assert(over.contains("SortMergeJoin") || over.contains("ShuffledHashJoin"),
        s"over-cap arm is not a keyed join:\n$over")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
