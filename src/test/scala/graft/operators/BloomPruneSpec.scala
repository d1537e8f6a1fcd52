package graft.operators

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The bloom-pruned join must be (1) exact — identical to the naive
  * join it replaces, (2) actually pruning — most non-joining fact rows
  * never reach the join, and (3) pruning BEFORE the shuffle — the
  * might_contain filter sits below the fact-side exchange, which is the
  * entire point of the pattern at 100 TB.
  */
class BloomPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom-pruned join result is identical to the naive join") {
    val pruned = graft.SparkEntry.queries("scale_bloom_prune_join")(spark, dir)
    val naive = Tables.lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(trunc(col("o_orderdate"), "month").as("order_month"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy("order_month")
    val got = pruned.select("order_month", "n_items").collect().toSeq
    val want = naive.collect().toSeq
    assert(got == want)
  }

  test("bloom filter prunes the non-matching fact fraction (≈1% fpp)") {
    graft.functions.BloomExpressions.register(spark)
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bf = urgent.stat.bloomFilter("o_orderkey", math.max(urgent.count(), 1024L), 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val fact = Tables.lineitem(spark, dir).select("l_orderkey")
    val total = fact.count()
    val kept = fact.filter(call_function("bloom_might_contain",
      lit(bos.toByteArray), col("l_orderkey"))).count()
    val trueMatch = fact.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(kept >= trueMatch, "bloom must never drop a joining row")
    // urgent ≈ 20% of orders; allow fpp slack but demand real pruning
    assert(kept < total / 2, s"bloom barely pruned: kept $kept of $total")
  }

  test("the might_contain filter sits below the fact-side shuffle") {
    val sx = spark.newSession()
    sx.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sx.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = graft.SparkEntry.queries("scale_bloom_prune_join")(sx, dir)
      .queryExecution.executedPlan
    val prunesBeforeShuffle = plan.collect {
      case e: ShuffleExchangeExec => e
    }.exists(_.exists {
      case f: FilterExec =>
        f.condition.exists { case _: BloomFilterMightContain => true; case _ => false }
      case _ => false
    })
    assert(prunesBeforeShuffle,
      "bloom_might_contain filter is not below a ShuffleExchange — " +
        "the fact side is being shuffled unpruned")
  }
}
