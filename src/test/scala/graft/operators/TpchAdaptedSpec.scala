package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the adapted TPC-H battery (exact values are
  * pinned by the DuckDB oracle; these pin cross-query consistency and the
  * properties the oracle can't see, like plan-independent identities).
  */
class TpchAdaptedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q13: distribution counts every customer exactly once") {
    val total = run("q13_customer_distribution")
      .agg(sum("custdist")).head.getLong(0)
    assert(total == Tables.customer(spark, dir).count())
  }

  test("q15: winner's revenue equals the max over all suppliers' revenue") {
    val winners = run("q15_top_supplier").select("total_revenue").distinct().collect()
    assert(winners.length == 1, "all winners share one (max) revenue value")
  }

  test("q6 revenue is a lower bound of unrestricted discount revenue") {
    val restricted = run("q6_forecast_revenue").head.getDouble(0)
    import org.apache.spark.sql.types.DecimalType
    val all = Tables.lineitem(spark, dir)
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))
        * col("l_discount").cast(DecimalType(12, 2))).cast("double"))
      .head.getDouble(0)
    assert(restricted > 0 && restricted < all)
  }

  test("q8: market share is a fraction in [0, 1] for every year") {
    val shares = run("q8_market_share").select("mkt_share").collect().map(_.getDouble(0))
    assert(shares.nonEmpty && shares.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("q16: no supplier_cnt exceeds the total supplier count") {
    val mx = run("q16_supplier_count_by_part")
      .agg(max("supplier_cnt")).head.getLong(0)
    assert(mx <= Tables.supplier(spark, dir).count())
  }

  test("q18: every reported order's quantity exceeds the 300 threshold") {
    val mn = run("q18_large_volume_customers")
      .agg(min("total_qty")).head.getDouble(0)
    assert(mn > 300.0)
  }

  test("q21: waiting suppliers were not the only supplier on the order") {
    // numwait counts late lines on multi-supplier 'F' orders; the total
    // can never exceed the number of late lines overall
    val numwait = run("q21_waiting_supplier").agg(sum("numwait")).head.getLong(0)
    val lateLines = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .count()
    assert(numwait <= lateLines)
  }
}
