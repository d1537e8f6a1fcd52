package graft.operators

import graft.SparkSpec

/** Driver-side BigInt references for the StatsExtra tranche: each query
  * runs the REAL QueryDef against sf0.001 and is compared against an
  * independent scalar recomputation (collect the small aggregate grain,
  * redo the integer formula with BigInt) — the same engine-vs-reference
  * shape the ER/modularity fuzz specs use, here pinning the exact
  * integer arithmetic rather than trusting the oracle alone.
  */
class StatsExtraSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stats_gini_revenue matches a BigInt recomputation of the rank formula") {
    import org.apache.spark.sql.functions._
    val spends = graft.Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, s) => (s, k) }
    val n = BigInt(spends.length)
    val total = spends.map(x => BigInt(x._2)).sum
    val rs = spends.zipWithIndex.map { case ((_, s), i) => BigInt(i + 1) * s }.sum
    val expected = ((rs * 2 - (n + 1) * total) * 1000000) / (n * total)

    val row = StatsExtra.giniRevenue.run(spark, dir).collect().head
    assert(row.getAs[Long]("n_customers") == n.toLong)
    assert(row.getAs[Long]("total_cents") == total.toLong)
    assert(row.getAs[Long]("gini_ppm") == expected.toLong)
    // sanity: a spend distribution is neither uniform (0) nor degenerate (1)
    assert(row.getAs[Long]("gini_ppm") > 0 && row.getAs[Long]("gini_ppm") < 1000000)
  }

  test("rec_copurchase_lift matches a brute-force basket recount") {
    val baskets = graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val nOrders = BigInt(byOrder.size)
    val partOrders = baskets.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
    val pairCounts = byOrder.values.toSeq
      .flatMap(ps => for (a <- ps; b <- ps if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(v => BigInt(v.length)).toMap
    val expected = pairCounts.toSeq.map { case ((a, b), nab) =>
      val lift = (nab * nOrders * 1000000) / (partOrders(a) * partOrders(b))
      (a, b, nab, lift)
    }.sortBy { case (a, b, nab, lift) => (-nab, -lift, a, b) }.take(20)

    val got = StatsExtra.copurchaseLift.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        BigInt(r.getAs[Long]("n_ab")), BigInt(r.getAs[Long]("lift_ppm"))))
    assert(got.toSeq == expected.map(t => (t._1, t._2, t._3, t._4)).toSeq)
  }

  test("ts_ewma_dyadic matches a BigInt ladder and is exact on any prefix") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)").as("rc"))
      .orderBy("day")
      .collect().map(_.getLong(1))
    val expected = daily.indices.map { t =>
      val lags = (0 until 20).flatMap { k =>
        if (t - k >= 0) Some((BigInt(daily(t - k)), BigInt(1L << (19 - k)))) else None
      }
      (lags.map { case (x, w) => x * w }.sum / lags.map(_._2).sum).toLong
    }
    val got = StatsExtra.ewmaDyadic.run(spark, dir).collect().map(_.getAs[Long]("ewma_cents"))
    assert(got.toSeq == expected)
    // dyadic-weight property: a constant series smooths to itself exactly
    val const = Vector.fill(40)(BigInt(123456789L))
    val smoothed = const.indices.map { t =>
      val ws = (0 until 20).filter(k => t - k >= 0).map(k => BigInt(1L << (19 - k)))
      (ws.zipWithIndex.map { case (w, i) => const(t - i) * w }.sum / ws.sum)
    }
    assert(smoothed.forall(_ == BigInt(123456789L)))
  }
}
