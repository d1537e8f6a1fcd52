package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sanity specs for the third analytics tranche (exact results are
  * oracle-checked by the driver gate; these pin the semantic properties
  * that a hash-compare can't express).
  */
class AnalyticsExtraSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    AnalyticsExtra.defs.find(_.name == name).get.run(spark, dir)

  test("mergeable HLL estimates track exact distincts within sketch error") {
    // the query itself carries the exact-vs-estimate comparison (that's
    // what the oracle hash-checks); here pin that the exact side is right
    // and every bound check came out TRUE
    val rows = q("approx_hll_mergeable_union").collect()
    val exactPerNation = graft.Tables.customer(spark, dir)
      .groupBy("c_nationkey").agg(countDistinct("c_custkey").as("n"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val exactGlobal = graft.Tables.customer(spark, dir)
      .select("c_custkey").distinct().count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nk = r.getAs[Long]("nationkey")
      assert(r.getAs[Long]("nation_exact") == exactPerNation(nk))
      assert(r.getAs[Long]("global_exact") == exactGlobal)
      assert(r.getAs[Boolean]("nation_ok"), s"nation $nk HLL estimate out of bound")
      assert(r.getAs[Boolean]("global_ok"), "global HLL estimate out of bound")
    }
  }

  test("hash-stratified sample rate is ~1/16 and deterministic") {
    val r1 = q("sample_stratified_hash").collect()
    val r2 = q("sample_stratified_hash").collect()
    assert(r1.toSeq == r2.toSeq, "content-hash sampling must be deterministic")
    val (tot, samp) = r1.foldLeft((0L, 0L)) { case ((t, s), r) =>
      (t + r.getAs[Long]("n_total"), s + r.getAs[Long]("n_sampled")) }
    val rate = samp.toDouble / tot
    assert(rate > 0.02 && rate < 0.13, s"sample rate $rate not ~1/16")
  }

  test("30d range frame is monotone-bounded by the supplier total") {
    val perRow = q("window_range_30d_revenue")
    val bySupp = perRow.groupBy("l_suppkey").agg(max("rev_30d").as("max_30d"))
    val totals = graft.Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 20)
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("total"))
    val joined = bySupp.join(totals, "l_suppkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("max_30d") <= r.getAs[Double]("total") + 1e-6)
    }
  }

  test("except-all surplus equals per-key count difference clamped at zero") {
    val surplus = q("setop_except_all_flags").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_surplus")).toMap
    val li = graft.Tables.lineitem(spark, dir)
    def counts(y: Int) = li.filter(year(col("l_shipdate")) === y)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("count")).toMap
    val c96 = counts(1996); val c97 = counts(1997)
    val expected = c96.map { case (k, n) => k -> math.max(0L, n - c97.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    assert(surplus == expected)
  }
}
