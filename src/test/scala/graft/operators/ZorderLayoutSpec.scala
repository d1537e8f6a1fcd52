package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** scale_zorder_layout: the per-bucket min/max audit must show the
  * skipping property that justifies the layout — under z-order a
  * point/range predicate on EITHER dimension prunes most buckets,
  * while the linear date sort prunes only on date.
  */
class ZorderLayoutSpec extends SparkSpec {

  test("z-order buckets bound both dimensions; date sort leaves customer unbounded") {
    val audit = ScalePatterns.zorderLayout.run(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6)))
    val (z, d) = audit.partition(_._1 == "zorder")
    assert(z.length == 16 && d.length == 16)

    // global ranges (identical under both layouts — same rows)
    val custSpanGlobal = z.map(_._5).max - z.map(_._4).min
    val daySpanGlobal = z.map(_._7).max - z.map(_._6).min

    def avgCustSpan(a: Array[(String, Int, Long, Long, Long, Int, Int)]) =
      a.map(b => (b._5 - b._4).toDouble).sum / a.length
    def avgDaySpan(a: Array[(String, Int, Long, Long, Long, Int, Int)]) =
      a.map(b => (b._7 - b._6).toDouble).sum / a.length

    // date sort: every bucket spans ~the full customer range
    assert(avgCustSpan(d) > 0.9 * custSpanGlobal,
      s"date sort should leave customer unbounded: ${avgCustSpan(d)} vs $custSpanGlobal")
    // z-order: the average bucket covers well under half of each dimension
    assert(avgCustSpan(z) < 0.5 * custSpanGlobal,
      s"zorder custkey span not clustered: ${avgCustSpan(z)} vs $custSpanGlobal")
    assert(avgDaySpan(z) < 0.6 * daySpanGlobal,
      s"zorder day span not clustered: ${avgDaySpan(z)} vs $daySpanGlobal")

    // skipping effectiveness for a customer point query: a predicate on
    // one customer key overlaps few z-buckets' [min,max] but all 16
    // date-sort buckets
    val probe = (z.map(_._4).min + z.map(_._5).max) / 2
    val zHit = z.count(b => b._4 <= probe && probe <= b._5)
    val dHit = d.count(b => b._4 <= probe && probe <= b._5)
    assert(dHit == 16, s"date sort should never prune on customer, hit $dHit")
    assert(zHit <= 8, s"zorder should prune half or more of the buckets, hit $zHit")
  }

  test("bit interleave is monotone in each dimension at fixed other-dimension") {
    import spark.implicits._
    val probe = Seq((3L, 7L), (5L, 7L), (3L, 9L), (200L, 7L), (3L, 3000L))
      .toDF("ck", "oday")
    val rows = probe.withColumn("z",
        expr((0 until 14).map(i =>
          s"shiftleft(shiftright(ck, $i) & 1, ${2 * i}) + shiftleft(shiftright(oday, $i) & 1, ${2 * i + 1})")
          .mkString(" + ")))
      .as[(Long, Long, Long)].collect().map { case (c, o, zz) => (c, o) -> zz }.toMap
    // increasing ck at fixed oday increases z; same for oday at fixed ck
    assert(rows((3L, 7L)) < rows((5L, 7L)))
    assert(rows((5L, 7L)) < rows((200L, 7L)))
    assert(rows((3L, 7L)) < rows((3L, 9L)))
    assert(rows((3L, 9L)) < rows((3L, 3000L)))
  }
}
