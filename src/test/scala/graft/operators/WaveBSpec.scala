package graft.operators

import graft.SparkSpec

/** Driver-side references for the round-11 wave-B operators: seeded
  * personalized PageRank, the DP geometric mechanism, and the
  * subsample-merge quantile summary — each re-derived independently in
  * Scala (BigInt / MessageDigest) from the sf0.001 tables and compared
  * against the real QueryDef output.
  */
class WaveBSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The house 24-bit hex uniform, re-derived independently: first six
    * hex chars of md5 as a base-16 integer. */
  private def hex24(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(6), 16)
  }

  test("privacy_dp_geometric_counts: noise matches an independent geometric redraw") {
    def geo(v: Long): Int = {
      var k = 0
      while (k < 24 && v < (1L << (23 - k))) k += 1
      k
    }
    val rows = PrivacyOps.dpGeometricCounts.run(spark, dir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val name = r.getAs[String]("n_name")
      val expected = geo(hex24(s"dp1:$name")) - geo(hex24(s"dp2:$name"))
      assert(r.getAs[Int]("noise") == expected, s"noise mismatch for $name")
      assert(r.getAs[Long]("n_released") ==
        math.max(0L, r.getAs[Long]("n_exact") + expected))
    }
    // the two-sided geometric actually perturbs: not all zero across 25 draws
    assert(rows.exists(_.getAs[Int]("noise") != 0))
  }

  test("graph_ppr_seeded matches a scalar integer fixpoint on the collected graph") {
    val li = graft.Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = (li ++ li.map(e => (e._2, e._1))).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val seeds = graft.Tables.supplier(spark, dir)
      .filter(org.apache.spark.sql.functions.col("s_suppkey") <= 5)
      .collect().map(_.getAs[Long]("s_suppkey") * 2)
      .filter(deg.contains).toSet
    val ntot = deg.size
    val tele = (150000L * ntot) / seeds.size
    var ranks: Map[Long, Long] = seeds.map(_ -> tele).toMap
    for (_ <- 1 to 3) {
      val spread = edges
        .flatMap { case (src, dst) =>
          ranks.get(src).map(r => dst -> (r / deg(src)))
        }
        .groupBy(_._1).view.mapValues(cs => (85L * cs.map(_._2).sum) / 100).toMap
      ranks = (seeds ++ spread.keys).map { n =>
        n -> ((if (seeds(n)) tele else 0L) + spread.getOrElse(n, 0L))
      }.toMap
    }
    val expected = ranks.toSeq.sortBy { case (n, r) => (-r, n) }.take(20)
    val got = GraphIterative.pprSeeded.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("node_id"), r.getAs[Long]("rank")))
    assert(got.toSeq == expected)
    // seeds carry the teleport floor: the top node is seed-adjacent mass
    assert(expected.head._2 > 0)
  }

  test("sketch_quantile_subsample_merge: every released quantile is within the rank bound") {
    val rows = SketchOps.quantileSubsampleMerge.run(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("q_pct")).toSeq == Seq(25L, 50L, 75L, 90L, 99L))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"q=${r.getAs[Long]("q_pct")} rank_err ${r.getAs[Long]("rank_err")} " +
          s"exceeds bound ${r.getAs[Long]("err_bound")}")
      assert(r.getAs[Long]("rank_err") <= r.getAs[Long]("err_bound"))
    }
    // monotone: quantile values are nondecreasing in q
    val vs = rows.sortBy(_.getAs[Long]("q_pct")).map(_.getAs[Long]("value_cents"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
  }

  test("quantile summary merge algebra: per-pid builds union to the full summary, placement-free") {
    // the sketch's merge = UNION of per-pid summaries: each pid's kept
    // run depends only on that pid's rows (content-hash-assigned), so
    // 32 independent builders — in any order, from any row permutation —
    // produce exactly the monolithic summary
    import org.apache.spark.sql.functions._
    val base = graft.Tables.lineitem(spark, dir)
      .select(
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("v"),
        col("l_orderkey").as("okey"),
        col("l_linenumber").cast("long").as("lnum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def pidOf(t: (Long, Long, Long)): Int = (hex24(s"${t._2}:${t._3}") % 32).toInt
    def keptRun(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      rows.sorted.zipWithIndex.collect { case (t, i) if i % 64 == 0 => t }
    val monolithic = base.groupBy(pidOf).toSeq.sortBy(_._1)
      .flatMap { case (_, grp) => keptRun(grp) }.sorted
    // independent per-pid builders over a SHUFFLED input permutation
    val shuffled = new scala.util.Random(7).shuffle(base)
    val merged = (0 until 32)
      .map(p => keptRun(shuffled.filter(pidOf(_) == p)))
      .reduce(_ ++ _).sorted
    assert(merged == monolithic)
    assert(monolithic.nonEmpty && monolithic.size < base.size)
  }
}
