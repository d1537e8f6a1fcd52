package graft.operators

import graft.SparkSpec

/** Wave-F references: AQE skew splitting asserted on the executed plan
  * of the declared query (not a synthetic twin), the transformWithState
  * snapshots re-derived scalar-side from the raw events, and the
  * closed-form OLS checked against an independent driver-side solve.
  */
class WaveFSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("transformWithState: cumulative snapshots equal a scalar replay") {
    val rows = StateV2Live.cumStats.run(spark, dir).collect()
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "event_type", "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val midUs = java.time.LocalDate.parse("2024-01-16").atStartOfDay
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (uid, es) =>
      Seq(0L, 1L).flatMap { h =>
        val inHalf = es.filter(e => (if (e._2 >= midUs) 1L else 0L) == h)
        if (inHalf.isEmpty) None
        else {
          val upto = es.filter(e => (if (e._2 >= midUs) 1L else 0L) <= h)
          Some((uid, h, upto.map(_._2).max, upto.length.toLong,
            upto.map(_._4).sum, upto.map(_._3).distinct.length.toLong))
        }
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("AQE skew join: the executed SMJ carries skew=true at sf0.01") {
    // sf0.001's hot partition is under the query's 64KB threshold; the
    // gate SF (0.01) is where the declared thresholds are calibrated
    val df = ScalePatterns.aqeSkewJoin.run(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin did not split the hot partition:\n$plan")
  }

  test("OLS normal equations: independent driver-side solve agrees") {
    val rows = StatsExtra.olsMultiple.run(spark, dir).collect()
    val li = graft.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "CAST(l_quantity AS DOUBLE) AS q",
        "CAST(l_discount AS DOUBLE) AS dd", "CAST(l_extendedprice AS DOUBLE) AS p")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    rows.foreach { r =>
      val flag = r.getString(0)
      val g = li.filter(_._1 == flag)
      // plain Gaussian elimination on the unscaled normal equations —
      // a DIFFERENT arithmetic path than the query's scaled Cramer
      val n = g.length.toDouble
      val (s1, s2, sy) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      val s11 = g.map(t => t._2 * t._2).sum; val s22 = g.map(t => t._3 * t._3).sum
      val s12 = g.map(t => t._2 * t._3).sum
      val s1y = g.map(t => t._2 * t._4).sum; val s2y = g.map(t => t._3 * t._4).sum
      val a = Array(
        Array(n, s1, s2, sy), Array(s1, s11, s12, s1y), Array(s2, s12, s22, s2y))
      for (i <- 0 until 3; j <- i + 1 until 3) {
        val f = a(j)(i) / a(i)(i)
        for (k <- i until 4) a(j)(k) -= f * a(i)(k)
      }
      val b2 = a(2)(3) / a(2)(2)
      val b1 = (a(1)(3) - a(1)(2) * b2) / a(1)(1)
      val b0 = (a(0)(3) - a(0)(1) * b1 - a(0)(2) * b2) / a(0)(0)
      assert(math.abs(r.getDouble(2) - b0) < 1e-6 * (1 + math.abs(b0)), s"$flag b0")
      assert(math.abs(r.getDouble(3) - b1) < 1e-6 * (1 + math.abs(b1)), s"$flag b1")
      assert(math.abs(r.getDouble(4) - b2) < 1e-6 * (1 + math.abs(b2)), s"$flag b2")
      val r2 = r.getDouble(5)
      // synthetic prices are independent of qty/discount, so r2 is tiny;
      // the OLS identity still bounds it to [0, 1)
      assert(r2 >= 0.0 && r2 < 1.0, s"$flag r2=$r2 out of the OLS range")
    }
  }
}
