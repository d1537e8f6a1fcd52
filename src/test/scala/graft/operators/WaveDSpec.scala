package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Wave-D references: the storage-layout pair's load-bearing physical
  * properties (bucketed join = zero exchange between scan and join; DPP
  * = runtime partition filter on the fact scan), the native
  * session_window against a scalar re-merge, Theil–Sen/Mann–Kendall
  * against a brute-force recomputation, and the VARIANT round-trip
  * against its source columns.
  */
class WaveDSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    // AQE wrappers hold their real subtree out-of-band of `children`
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: collectPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: collectPlan(q.plan)
    case _ =>
      (p +: p.children.flatMap(collectPlan)) ++ p.subqueries.flatMap(collectPlan)
  }

  test("bucketed join: no shuffle exchange anywhere under the sort-merge join") {
    val df = ScaleStorage.bucketedJoin.run(spark, dir)
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan
    val smjs = collectPlan(plan).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a SortMergeJoin over the bucketed tables:\n$plan")
    val shufflesUnderJoin = smjs.flatMap(collectPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join still shuffles (co-location lost):\n$plan")
  }

  test("bucketed join result equals the plain (shuffled) join") {
    val bucketed = ScaleStorage.bucketedJoin.run(spark, dir).collect()
    import org.apache.spark.sql.functions._
    val plain = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("DPP: the fact scan carries a dynamicpruning partition filter") {
    val df = ScaleStorage.dppPrune.run(spark, dir)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no dynamic partition pruning filter on the fact scan:\n$planStr")
    // and the result is the three Q1-1995 months
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1995-01", "1995-02", "1995-03"))
  }

  test("native session_window equals a scalar interval-overlap merge") {
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tus", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val gap = 1800L * 1000000L
    val expected = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      // merge rule: event joins the open session iff gap < 30 min STRICTLY
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, Long, Long, Double)]]) {
        case (acc, e) =>
          if (acc.nonEmpty && e._3 - acc.last.last._3 < gap)
            acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
      }
      sessions.map { sess =>
        val vals = sess.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        (uid, sess.head._3, sess.last._3 + gap, sess.size.toLong, vals.sum.toDouble)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("event_session_window_native")(spark, dir)
      .selectExpr("user_id", "unix_micros(CAST(session_start AS TIMESTAMP))",
        "unix_micros(CAST(session_end AS TIMESTAMP))", "n_events", "session_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == expected)
  }

  test("theil-sen slope and mann-kendall stats match a brute-force recomputation") {
    val daily = graft.Tables.orders(spark, dir)
      .selectExpr("CAST(o_orderdate AS DATE) AS d", "CAST(o_totalprice AS DECIMAL(12,2)) AS p")
      .groupBy("d").agg(org.apache.spark.sql.functions.expr("SUM(p) AS rev"))
      .selectExpr("datediff(d, DATE '1992-01-01') AS di", "rev")
      .collect().map(r => (r.getInt(0).toLong, r.getDecimal(1)))
    val pairs = for {
      (d1, r1) <- daily; (d2, r2) <- daily if d1 < d2
    } yield (
      (r2.subtract(r1)).doubleValue / (d2 - d1).toDouble,
      r2.subtract(r1).signum.toLong)
    val slopes = pairs.map(_._1).sorted
    val n = slopes.length
    val median =
      if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
    val s = pairs.map(_._2).sum
    val nd = daily.length.toLong
    val varS = (nd * (nd - 1) * (2 * nd + 5)).toDouble / 18.0
    val z = if (s > 0) (s - 1).toDouble / math.sqrt(varS)
            else if (s < 0) (s + 1).toDouble / math.sqrt(varS) else 0.0
    val row = StatsExtra.theilSenMk.run(spark, dir).collect().head
    assert(row.getLong(0) == nd)
    assert(row.getLong(1) == s)
    assert(math.abs(row.getDouble(2) - z) < 1e-12)
    assert(math.abs(row.getDouble(3) - median) < 1e-12)
  }

  test("variant battery: extracted leaves equal the serialized source columns") {
    // (l_orderkey, l_linenumber) is not unique in the synthetic data, so
    // compare the full row multiset against a direct projection instead
    // of joining on a non-key
    val got = graft.functions.FunctionBatteries.variantBattery.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getLong(5), r.isNullAt(6), r.isNullAt(7)))
      .sortBy(t => (t._1, t._2, t._6, t._4, t._5))
    val expected = graft.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "CAST(l_linenumber AS BIGINT)", "l_orderkey",
        "l_quantity", "l_linestatus", "l_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getLong(5), true, true))
      .sortBy(t => (t._1, t._2, t._6, t._4, t._5))
    assert(got.length == expected.length)
    assert(got.toSeq == expected.toSeq)
  }
}
