package graft.operators

import graft.SparkSpec

/** Wave-C references: session trigram mining recomputed scalar-side,
  * the per-key reservoir against a MessageDigest re-draw, and the live
  * count-min stream pinned EQUAL to the batch-built sketch (the merge
  * algebra proven at the result level, not asserted).
  */
class WaveCSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("event_session_path_trigrams matches a scalar sessionize+count") {
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tus",
        "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val grams = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      // split into sessions on >30 min gaps
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          if (acc.nonEmpty && e._3 - acc.last.last._3 <= 1800L * 1000000L)
            acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
      }
      sessions.flatMap(sess => sess.map(_._4).sliding(3).filter(_.size == 3))
    }
    val expected = grams.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (g, n) => (g(0), g(1), g(2), n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(20)
    val got = graft.SparkEntry.queries("event_session_path_trigrams")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getAs[Long]("n")))
    assert(got.toSeq == expected)
  }

  test("sample_reservoir_per_key: exactly K per stratum, equal to a direct hash re-draw") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = graft.Tables.documents(spark, dir)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      ds.map(_._2).sortBy(id => (md5hex(id.toString), id)).take(25).toVector
    }.toMap
    val got = graft.SparkEntry.queries("sample_reservoir_per_key")(spark, dir)
      .collect()
      .groupBy(_.getAs[String]("source")).view
      .mapValues(_.sortBy(_.getAs[Long]("r")).map(_.getAs[Long]("doc_id")).toVector)
      .toMap
    assert(got == expected)
    got.values.foreach(v => assert(v.size == 25))
  }

  test("stream_countmin_live equals the batch-built sketch audit row-for-row") {
    val live = SketchOps.countMinLive.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = SketchOps.countMin.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(live.toSeq == batch.toSeq)
    // count-min guarantee: estimates never undercount
    assert(live.forall { case (_, _, _, over) => over >= 0 })
  }
}
