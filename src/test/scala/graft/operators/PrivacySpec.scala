package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** privacy_pii_scan (injected-PII detection, clean flag) and
  * privacy_pseudonymize_audit (injectivity, zero collisions).
  */
class PrivacySpec extends SparkSpec {

  test("pii scan counts exactly the injected matches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice.smith+x@example.org or bob@test.io", "a"), // 2 emails
      (2L, "server 10.0.255.1 and 192.168.1.1 up", "a"),                   // 2 ipv4
      (3L, "ssn 123-45-6789 phone +14155551234", "b"),                     // 1 ssn, 1 phone
      (4L, "perfectly clean text with no identifiers", "c"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = PrivacyOps.piiScan.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toMap
    assert(got("a") == ((2L, 2L, 0L, 0L, false)), s"source a: ${got("a")}")
    assert(got("b") == ((0L, 0L, 1L, 1L, false)), s"source b: ${got("b")}")
    assert(got("c") == ((0L, 0L, 0L, 0L, true)), s"clean source: ${got("c")}")
  }

  test("pseudonymization is consistent and injective") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // 30 users, each active under two event types — per-type and global
    // pseudonym counts must equal user counts, zero collisions
    val events = (1 to 30).flatMap(u =>
      Seq((u.toLong * 2, t0, u.toLong, "view"), (u.toLong * 2 + 1, t0, u.toLong, "click")))
    val dir = java.nio.file.Files.createTempDirectory("pseud").toString
    events.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = PrivacyOps.pseudonymizeAudit.run(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") == 30L &&
        r.getAs[Long]("n_pseudonyms") == 30L &&
        r.getAs[Boolean]("injective") &&
        r.getAs[Long]("n_collisions") == 0L, s"$r")
    }
  }
}
