package graft.npm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  import spark.implicits._

  private lazy val result =
    Pipeline.replay(Fixtures.withFetch404.toDF("value"), Fixtures.RoutingFetcher)

  private lazy val catalog = result.catalog.cache()
  private lazy val skipped = result.skipped.cache()

  test("each fixture routes to its expected destination") {
    val inCatalog = catalog.select("change_seq_id").as[Long].collect().toSet
    val expectedCatalog = Set(1L, 2L, 3L, 4L, 8L, 13L)
    assert(inCatalog == expectedCatalog)
  }

  test("lineage conservation: every parseable seq lands in exactly one of catalog/skipped") {
    // the corrupt line has no seq — it appears in skipped with seq null
    val catSeqs = catalog.select("change_seq_id").as[Long].collect().toSet
    val skipSeqs = skipped.filter(col("seq").isNotNull).select("seq").as[Long].collect().toSet
    assert((catSeqs & skipSeqs).isEmpty)
    assert(catSeqs ++ skipSeqs == (1L to 13L).toSet - 12L)
    assert(skipped.filter(col("seq").isNull).count() == 1) // the corrupt line
  }

  test("skip reasons match the reference's rejection paths") {
    val reasons = skipped.filter(col("seq").isNotNull)
      .select("seq", "reason").as[(Long, String)].collect().toMap
    assert(reasons(5L) == "no_doc")
    assert(reasons(6L) == "no_doc")           // _design dropped by normalize
    assert(reasons(7L) == "tarball_too_large")
    assert(reasons(9L) == "missing_latest_tag") // "0.6" tag dropped by T3
    assert(reasons(10L) == "missing_latest_tag")
    assert(reasons(11L) == "http_404")
  }

  test("audit lineage: kept changes emit all three stages, skipped none") {
    val byStage = result.audit.groupBy("stage").count()
      .as[(String, Long)].collect().toMap
    assert(byStage == Map(
      "downloaded_in_local" -> 6L, "moved_to_remote" -> 6L, "added_to_db" -> 6L))
    val auditSeqs = result.audit.select("seq").distinct().as[Long].collect().toSet
    assert(auditSeqs == catalog.select("change_seq_id").as[Long].collect().toSet)
  }

  test("catalog projection: scoped name, dir hashing, Deleted- prefix") {
    val rows = catalog.select("change_seq_id", "package_name", "change_save_path", "package_deleted")
      .as[(Long, String, String, Boolean)].collect().map(r => r._1 -> r).toMap
    // plain: 3-char uppercase prefix
    assert(rows(1L)._3 == "npm-mirror-packages/PLA/plainpkg/plainpkg_1-abc.zip")
    // scoped: raw-name prefix + nested dirs, filename from split name (T4)
    assert(rows(2L)._2 == "@scope/name")
    assert(rows(2L)._3 == "npm-mirror-packages/@SC/@scope/name/name_1-abc.zip")
    // short name: single-char fallback (T6)
    assert(rows(3L)._3 == "npm-mirror-packages/A/ab/ab_1-abc.zip")
    // deletion change: Deleted- prefix (F6), flag set
    assert(rows(4L)._3.endsWith("/Deleted-deadpkg_1-abc.zip"))
    assert(rows(4L)._4)
  }

  test("catalog projection: counts, latest fields, maps survive") {
    val r = catalog.filter(col("change_seq_id") === 1).head()
    assert(r.getAs[String]("package_latest_version") == "1.0.0")
    assert(r.getAs[Int]("package_versions_count") == 1)
    assert(r.getAs[Int]("package_modification_count") == 3)
    assert(r.getAs[Row]("package_latest_authors").getAs[String]("name") == "ada")
    assert(r.getAs[scala.collection.Seq[Row]]("package_latest_maintainers").size == 2)
    assert(r.getAs[Map[String, String]]("package_latest_dependencies")
      == Map("left-pad" -> "^1.0.0", "semver" -> "~7.0.0"))
    assert(r.getAs[Map[String, String]]("package_distribution_tags") == Map("latest" -> "1.0.0"))
    assert(r.getAs[java.sql.Timestamp]("package_latest_change_time") != null)
  }

  test("T3 semver cleaning flows through to the catalog (seq 8)") {
    val r = catalog.filter(col("change_seq_id") === 8).head()
    // raw key was v1.0.0; catalog sees the cleaned version everywhere
    assert(r.getAs[String]("package_latest_version") == "1.0.0")
    assert(r.getAs[Map[String, String]]("package_distribution_tags") == Map("latest" -> "1.0.0"))
  }

  test("F8/E2: a change over the broker message cap routes to the DLQ as msg_too_large") {
    // the reference can't produce a >10 MiB line to Kafka at all
    // (MSG_SIZE_TOO_LARGE) and writes the seq to skipped_changes instead
    // (changes_producer.py:74-84, producer.ts:185-194)
    // multibyte pad: é is 2 UTF-8 bytes, so this line is over the BYTE
    // cap while its CHARACTER count is only ~half the cap — catches a
    // length()-vs-octet_length() regression
    val pad = "é" * (model.MaxKafkaMessageBytes.toInt / 2 + 64)
    val big = s"""{"seq":99,"id":"bigpkg","pad":"$pad"}"""
    val r = Pipeline.replay(
      (Fixtures.withFetch404 :+ big).toDF("value"), Fixtures.RoutingFetcher)
    val row = r.skipped.filter(col("seq") === 99).head()
    assert(row.getAs[String]("package_name") == "bigpkg")
    assert(row.getAs[String]("reason") == "msg_too_large")
    assert(row.getAs[String]("stage") == "produce")
    // and it never reaches the catalog
    assert(r.catalog.filter(col("change_seq_id") === 99).count() == 0)
  }

  test("a NULL value (Kafka tombstone) lands in the DLQ, never silently dropped") {
    val r = Pipeline.replay(
      (Fixtures.withFetch404 :+ (null: String)).toDF("value"), Fixtures.RoutingFetcher)
    // the tombstone has no parseable seq → corrupt_json at parse, like
    // any unparseable line; the fixture corpus itself contributes one
    assert(r.skipped.filter(col("seq").isNull && col("reason") === "corrupt_json").count() == 2)
  }

  test("retention heuristic: seq 13 (unpublished versions) does not trigger") {
    // seq 13 has len(time)-len(versions)=3 → arrival flagged untriggered;
    // with single-arrival packages there are no evictions at all here
    assert(result.deletions.count() == 0)
  }
}
