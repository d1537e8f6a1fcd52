package graft.npm

import org.apache.spark.sql.types._

/** Data model for the NPM change-feed pipeline (SURVEY.md §1).
  *
  * The unit of data is one CouchDB `_changes` record (reference:
  * app/changes_consumer.py:391, node_app/producer.ts:137-155). Dynamic-key
  * JSON objects (`versions`, `time`, `dist-tags`, `dependencies`) are
  * MapType — their keys are data, never schema.
  */
object model {

  // ---------- typed view (Dataset[Change] for the normalize stage) -------

  case class Author(name: Option[String], email: Option[String], url: Option[String])

  case class Dist(
      tarball: Option[String],
      unpackedSize: Option[Long],
      shasum: Option[String])

  /** CouchDB attachment stub (the shape `_attachments` values carry on a
    * registry doc; the pipeline never dereferences them, but normalization
    * defaults the containing map — index.js:14).
    */
  case class Attachment(
      content_type: Option[String],
      revpos: Option[Long],
      digest: Option[String],
      length: Option[Long],
      stub: Option[Boolean])

  case class VersionDoc(
      version: Option[String],
      _id: Option[String],
      dist: Option[Dist],
      author: Option[Author],
      maintainers: Option[Seq[Author]],
      dependencies: Option[Map[String, String]],
      // couchapp-added fields normalization rewrites (index.js:28-32):
      // directories defaults to {}, ctime/mtime are deleted
      directories: Option[Map[String, String]] = None,
      ctime: Option[String] = None,
      mtime: Option[String] = None)

  case class PackageDoc(
      _id: Option[String],
      _rev: Option[String],
      name: Option[String],
      `dist-tags`: Option[Map[String, String]],
      versions: Option[Map[String, VersionDoc]],
      time: Option[Map[String, String]],
      _deleted: Option[Boolean],
      error: Option[String],
      reason: Option[String],
      // normalization defaults _attachments to {} and deletes doc-level
      // ctime/mtime (index.js:14,19-20)
      _attachments: Option[Map[String, Attachment]] = None,
      ctime: Option[String] = None,
      mtime: Option[String] = None)

  case class Change(
      seq: Option[Long],
      id: Option[String],
      deleted: Option[Boolean],
      doc: Option[PackageDoc])

  /** Flat catalog record persisted per kept change — the analytical data
    * model (reference: app/changes_consumer.py:310-325). `package_name` is
    * the RAW change id (store_change_details uses change['id'] unsplit;
    * the split name T4 only feeds the save path).
    */
  case class CatalogRecord(
      package_name: String,
      change_seq_id: Long,
      package_revision_id: Option[String],
      package_latest_version: Option[String],
      package_versions_count: Int,
      package_modification_count: Int,
      package_latest_change_time: Option[java.sql.Timestamp],
      package_latest_authors: Option[Author],
      package_latest_maintainers: Option[Seq[Author]],
      package_latest_dependencies: Option[Map[String, String]],
      change_save_path: Option[String],
      package_deleted: Boolean,
      package_distribution_tags: Option[Map[String, String]])

  /** Dead-letter record (reference: skipped_changes payloads,
    * app/changes_producer.py:84 / producer.ts:192, widened per FIXTURES F2).
    */
  case class Skipped(seq: Option[Long], package_name: Option[String], reason: String, stage: String)

  /** Per-stage audit/lineage event (reference: the 5 audit topics,
    * app/changes_consumer.py:354,360,364 — unified with a `stage` column).
    */
  case class AuditEvent(seq: Long, stage: String)

  /** Deletion-log record (reference: deleted-zips DB, changes_consumer.py:211). */
  case class DeletedZip(deleted_zip_path: String)

  // ---------- Spark schema for from_json over the raw feed ---------------

  val authorType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("url", StringType)))

  val attachmentType: StructType = StructType(Seq(
    StructField("content_type", StringType),
    StructField("revpos", LongType),
    StructField("digest", StringType),
    StructField("length", LongType),
    StructField("stub", BooleanType)))

  val versionType: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("_id", StringType),
    StructField("dist", StructType(Seq(
      StructField("tarball", StringType),
      StructField("unpackedSize", LongType),
      StructField("shasum", StringType)))),
    StructField("author", authorType),
    StructField("maintainers", ArrayType(authorType)),
    StructField("dependencies", MapType(StringType, StringType)),
    StructField("directories", MapType(StringType, StringType)),
    StructField("ctime", StringType),
    StructField("mtime", StringType)))

  val docType: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("_rev", StringType),
    StructField("name", StringType),
    StructField("dist-tags", MapType(StringType, StringType)),
    StructField("versions", MapType(StringType, versionType)),
    StructField("time", MapType(StringType, StringType)),
    StructField("_deleted", BooleanType),
    StructField("error", StringType),
    StructField("reason", StringType),
    StructField("_attachments", MapType(StringType, attachmentType)),
    StructField("ctime", StringType),
    StructField("mtime", StringType)))

  val changeSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("id", StringType),
    StructField("deleted", BooleanType),
    StructField("doc", docType)))

  /** Operational constants (reference values, BASELINE.md). */
  val MaxArtifactBytes: Long = 10L * 1000 * 1000 // 10e6, changes_consumer.py:20
  val RetentionLimit: Int = 5                    // OLD_PACKAGE_VERSIONS_LIMIT, :25
  val DirHashLength: Int = 3                     // SUBDIRECTORY_HASH_LENGTH, :24
  /** Broker/producer message cap (docker-compose.yml:44 — 10 MiB). A raw
    * change line larger than this can never be produced to Kafka
    * (MSG_SIZE_TOO_LARGE) and is routed to the DLQ instead (F8/E2,
    * changes_producer.py:74-84 / producer.ts:185-194).
    */
  val MaxKafkaMessageBytes: Long = 10L * 1024 * 1024
}
