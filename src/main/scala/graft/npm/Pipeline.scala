package graft.npm

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import model._

/** The consumer pipeline (SURVEY.md §3.2), batch form. The streaming form
  * (graft.streaming.NpmStream) rebinds these same stages to a streaming
  * source — stages are DataFrame→DataFrame functions, so batch replay is
  * fully testable without Kafka (SURVEY.md §7.1 build order).
  *
  * Stage chain and the reference operators each one re-expresses:
  *   parse (T1)  → normalize (T3/F7) → validity+size filters (F1,F2,F4)
  *   → enrichment (S6/F5, injectable) → catalog projection (P1,T4,T6,T7,F6)
  *   → routing: catalog (K4) ⊕ skipped DLQ (K3), audit events (K2),
  *     retention evictions (A5 → K5).
  *
  * Declarative-wins note (§4.1): size caps run BEFORE any payload work
  * (the reference's F4 pre-download variant, legacy mirror.ts:119), so the
  * F3 "delete the already-written JSON" cascade becomes unnecessary.
  */
object Pipeline {

  val RemotePackageDir = "npm-mirror-packages"

  /** Injectable tarball fetcher (S6): url → (http status, byte count).
    * Production would do real HTTP with a connection pool per partition;
    * tests inject a deterministic Map-backed stub (FIXTURES.md F3). Must
    * be serializable.
    */
  type Fetcher = String => (Int, Long)
  object AlwaysOk extends (String => (Int, Long)) with Serializable {
    def apply(url: String): (Int, Long) = (200, 0L)
  }

  final case class PipelineResult(
      catalog: DataFrame,   // CatalogRecord rows
      skipped: DataFrame,   // Skipped rows (DLQ)
      audit: DataFrame,     // AuditEvent rows
      deletions: DataFrame) // Retention.Eviction rows

  /** T1: raw JSON lines → typed change column + retained raw string. */
  def parse(raw: DataFrame): DataFrame =
    raw.select(
      from_json(col("value"), changeSchema).as("c"),
      col("value").as("raw"))

  /** F8/E2: split the raw feed on the broker message cap. Rows whose
    * serialized change exceeds MaxKafkaMessageBytes can never be produced
    * (MSG_SIZE_TOO_LARGE) — the reference catches the produce failure and
    * writes the seq to `skipped_changes` (changes_producer.py:74-84,
    * producer.ts:185-194); declaratively that's a length pre-filter, so
    * the routing also works where there is no Kafka hop at all (batch
    * replay, file source). Returns (fit, skippedRows) where skippedRows
    * is already in DLQ shape (seq, package_name, reason, stage).
    */
  def splitOversized(raw: DataFrame): (DataFrame, DataFrame) = {
    // octet_length, not length: the broker cap is a BYTE limit and npm
    // docs carry multibyte UTF-8 (CJK descriptions, emoji) — a 6M-char
    // line can be 12 MiB of bytes. NULL values (Kafka tombstones) count
    // as 0 bytes so they flow to parse() and land in the DLQ as
    // corrupt_json — a bare filter would drop them from BOTH branches.
    val bytes = coalesce(octet_length(col("value")), lit(0L))
    val fit = raw.filter(bytes <= MaxKafkaMessageBytes)
    val oversized = parse(raw.filter(bytes > MaxKafkaMessageBytes))
      .select(
        col("c.seq").as("seq"), col("c.id").as("package_name"),
        lit("msg_too_large").as("reason"), lit("produce").as("stage"))
    (fit, oversized)
  }

  /** T3 through the Column-DSL path (codegen semver_clean + map HOFs) —
    * no per-row encoder round-trip. Semantically equal to the typed
    * [[normalizeTyped]] (NormalizeColumnsSpec pins it); the typed form
    * stays as the property-tested reference semantics.
    */
  def normalize(parsed: DataFrame)(implicit spark: SparkSession): Dataset[Change] = {
    // register on the session that OWNS the frame: under foreachBatch the
    // micro-batch runs in a cloned session whose registry is isolated
    // from the driver session's
    graft.functions.SemverExpressions.register(parsed.sparkSession)
    implicit val enc: Encoder[Change] = Encoders.product[Change]
    parsed.filter(col("c").isNotNull && col("c.seq").isNotNull)
      .select("c.*")
      .withColumn("doc", Normalize.normalizedDocColumn(col("doc")))
      .as[Change]
  }

  /** T3 applied through the typed API (pure function, property-tested). */
  def normalizeTyped(parsed: DataFrame)(implicit spark: SparkSession): Dataset[Change] = {
    implicit val enc: Encoder[Change] = Encoders.product[Change]
    parsed.filter(col("c").isNotNull && col("c.seq").isNotNull)
      .select("c.*").as[Change]
      .map(Normalize.normalizeChange)
  }

  /** Derived columns + validity flags over normalized changes. Everything
    * here is Column DSL → codegen'd, null-safe via map element_at.
    */
  def withDerived(changes: Dataset[Change]): DataFrame = {
    val df = changes.toDF()
    df
      .withColumn("latest", element_at(col("doc.`dist-tags`"), "latest"))
      .withColumn("latest_version_doc", element_at(col("doc.versions"), col("latest")))
      .withColumn("latest_time_str", element_at(col("doc.time"), col("latest")))
      .withColumn("doc_json_size", length(to_json(col("doc"))).cast("long"))
      .withColumn("tarball_url", col("latest_version_doc.dist.tarball"))
      .withColumn("tarball_size", col("latest_version_doc.dist.unpackedSize"))
      // T4 scoped-name split + T6 dir prefix + T7/F6 filename templating
      .withColumn("split_name", element_at(split(col("id"), "/"), -1))
      .withColumn("dir_prefix",
        when(length(col("id")) >= DirHashLength, upper(substring(col("id"), 1, DirHashLength)))
          .otherwise(upper(substring(col("id"), 1, 1))))
      .withColumn("package_dir",
        concat_ws("/", lit(RemotePackageDir), col("dir_prefix"), col("id")))
      .withColumn("zip_name",
        concat(
          when(coalesce(col("deleted"), lit(false)), lit("Deleted-")).otherwise(lit("")),
          col("split_name"), lit("_"), col("doc._rev"), lit(".zip")))
      .withColumn("save_path", concat_ws("/", col("package_dir"), col("zip_name")))
      // A5 trigger heuristic: len(time) - len(versions) == 2
      .withColumn("retention_triggered",
        coalesce(size(map_keys(col("doc.time"))) - size(map_keys(col("doc.versions"))) === 2,
          lit(false)))
      // rejection reason: first failing check wins (ordered like the
      // reference's sequential control flow)
      .withColumn("reject_reason",
        when(col("doc").isNull, "no_doc")                                  // F1 / normalize-dropped
          .when(col("doc_json_size") > MaxArtifactBytes, "doc_too_large")  // F2
          .when(col("latest").isNull, "missing_latest_tag")                // P3 guard
          .when(col("latest_version_doc").isNull, "missing_latest_version")
          .when(col("latest_time_str").isNull, "missing_latest_time")
          .when(col("tarball_size") > MaxArtifactBytes, "tarball_too_large")) // F4
      .withColumn("reject_stage",
        when(col("reject_reason").isin("no_doc"), "download")
          .when(col("reject_reason").isin("doc_too_large", "tarball_too_large"), "size_filter")
          .otherwise("catalog"))
  }

  /** S6 enrichment on the surviving rows: per-partition fetcher reuse
    * (mapPartitions, never a per-row UDF — connection amortization), then
    * F5 status routing.
    */
  def enrich(kept: DataFrame, fetcher: Fetcher)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val urls = kept.select(col("seq").as[Long], coalesce(col("tarball_url"), lit("")).as[String])
      .as[(Long, String)]
      .mapPartitions { it =>
        // one fetcher binding per partition ≈ one connection pool per task
        it.map { case (seq, url) =>
          val (status, n) = fetcher(url)
          (seq, status, n)
        }
      }
      .toDF("seq", "tarball_status", "fetched_bytes")
    kept.join(urls, "seq")
  }

  /** Full batch replay. */
  def replay(
      raw: DataFrame,
      fetcher: Fetcher = AlwaysOk)(implicit spark: SparkSession): PipelineResult = {
    import spark.implicits._

    val (fit, oversized) = splitOversized(raw)
    val parsed = parse(fit)
    val corrupt = parsed.filter(col("c").isNull || col("c.seq").isNull)
      .select(
        col("c.seq").as("seq"), col("c.id").as("package_name"),
        lit("corrupt_json").as("reason"), lit("parse").as("stage"))

    val derived = withDerived(normalize(parsed)).cache()

    val preRejected = derived.filter(col("reject_reason").isNotNull)
      .select(col("seq"), col("id").as("package_name"),
        col("reject_reason").as("reason"), col("reject_stage").as("stage"))

    val enriched = enrich(derived.filter(col("reject_reason").isNull), fetcher)
    val fetchRejected = enriched.filter(col("tarball_status") =!= 200)
      .select(col("seq"), col("id").as("package_name"),
        concat(lit("http_"), col("tarball_status")).as("reason"),
        lit("download").as("stage"))

    val kept = enriched.filter(col("tarball_status") === 200).cache()

    val catalog = kept.select(
      col("id").as("package_name"),
      col("seq").as("change_seq_id"),
      col("doc._rev").as("package_revision_id"),
      col("latest").as("package_latest_version"),
      size(map_keys(col("doc.versions"))).as("package_versions_count"),
      size(map_keys(col("doc.time"))).as("package_modification_count"),
      to_timestamp(col("latest_time_str"), "yyyy-MM-dd'T'HH:mm:ss.SSSX")
        .as("package_latest_change_time"),
      col("latest_version_doc.author").as("package_latest_authors"),
      col("latest_version_doc.maintainers").as("package_latest_maintainers"),
      col("latest_version_doc.dependencies").as("package_latest_dependencies"),
      col("save_path").as("change_save_path"),
      coalesce(col("deleted"), lit(false)).as("package_deleted"),
      col("doc.`dist-tags`").as("package_distribution_tags"))

    val audit = kept.select(col("seq"),
        explode(array(lit("downloaded_in_local"), lit("moved_to_remote"), lit("added_to_db")))
          .as("stage"))

    val skipped = oversized.unionByName(corrupt).unionByName(preRejected).unionByName(fetchRejected)

    val arrivals = kept.select(
        col("package_dir"), col("zip_name").as("file_name"),
        col("seq").as("ctime"), col("retention_triggered"))
      .as[Retention.ZipArrival]
    val deletions = Retention.evictions(arrivals).toDF()

    PipelineResult(catalog, skipped, audit, deletions)
  }
}
