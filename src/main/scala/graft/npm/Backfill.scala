package graft.npm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** S7 — directory-scan backfill/repair (reference:
  * legacy_code/app/organize-NAS.py:30-78): walk a package-payload tree,
  * classify files, pick each package's LATEST doc JSON by the ISO-8601
  * timestamp embedded in the filename (T8), and project the catalog
  * subset (P2: _id, _rev, name).
  *
  * Spark-native shape (SURVEY §3.3): one batch job — recursive file scan
  * with `input_file_name()`, window `row_number() = 1` per package
  * directory, `spark.read.json` on the winners. Scales by file listing
  * parallelism; no driver-side walking.
  *
  * Deployment note: the reference's filenames embed `HH:MM:SS` colons.
  * Hadoop's ChecksumFileSystem constructs `.crc` sibling paths as
  * RELATIVE paths, which fail URI parsing on such names — local
  * deployments must set
  * `spark.hadoop.fs.file.impl=org.apache.hadoop.fs.RawLocalFileSystem`
  * (object-store filesystems are unaffected).
  */
object Backfill {

  private val TsInName = "([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}\\.[0-9]+Z)\\.json$"

  /** Scan `root` for `*.json` payload files named `<ISO-8601>.json` inside
    * per-package directories; return one row per package dir with the
    * latest file's path and parsed timestamp.
    */
  def latestJsonPerPackage(spark: SparkSession, root: String): DataFrame =
    latestJsonWithContent(spark, root).select("package_dir", "latest_json_path", "file_ts")

  /** binaryFile is the one Hadoop datasource that round-trips paths with
    * `:` in the filename (the reference's ISO-8601 names embed HH:MM:SS,
    * which the json/text datasources reject as malformed URIs), so the
    * scan loads bytes and JSON-parses them in-plan via from_json.
    */
  private def latestJsonWithContent(spark: SparkSession, root: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"), col("content"))
    val w = Window.partitionBy("package_dir").orderBy(desc("file_ts"), desc("path"))
    files
      .withColumn("package_dir", regexp_replace(col("path"), "/[^/]+$", ""))
      .withColumn("ts_str", regexp_extract(col("path"), TsInName, 1))
      .filter(col("ts_str") =!= "")
      // T8: strptime(fname, '%Y-%m-%dT%H:%M:%S.%fZ') (organize-NAS.py:24)
      .withColumn("file_ts", to_timestamp(col("ts_str"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("package_dir"), col("path").as("latest_json_path"),
        col("file_ts"), col("content"))
  }

  /** Full backfill: read the winning JSON docs, project P2
    * (organize-NAS.py:56) and attach the sibling tarball path.
    */
  def backfillCatalog(spark: SparkSession, root: String): DataFrame =
    latestJsonWithContent(spark, root)
      .withColumn("doc", from_json(decode(col("content"), "UTF-8"),
        org.apache.spark.sql.types.StructType.fromDDL("`_id` STRING, `_rev` STRING, name STRING")))
      .select(col("doc._id").as("_id"), col("doc._rev").as("_rev"),
        col("doc.name").as("name"), col("package_dir"), col("file_ts"))
}
