package graft.npm

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** K6 — the filesystem payload sink made real: per kept change, write a
  * zip containing the doc JSON and the (fetched) tarball bytes into the
  * hashed directory layout (reference: compress_files,
  * app/changes_consumer.py:246-280 — zip of `<name>_doc.json` +
  * `<name>_package.tgz` at `<remote>/<prefix>/<pkg>/<name>_<rev>.zip`).
  *
  * Runs as `foreachPartition`: payload I/O is inherently side-effecting
  * (SURVEY §2.2 K6), so it lives in a sink stage with partition-local
  * batching, while the catalog stays the queryable surface. Writes are
  * idempotent (same path ⇒ overwrite) so at-least-once replays converge.
  */
object PayloadSink {

  case class Payload(
      save_path: String,
      split_name: String,
      doc_json: String,
      tarball_bytes: Array[Byte])

  case class WriteResult(save_path: String, n_bytes: Long)

  /** Build the zip bytes for one change — pure, unit-testable. */
  def zipBytes(p: Payload): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry(s"${p.split_name}_doc.json"))
    zos.write(p.doc_json.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
    if (p.tarball_bytes != null && p.tarball_bytes.nonEmpty) {
      zos.putNextEntry(new ZipEntry(s"${p.split_name}_package.tgz"))
      zos.write(p.tarball_bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Write all payloads under `root`; returns per-file results (path +
    * size) as a Dataset so the caller can audit/append them.
    */
  def write(payloads: Dataset[Payload], root: String)(
      implicit spark: SparkSession): Dataset[WriteResult] = {
    implicit val enc: Encoder[WriteResult] = Encoders.product[WriteResult]
    payloads.mapPartitions { it =>
      it.map { p =>
        val bytes = zipBytes(p)
        val f = new File(root, p.save_path)
        f.getParentFile.mkdirs()
        val out = new FileOutputStream(f)
        try out.write(bytes) finally out.close()
        WriteResult(p.save_path, bytes.length.toLong)
      }
    }
  }

  /** Bridge from the pipeline's derived columns to payloads: doc JSON is
    * re-serialized from the normalized doc (T2), tarball bytes come from
    * the enrichment stage (stubbed fetcher in tests).
    */
  def fromDerived(kept: DataFrame, tarballOf: String => Array[Byte])(
      implicit spark: SparkSession): Dataset[Payload] = {
    import spark.implicits._
    kept.select(
        col("save_path"), col("split_name"),
        to_json(col("doc")).as("doc_json"),
        coalesce(col("tarball_url"), lit("")).as("url"))
      .as[(String, String, String, String)]
      .mapPartitions { it =>
        it.map { case (path, name, doc, url) =>
          Payload(path, name, doc, tarballOf(url))
        }
      }
  }
}
