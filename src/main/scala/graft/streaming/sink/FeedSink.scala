package graft.streaming.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** K1's DSv2 twin — a custom `StreamingWrite` sink with the two-phase,
  * epoch-committed protocol a transactional catalog/feed sink needs:
  *
  *  - tasks write their rows to uniquely-named temp files and report
  *    them in `WriterCommitMessage`s (phase 1, speculative);
  *  - the driver's `commit(epochId, messages)` REPLACES the epoch's
  *    directory with exactly the reported files (phase 2, atomic per
  *    epoch) — so a re-run of an uncommitted epoch after a crash
  *    replaces its own partial output instead of duplicating it, the
  *    same exactly-once contract NpmStream.writeBatchOutputs gives the
  *    foreachBatch path;
  *  - `abort` deletes the reported temp files.
  *
  * Takes the Kafka-sink row contract (a `value: string` column — see
  * NpmStream.kafkaSink) and lands each value as one line of
  * `epoch=<id>/part-*.jsonl`. Local-filesystem rename stands in for the
  * object-store manifest swap a cluster deployment would use; the
  * PROTOCOL (task-unique temp names + driver-side epoch commit) is the
  * part that carries over unchanged.
  *
  * Usage: `df.writeStream.format("npm-feed-sink").option("path", dir)`.
  */
class FeedSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "npm-feed-sink"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the query
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("npm-feed-sink requires option 'path'"))
    new FeedSinkTable(path, schema)
  }
}

class FeedSinkTable(path: String, schema: StructType) extends Table with SupportsWrite {
  override def name(): String = s"npm-feed-sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val valueIdx = info.schema().fieldNames.indexOf("value")
    require(valueIdx >= 0 && info.schema()(valueIdx).dataType == StringType,
      s"npm-feed-sink requires a 'value: string' column, got ${info.schema().sql}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new FeedStreamingWrite(path, valueIdx)
      }
    }
  }
}

case class FeedFileCommit(tempFile: String, droppedTombstones: Long = 0L)
  extends WriterCommitMessage

class FeedStreamingWrite(path: String, valueIdx: Int) extends StreamingWrite
  with org.apache.spark.internal.Logging {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    FeedWriterFactory(path, valueIdx)

  /** Phase 2: replace the epoch directory with exactly the files the
    * committing attempt reported — idempotent across epoch re-runs.
    */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val epochDir = Paths.get(path, s"epoch=$epochId")
    if (Files.isDirectory(epochDir)) {
      val old = Files.list(epochDir)
      try old.iterator().asScala.toList.foreach(Files.delete)
      finally old.close()
    } else Files.createDirectories(epochDir)
    messages.collect { case FeedFileCommit(tmp, _) => Paths.get(tmp) }
      .foreach { tmp =>
        // a reported file that vanished is DATA LOSS, not something to
        // skip: fail the batch so the engine replays the epoch
        if (!Files.exists(tmp)) throw new IllegalStateException(
          s"npm-feed-sink epoch $epochId commit: reported temp file missing: $tmp")
        Files.move(tmp, epochDir.resolve(tmp.getFileName),
          StandardCopyOption.REPLACE_EXISTING)
      }
    // a JSONL file has no tombstone representation, so writers drop
    // NULL-value rows — but silently diverging from the input is not
    // acceptable: surface the count in the committed epoch's manifest
    // (and the log) so an exported feed is auditable against its source
    val dropped = messages.collect { case FeedFileCommit(_, d) => d }.sum
    if (dropped > 0) {
      Files.write(epochDir.resolve("_dropped_tombstones"),
        dropped.toString.getBytes(StandardCharsets.UTF_8))
      logWarning(s"npm-feed-sink epoch $epochId dropped $dropped NULL-value " +
        "tombstone row(s) with no JSONL representation")
    }
    // GC orphaned speculative files from dead task attempts (killed
    // executors never run abort): anything still in _tmp for an epoch at
    // or below the one just committed can never be committed again
    val tmpDir = Paths.get(path, "_tmp")
    if (Files.isDirectory(tmpDir)) {
      val orphans = Files.list(tmpDir)
      try orphans.iterator().asScala.toList
        .filter { f =>
          f.getFileName.toString.split("-").lift(1)
            .flatMap(s => scala.util.Try(s.toLong).toOption)
            .exists(_ <= epochId)
        }
        .foreach(Files.deleteIfExists(_))
      finally orphans.close()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case FeedFileCommit(tmp, _) => Paths.get(tmp) }
      .foreach(Files.deleteIfExists(_))
}

case class FeedWriterFactory(path: String, valueIdx: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new FeedDataWriter(path, valueIdx, partitionId, taskId, epochId)
}

/** Phase 1: speculative temp file, unique per (epoch, partition, task)
  * attempt, only published by the driver commit.
  */
class FeedDataWriter(path: String, valueIdx: Int, partitionId: Int, taskId: Long, epochId: Long)
  extends DataWriter[InternalRow] {

  private val tmpDir: Path = {
    val d = Paths.get(path, "_tmp")
    Files.createDirectories(d)
    d
  }
  private val tmpFile: Path =
    tmpDir.resolve(f"part-$epochId%05d-$partitionId%05d-$taskId.jsonl")
  private val out = Files.newBufferedWriter(tmpFile, StandardCharsets.UTF_8)
  private var droppedTombstones = 0L

  override def write(row: InternalRow): Unit = {
    // null values are tombstones in the Kafka contract this sink mirrors;
    // a line-oriented file has no tombstone representation, so they are
    // skipped rather than NPE-ing the task — but COUNTED, so the driver
    // commit can surface how far the exported feed diverges from its input
    if (!row.isNullAt(valueIdx)) {
      out.write(row.getUTF8String(valueIdx).toString)
      out.write("\n")
    } else droppedTombstones += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    FeedFileCommit(tmpFile.toString, droppedTombstones)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(tmpFile); () }
  override def close(): Unit = ()
}
