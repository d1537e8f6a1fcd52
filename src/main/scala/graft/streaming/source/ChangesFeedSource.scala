package graft.streaming.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a REAL custom streaming source (SURVEY §2.1 deferred this as
  * "a real impl would be a custom SparkDataStream (MicroBatchStream)"):
  * a DataSource V2 `MicroBatchStream` serving a directory of immutable,
  * name-ordered JSONL change dumps — the shape the reference's feed
  * snapshots and backfill directory take — with the consumed position as
  * a proper replayable `Offset`, so Structured Streaming's checkpoint
  * gives resume/exactly-once delivery for free (the engine persists the
  * offset JSON and replays uncommitted ranges; this class only has to
  * make `planInputPartitions(start, end)` deterministic).
  *
  * Contract: files are append-new-only, immutable once visible, and
  * MONOTONICALLY NAMED — a new file must sort after every already-
  * consumed one (the reference's seq-named dumps satisfy this by
  * construction). The offset is the highest consumed file NAME (a
  * watermark), so a contract violation (a late file sorting below the
  * watermark) is skipped — it can never cause re-delivery of already-
  * consumed files, which a count-based offset would. Tracking arbitrary
  * arrival orders needs a seen-file log (what FileStreamSource keeps);
  * for seq-named dumps the watermark is the right, O(1) offset.
  *
  * Usage: `spark.readStream.format("npm-changes-feed")
  *   .option("path", dir).load()` → one `value: string` column, the
  * exact shape NpmStream's pipeline stages consume.
  */
class ChangesFeedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "npm-changes-feed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangesFeedSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("npm-changes-feed requires option 'path'"))
    new ChangesFeedTable(path)
  }
}

object ChangesFeedSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Sorted-name listing of the feed files — the total order offsets
    * index into. The directory stream is closed eagerly: this runs at
    * least twice per trigger for the stream's lifetime, and unclosed
    * Files.list handles leak file descriptors until GC.
    */
  def listFiles(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(_.toString).toList.sorted
      finally stream.close()
    }
  }
}

class ChangesFeedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"npm-changes-feed($path)"
  override def schema(): StructType = ChangesFeedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChangesFeedSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ChangesFeedMicroBatchStream(path)
      }
    }
}

/** Offset = the highest consumed file name ("" = nothing consumed). */
case class NameWatermarkOffset(lastName: String) extends Offset {
  override def json(): String = lastName
}

class ChangesFeedMicroBatchStream(path: String) extends MicroBatchStream {

  override def initialOffset(): Offset = NameWatermarkOffset("")

  override def latestOffset(): Offset =
    NameWatermarkOffset(ChangesFeedSource.listFiles(path).lastOption.getOrElse(""))

  override def deserializeOffset(json: String): Offset =
    NameWatermarkOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[NameWatermarkOffset].lastName
    val e = end.asInstanceOf[NameWatermarkOffset].lastName
    // files are immutable and the (start, end] name range is closed under
    // re-listing, so replaying an uncommitted batch reads the same rows;
    // a file sorting at or below the start watermark is by contract
    // already consumed and is never re-delivered
    ChangesFeedSource.listFiles(path)
      .filter(f => f > s && f <= e)
      .map(f => ChangesFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangesFeedReaderFactory

  override def commit(end: Offset): Unit = () // nothing external to ack
  override def stop(): Unit = ()
}

case class ChangesFilePartition(file: String) extends InputPartition

object ChangesFeedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ChangesFilePartition].file
    new PartitionReader[InternalRow] {
      // streamed, not readAllLines: change lines run up to the 10 MB
      // broker cap each, so materializing a whole dump file would cost
      // O(file) heap per open partition instead of O(one line)
      private val reader = Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)
      private var current: String = _
      override def next(): Boolean = {
        var line = reader.readLine()
        while (line != null && line.isEmpty) line = reader.readLine()
        current = line
        line != null
      }
      override def get(): InternalRow = InternalRow(UTF8String.fromString(current))
      override def close(): Unit = reader.close()
    }
  }
}
