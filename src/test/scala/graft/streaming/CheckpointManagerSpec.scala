package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The java.nio local checkpoint manager sits on the STREAMING
  * CORRECTNESS path (offset/commit logs, state-store deltas, sink
  * manifests all route through it in every local entry point), so its
  * protocol obligations are pinned directly:
  *  - createAtomic is all-or-nothing: no partial file is ever visible
  *    under the final name, cancel leaves nothing behind
  *  - the non-overwrite collision raises Hadoop's
  *    FileAlreadyExistsException — the exact signal HDFSMetadataLog's
  *    concurrent-writer detection keys on
  *  - an end-to-end stateful streaming query (stop → restart from the
  *    same checkpoint) resumes exactly, proving offset/commit log
  *    round-trips through the manager
  */
class CheckpointManagerSpec extends SparkSpec {

  private def mgr(root: String) =
    new LocalNioCheckpointFileManager(new Path(root), new Configuration())

  private def readAll(m: LocalNioCheckpointFileManager, p: Path): String = {
    val in = m.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  test("createAtomic publishes on close, never a partial file") {
    val root = graft.TmpDirs.create("graft-cfm")
    val m = mgr(root)
    val dst = new Path(s"$root/offsets/0")
    val out = m.createAtomic(dst, overwriteIfPossible = false)
    out.write("v1\n{\"batchWatermarkMs\":0}".getBytes(StandardCharsets.UTF_8))
    assert(!m.exists(dst), "final name visible before close — not atomic")
    out.close()
    assert(m.exists(dst))
    assert(readAll(m, dst).startsWith("v1"))
    // the temp sibling is gone after publish
    assert(m.list(dst.getParent).map(_.getPath.getName).toSet == Set("0"))
  }

  test("cancel leaves nothing behind") {
    val root = graft.TmpDirs.create("graft-cfm")
    val m = mgr(root)
    val dst = new Path(s"$root/commits/7")
    val out = m.createAtomic(dst, overwriteIfPossible = false)
    out.write("doomed".getBytes(StandardCharsets.UTF_8))
    out.cancel()
    assert(!m.exists(dst))
    assert(m.list(dst.getParent).isEmpty)
  }

  test("non-overwrite collision raises Hadoop FileAlreadyExistsException") {
    val root = graft.TmpDirs.create("graft-cfm")
    val m = mgr(root)
    val dst = new Path(s"$root/offsets/3")
    val w1 = m.createAtomic(dst, overwriteIfPossible = false)
    w1.write("winner".getBytes(StandardCharsets.UTF_8)); w1.close()
    val w2 = m.createAtomic(dst, overwriteIfPossible = false)
    w2.write("loser".getBytes(StandardCharsets.UTF_8))
    intercept[FileAlreadyExistsException] { w2.close() }
    // the first writer's content survives, the loser's temp is cleaned
    assert(readAll(m, dst) == "winner")
    assert(m.list(dst.getParent).map(_.getPath.getName).toSet == Set("3"))
    // overwriteIfPossible=true replaces (state-store delta re-commit path)
    val w3 = m.createAtomic(dst, overwriteIfPossible = true)
    w3.write("replaced".getBytes(StandardCharsets.UTF_8)); w3.close()
    assert(readAll(m, dst) == "replaced")
  }

  test("a stateful query restarted from the manager's checkpoint resumes exactly") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    import s.implicits._
    val base = graft.TmpDirs.create("graft-cfm-e2e")
    // two input drops; run drop 1, stop, add drop 2, restart from the
    // SAME checkpoint: dedup state must survive the restart, so the
    // redelivered ids in drop 2 are suppressed
    val d1 = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:01:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val d2 = Seq((2L, "2024-01-01 00:02:00"), (3L, "2024-01-01 00:03:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    d1.coalesce(1).write.parquet(s"$base/in/d1")
    def run(): Unit =
      s.readStream.schema(d1.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$base/out")
        .start().awaitTermination()
    run()
    d2.coalesce(1).write.parquet(s"$base/in/d2")
    run()
    val ids = s.read.parquet(s"$base/out").select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)),
      s"restart lost or duplicated state: ${ids.mkString(",")}")
  }
}
