package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Boundary semantics of the sliding-window chunker (W=32, S=16):
  * chunks must cover every token exactly (reconstruction identity),
  * overlap by W−S, and never emit a trailing chunk that is fully
  * contained in its predecessor.
  */
class ChunkSlidingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dropping each chunk's 16-token overlap reconstructs every document") {
    val out = graft.SparkEntry.queries("text_chunk_sliding")(spark, dir)
      .select("doc_id", "chunk_id", "chunk_text")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val ordered = rows.sortBy(_.getLong(1)).map(_.getString(2))
        val rebuilt = (ordered.head.split(" ") ++
          ordered.tail.flatMap(_.split(" ").drop(16))).mkString(" ")
        id -> rebuilt
      }
    val originals = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == originals.keySet)
    out.foreach { case (id, rebuilt) =>
      assert(rebuilt == originals(id), s"doc $id reconstruction mismatch")
    }
  }

  test("no chunk after the first is contained in its predecessor") {
    val minTail = graft.SparkEntry.queries("text_chunk_sliding")(spark, dir)
      .filter(col("chunk_id") > 0)
      .agg(min(col("chunk_tokens"))).collect()(0).getLong(0)
    // a chunk of ≤16 tokens would lie entirely inside the previous
    // 32-token window (stride 16): the start grid must prevent it
    assert(minTail > 16, s"found a fully-contained trailing chunk ($minTail tokens)")
  }

  test("short documents (n ≤ 32 tokens) produce exactly one full chunk") {
    val shortDocs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") <= 32)
    val counts = graft.SparkEntry.queries("text_chunk_sliding")(spark, dir)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"), sum("chunk_tokens").as("tot"))
      .join(shortDocs, "doc_id")
    val bad = counts.filter(col("n_chunks") =!= 1 || col("tot") =!= col("n")).count()
    assert(bad == 0)
  }
}
