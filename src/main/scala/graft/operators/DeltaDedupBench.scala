package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Steady-state throughput of the INCREMENTAL near-dup path (VERDICT r6
  * #6): the mode a growing corpus actually runs, measured as docs/second
  * across N delta batches probed against a persisted corpus sketch
  * index — the number behind the "growth is O(|delta| × bucket)" claim,
  * instead of assuming it from the one-shot
  * `dedup_minhash_incremental_delta` gate query.
  *
  * Model: the existing corpus (doc_id % 10 != 0) builds its sketch index
  * ONCE (shingles, 16-hash minhash signatures, 4×4 LSH bands — all
  * eagerly checkpointed, exactly the persisted index a production corpus
  * maintains). The delta stream (doc_id % 10 == 0) arrives in N batches;
  * each batch (a) sketches ONLY its own documents, (b) generates
  * candidates through the one-sided band join (batch bands ⋈ index
  * bands), (c) exact-verifies candidates with the broadcast-pruned
  * co-shingle join (the estimate_quality shape), and (d) APPENDS its
  * sketch to the index, so later batches also dedup against earlier
  * arrivals — the real corpus-growth loop. The index grows as a union of
  * checkpointed per-batch frames: appends cost O(|batch|), never a
  * rewrite of the corpus index.
  *
  * Batch 0 is the warmup (JIT + codegen); the reported rate covers the
  * remaining batches.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     scripts/run_main.sh graft.operators.DeltaDedupBench
  */
object DeltaDedupBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_DELTA_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val isNew = col("doc_id") % 10 === 0

    // ---- the persisted corpus sketch index (built once, off the clock) --
    val corpusSh = Dedup.shingles(docs.filter(!isNew)).localCheckpoint(true)
    val corpusBands = Dedup.bandsOf(Dedup.minhashOf(corpusSh)).localCheckpoint(true)

    // index = growing sequences of CHECKPOINTED frames; union is lazy and
    // recompute-free, append is O(|batch|)
    var indexSh = List(corpusSh)
    var indexBands = List(corpusBands)

    val delta = docs.filter(isNew)
      .withColumn("batch", expr(s"(doc_id div 10) % $nBatches"))
      .localCheckpoint(true)

    def runBatch(b: Int): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val bd = delta.filter(col("batch") === b).select("doc_id", "text")
      // (a) sketch ONLY the batch, (b) one-sided band-join candidates,
      // (c) candidate-scoped exact verification — the shared core, same
      // code the streaming wrapper runs per micro-batch
      val (bsh, bbands) = Dedup.deltaSketch(bd)
      val nearDups = Dedup.deltaNearDupsFromSketch(bsh, bbands,
        indexSh.reduce(_ unionByName _), indexBands.reduce(_ unionByName _)).count()
      // (d) the batch joins the index: later deltas dedup against it too
      indexSh = bsh :: indexSh
      indexBands = bbands :: indexBands
      val nDocs = bd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      (nDocs, nearDups, dt)
    }

    val results = (0 until nBatches).map(runBatch)
    val steady = results.drop(1) // batch 0 pays JIT/codegen warmup
    val docsTotal = steady.map(_._1).sum
    val dupsTotal = steady.map(_._2).sum
    val secTotal = steady.map(_._3).sum
    val rate = docsTotal / secTotal
    def f(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    println(
      s"""{"metric":"delta_dedup_docs_per_sec","value":${f("%.0f", rate)},"unit":"docs/sec","batches":${steady.size},"delta_docs":$docsTotal,"near_dups":$dupsTotal,"sec":${f("%.3f", secTotal)},"warmup_sec":${f("%.3f", results.head._3)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
