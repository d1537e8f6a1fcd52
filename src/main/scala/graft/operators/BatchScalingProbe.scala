package graft.operators

import org.apache.spark.sql.SparkSession

/** Diagnostic main (r14 verdict item 5): the batched serving arms'
  * amortization claims (54× for ann_ivfadc_batch_topk at Q=100, 10× for
  * ann_knn_graph_greedy_batch at Q=10) were measured at ONE batch size
  * each. This sweeps Q at fixed sf0.1 and prints total and per-query
  * cost, so the DESIGN.md table shows whether per-query cost keeps
  * falling — or where the knee is. The query-sided broadcast of the
  * IVFADC batch grows linearly in Q (Q·W·M·K distance-table cells), so
  * its limit is worth knowing before anyone claims Q=10⁴.
  *
  * The pinned index/graph artifacts are trained once (outside every
  * timed window, like the deployment the arms model); each timed point
  * is min over 2 passes.
  *
  * `scripts/run_main.sh graft.operators.BatchScalingProbe`
  */
object BatchScalingProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalNioCheckpointFileManager")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMin(passes: Int)(f: => Unit): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // train the pinned artifacts once, untimed (the deployment split)
    AnnSearch.ivfAdcBatchProbe(spark, dir, 1L).count(): Unit
    AnnSearch.greedyBatchProbe(spark, dir, 1L).count(): Unit

    // serial baselines: the single-query probes over the same artifacts
    val singleIvf = timeMin(3) {
      graft.SparkEntry.queries("ann_ivfadc_prebuilt")(spark, dir).count(): Unit
    }
    val singleGreedy = timeMin(3) {
      graft.SparkEntry.queries("ann_knn_graph_greedy_search")(spark, dir).count(): Unit
    }
    println(f"[qscale] single ivfadc_prebuilt probe: $singleIvf%.3f s; " +
      f"single greedy search: $singleGreedy%.3f s")

    for (q <- Seq(100L, 250L, 500L)) {
      val t = timeMin(2) { AnnSearch.ivfAdcBatchProbe(spark, dir, q).count(): Unit }
      println(f"[qscale] ivfadc_batch Q=$q%4d total=$t%.3f s per-query=${t / q}%.5f s " +
        f"amortization=${singleIvf * q / t}%.1fx")
    }
    for (q <- Seq(10L, 25L, 50L)) {
      val t = timeMin(2) { AnnSearch.greedyBatchProbe(spark, dir, q).count(): Unit }
      println(f"[qscale] greedy_batch Q=$q%4d total=$t%.3f s per-query=${t / q}%.5f s " +
        f"amortization=${singleGreedy * q / t}%.1fx")
    }
    spark.stop()
  }
}
