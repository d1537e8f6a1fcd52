package graft.operators

import org.apache.spark.sql.SparkSession

/** Diagnostic main: sweeps the navigable graph's cross-cell edge
  * budget — (CrossA adjacent cells) × (CrossKPerCell edges per cell) —
  * through the EXACT batched walk the declared greedy queries run
  * ([[AnnSearch.greedyBatchProbe]] with an edge-set override), printing
  * the recall gate's three columns per configuration. The r16 verdict
  * (item 1) asked the global column past token level; this probe is how
  * the shipped constants were chosen — measurements recorded in
  * DESIGN.md round-17.
  *
  * A second argument switches to the HOP-BUDGET sweep: at the shipped
  * (CrossA, CrossKPerCell) it walks the same graph with hop counts from
  * the comma list (e.g. "3,5,7,9") — the dial DESIGN r17 §2 names as
  * the scale path (hops ∝ log corpus, as HNSW does) priced in numbers.
  *
  * Usage: scripts/run_main.sh graft.operators.NavTuningProbe [sfDir] [hops,list]
  */
object NavTuningProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val hopSweep = args.drop(1).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
    val beamSweep = args.drop(2).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(3))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    hopSweep match {
      case Some(hopsList) =>
        for (h <- hopsList; b <- beamSweep) {
          val t0 = System.nanoTime()
          val (g, c, t, q) = AnnSearch.navRecallStats(spark, dir,
            AnnSearch.CrossA, AnnSearch.CrossKPerCell, hops = h, beamB = Some(b))
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"hops=$h beam=$b global=$g/30 cell=$c/30 top1=$t/10 quality=$q%.4f (${dt}%.1f s)")
        }
      case None =>
        // the r17 sweep that chose (CrossA, CrossKPerCell) = (4, 3) —
        // full results in DESIGN.md round-17 §2
        val configs = Seq((1, 2), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
          (4, 2), (4, 3), (4, 4), (5, 2), (5, 3), (6, 3))
        configs.foreach { case (a, k) =>
          val t0 = System.nanoTime()
          val (g, c, t, q) = AnnSearch.navRecallStats(spark, dir, a, k)
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"a=$a kPerCell=$k global=$g/30 cell=$c/30 top1=$t/10 quality=$q%.4f (${dt}%.1f s)")
        }
    }
    spark.stop()
  }
}
