package graft.operators

import org.apache.spark.sql.SparkSession

/** Diagnostic main (r17 verdict item 3): measures the crossover behind
  * [[AnnSearch.DeltaRebuildFrac]] — how much the frozen (stale) census
  * grid inflates the capped maintenance work as cumulative deltas
  * accumulate, against a fresh re-census baseline. Census corpus =
  * vec_id%7 ∈ {0,1,2}; delta batches accumulate residues 3..6, so the
  * cumulative delta fraction sweeps ~1/3 → ~4/3 of the census corpus.
  * Per arm: stale-grid capped pair count vs fresh-grid pair count (the
  * cost driver — sub-cell occupancy grows with (1+f) while nsplits
  * stays frozen, so pairs grow ~(1+f)²) and the max stale sub-cell
  * occupancy vs CellCap (the hot-cell hazard the cap exists to bound).
  * Results recorded in DESIGN.md round-18.
  *
  * Usage: scripts/run_main.sh graft.operators.DeltaGridProbe [sfDir]
  */
object DeltaGridProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (deltaRes <- Seq(Seq(3), Seq(3, 4), Seq(3, 4, 5), Seq(3, 4, 5, 6))) {
      val (f, stale, fresh, occ) =
        AnnSearch.gridStalenessStats(spark, dir, deltaRes)
      val ratio = stale.toDouble / fresh
      println(f"f=$f%.3f stale_pairs=$stale fresh_pairs=$fresh " +
        f"stale_over_fresh=$ratio%.2f stale_max_occ_x_cap=$occ%.2f")
    }
    spark.stop()
  }
}
