package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Containment must catch subset duplicates that Jaccard misses: a
  * short document quoted verbatim inside a much longer one has
  * containment 1.0 but Jaccard well under the 0.5 dedup threshold.
  */
class ContainmentSpec extends SparkSpec {

  test("a doc embedded in a longer doc: containment 1.0, Jaccard < 0.5") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"w$i").mkString(" ")          // 8 shingles
    val long = short + " " + (11 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val row = Dedup.candidatePairsOf(sh, Int.MaxValue)
      .join(sz.as("sa"), col("ia") === col("sa.doc_id"))
      .join(sz.as("sb"), col("ib") === col("sb.doc_id"))
      .select(
        (col("inter").cast("double") / least(col("sa.n"), col("sb.n"))).as("containment"),
        (col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .collect()
    assert(row.length == 1)
    assert(row(0).getDouble(0) == 1.0, s"containment ${row(0).getDouble(0)} != 1.0")
    assert(row(0).getDouble(1) < 0.5, s"jaccard ${row(0).getDouble(1)} not < 0.5")
  }

  test("containment >= jaccard on every corpus pair (measure dominance)") {
    val dir = "/root/testdata/sf0.001"
    val sh = Dedup.shingleSurface(spark, dir)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val bad = Dedup.candidatePairsOf(sh, Int.MaxValue)
      .join(sz.as("sa"), col("ia") === col("sa.doc_id"))
      .join(sz.as("sb"), col("ib") === col("sb.doc_id"))
      .filter(col("inter").cast("double") / least(col("sa.n"), col("sb.n")) <
        col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter")))
      .count()
    assert(bad == 0)
  }
}
